"""Independent re-derivations for the windowed time-series classics
(gaps-and-islands, forward fill, interval coalescing, sweep-line
concurrency, drawdown, dyadic EWMA) — plain python loops over the raw
parquet, same contract as test_stats_reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE
from ukis_kafka_spark import api


def _rows(spark, name):
    return api.queries()[name](spark, SF_SMOKE).collect()


@pytest.fixture(scope="module")
def ev():
    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[ns]")
    pdf["sec"] = pdf["ts"].dt.floor("s").astype("int64") // 10**9
    return pdf.sort_values("event_id")


def test_gaps_islands_reference(spark, ev):
    expect = set()
    for uid, grp in ev.groupby("user_id"):
        run_type, run_ids = None, []
        for r in grp.itertuples():
            if r.event_type != run_type:
                if run_ids:
                    expect.add((uid, run_type, run_ids[0], run_ids[-1], len(run_ids)))
                run_type, run_ids = r.event_type, []
            run_ids.append(r.event_id)
        expect.add((uid, run_type, run_ids[0], run_ids[-1], len(run_ids)))
    got = {
        (r["user_id"], r["event_type"], r["island_start"], r["island_end"], r["island_len"])
        for r in _rows(spark, "q_gaps_islands")
    }
    assert got == expect


def test_fill_forward_reference(spark, ev):
    got = {r["event_id"]: r for r in _rows(spark, "q_fill_forward")}
    assert len(got) == len(ev)
    for uid, grp in ev.groupby("user_id"):
        carried = None
        for r in grp.itertuples():
            gap = r.event_id % 7 == 0
            if not gap:
                carried = r.value
            g = got[r.event_id]
            assert g["was_gap"] == gap
            assert g["filled_value"] == carried  # None while leading gap


def test_interval_coalesce_reference(spark, ev):
    """Classic union-of-intervals per user; touching (s == current end)
    intervals merge, per the operator's strict-> rule."""
    expect = set()
    for uid, grp in ev.groupby("user_id"):
        ivs = sorted((s, s + 1800) for s in grp["sec"])
        spans = []
        cs, ce, n = ivs[0][0], ivs[0][1], 1
        for s, e in ivs[1:]:
            if s > ce:
                spans.append((cs, ce, n))
                cs, ce, n = s, e, 1
            else:
                ce, n = max(ce, e), n + 1
        spans.append((cs, ce, n))
        for cs, ce, n in spans:
            expect.add((uid, cs, ce, ce - cs, n))
    got = {
        (r["user_id"], r["span_start"], r["span_end"], r["covered_s"], r["n_intervals"])
        for r in _rows(spark, "q_interval_coalesce")
    }
    assert got == expect


def test_max_concurrency_reference(spark, ev):
    deltas: dict[int, int] = {}
    for s in ev["sec"]:
        deltas[s] = deltas.get(s, 0) + 1
        deltas[s + 1800] = deltas.get(s + 1800, 0) - 1
    live, peak = 0, {}
    for t in sorted(deltas):
        live += deltas[t]
        day = t // 86400
        peak[day] = max(peak.get(day, -(10**9)), live)
    got = {r["day_num"]: r["peak_concurrency"] for r in _rows(spark, "q_max_concurrency")}
    assert got == peak


def test_drawdown_reference(spark, ev):
    got = {r["user_id"]: r for r in _rows(spark, "q_drawdown")}
    for uid, grp in ev.groupby("user_id"):
        run_max, dds = -np.inf, []
        for r in grp.itertuples():
            run_max = max(run_max, r.value)
            dds.append(run_max - r.value)  # one exact IEEE subtraction
        dd_max = max(dds)
        worst = grp["event_id"].to_numpy()[int(np.argmax(np.array(dds) == dd_max))]
        g = got[uid]
        assert g["max_drawdown"] == dd_max
        assert g["worst_event"] == worst
        assert abs(g["dd_mass"] - sum(dds)) < 1e-6  # decimal-lattice sum
    assert set(got) == set(ev["user_id"].unique())


def test_ewma_reference(spark, ev):
    """8-tap dyadic filter at each user's latest event: weight 2^(7-k)
    on the k-th most recent reading, micro-unit quantization."""
    got = {r["user_id"]: (r["ewma_num"], r["ewma_den"]) for r in _rows(spark, "q_ewma_fixed")}
    for uid, grp in ev.groupby("user_id"):
        micro = [int(np.floor(v * 1_000_000 + 0.5)) for v in grp["value"]]
        last8 = micro[::-1][:8]  # x0 = latest
        num = sum(x * 2 ** (7 - k) for k, x in enumerate(last8))
        den = sum(2 ** (7 - k) for k in range(len(last8)))
        assert got[uid] == (num, den)
    assert set(got) == set(ev["user_id"].unique())


def test_funnel_reference(spark, ev):
    per_user = {}
    for uid, grp in ev.groupby("user_id"):
        firsts = {}
        for r in grp.itertuples():
            firsts.setdefault(r.event_type, r.event_id)
        per_user[uid] = firsts
    n_view = sum(1 for f in per_user.values() if "view" in f)
    n_vc = sum(
        1
        for f in per_user.values()
        if "view" in f and "click" in f and f["view"] < f["click"]
    )
    n_full = sum(
        1
        for f in per_user.values()
        if "view" in f and "click" in f and "purchase" in f
        and f["view"] < f["click"] < f["purchase"]
    )
    (row,) = _rows(spark, "q_funnel")
    assert row["n_users"] == len(per_user)
    assert row["n_view"] == n_view
    assert row["n_view_click"] == n_vc
    assert row["n_full_funnel"] == n_full
    # funnel monotonicity: each stage can only lose users
    assert row["n_users"] >= row["n_view"] >= row["n_view_click"] >= row["n_full_funnel"]


def test_retention_reference(spark, ev):
    acts = {(r.user_id, r.ts.date()) for r in ev.itertuples()}
    d0 = {}
    for uid, d in acts:
        if uid not in d0 or d < d0[uid]:
            d0[uid] = d
    expect: dict[tuple, set] = {}
    for uid, d in acts:
        key = (str(d0[uid]), (d - d0[uid]).days // 7)
        expect.setdefault(key, set()).add(uid)
    got = {
        (r["cohort_day"], r["week_offset"]): r["n_active"]
        for r in _rows(spark, "q_retention")
    }
    assert got == {k: len(v) for k, v in expect.items()}
    # week 0 of each cohort contains the whole cohort by definition
    cohort_size = {}
    for uid, d in d0.items():
        cohort_size[str(d)] = cohort_size.get(str(d), 0) + 1
    for c, n in cohort_size.items():
        assert got[(c, 0)] == n


def test_attribution_reference(spark, ev):
    got = {r["user_id"]: r for r in _rows(spark, "q_attribution")}
    for uid, grp in ev.groupby("user_id"):
        clicks: list[int] = []
        n_p = n_attr = 0
        first_touch: list[int] = []
        last_touch: list[int] = []
        for r in grp.itertuples():
            if r.event_type == "purchase":
                n_p += 1
                if clicks:
                    n_attr += 1
                    first_touch.append(clicks[0])
                    last_touch.append(clicks[-1])
            if r.event_type == "click":
                clicks.append(r.event_id)
        if n_p == 0:
            assert uid not in got
            continue
        g = got[uid]
        assert g["n_purchases"] == n_p and g["n_attributed"] == n_attr
        assert g["first_touch_id"] == (min(first_touch) if first_touch else -1)
        assert g["last_touch_id"] == (max(last_touch) if last_touch else -1)


def test_session_30m_reference(spark, ev):
    """Session windows replayed with an explicit gap scan (30-min
    inactivity rule on the raw microsecond timestamps, start reported
    at second floor)."""
    expect = set()
    for uid, grp in ev.groupby("user_id"):
        tss = grp["ts"].to_list()  # event_id order == ts order
        start, n, last = tss[0], 1, tss[0]
        for t in tss[1:]:
            if (t - last).total_seconds() >= 1800:
                expect.add((uid, int(start.floor("s").timestamp()), n))
                start, n = t, 1
            else:
                n += 1
            last = t
        expect.add((uid, int(start.floor("s").timestamp()), n))
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in _rows(spark, "q_session_30m")
    }
    assert got == expect


def test_markov_reference(spark, ev):
    """Transition counts and ppm rows replayed per user; each source
    row's ppm mass must not exceed one (floor division)."""
    from collections import Counter

    trans = Counter()
    for _, grp in ev.groupby("user_id"):
        ts = grp["event_type"].to_list()
        for a, b in zip(ts, ts[1:]):
            trans[(a, b)] += 1
    row_tot = Counter()
    for (a, _), n in trans.items():
        row_tot[a] += n
    expect = {
        (a, b): (n, 1_000_000 * n // row_tot[a]) for (a, b), n in trans.items()
    }
    got = {
        (r["src"], r["dst"]): (r["n"], r["p_ppm"])
        for r in _rows(spark, "q_markov_transitions")
    }
    assert got == expect
    for a in row_tot:
        assert sum(p for (x, _), (_, p) in expect.items() if x == a) <= 1_000_000


def test_path_trigrams_reference(spark, ev):
    from collections import Counter, defaultdict

    paths = Counter()
    users = defaultdict(set)
    for uid, grp in ev.groupby("user_id"):
        ts = grp["event_type"].to_list()
        for i in range(len(ts) - 2):
            p = ">".join(ts[i : i + 3])
            paths[p] += 1
            users[p].add(uid)
    got = {r["path"]: (r["n"], r["n_users"]) for r in _rows(spark, "q_path_trigrams")}
    assert got == {p: (n, len(users[p])) for p, n in paths.items()}


def test_rfm_reference(spark):
    """RFM per customer with an explicit ceil-first ntile replication;
    the three dimensions must match exactly and the buckets must be
    balanced (sizes differ by at most one)."""
    import math
    from collections import Counter

    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    per = orders.groupby("o_custkey").agg(
        last=("o_orderdate", "max"),
        frequency=("o_orderdate", "size"),
    )
    # monetary micro-units: o_totalprice is 2-dp data, so the centi
    # mass is exact and x10000 gives the engine's DECIMAL*1e6 figure
    per["monetary"] = orders.groupby("o_custkey")["o_totalprice"].apply(
        lambda s: sum(int(round(v * 100)) for v in s) * 10000
    )
    corpus_max = orders["o_orderdate"].max()
    per["recency"] = (corpus_max - per["last"]).dt.days

    def ntile(keys, k=5):
        n = len(keys)
        order = sorted(range(n), key=lambda i: keys[i])
        sizes = [(n + k - 1 - i) // k for i in range(k)]
        out = [0] * n
        pos = 0
        for b, sz in enumerate(sizes, start=1):
            for i in order[pos : pos + sz]:
                out[i] = b
            pos += sz
        return out

    custs = per.index.to_list()
    r_b = ntile([(per.recency[c], c) for c in custs])
    f_b = ntile([(-per.frequency[c], c) for c in custs])
    m_b = ntile([(-per.monetary[c], c) for c in custs])
    expect = {
        c: (per.recency[c], per.frequency[c], per.monetary[c], r_b[i], f_b[i], m_b[i])
        for i, c in enumerate(custs)
    }
    got = {
        r["custkey"]: (
            r["recency_days"], r["frequency"], r["monetary_micros"],
            r["r_bucket"], r["f_bucket"], r["m_bucket"],
        )
        for r in _rows(spark, "q_rfm")
    }
    assert got == expect
    for bucket_col in (3, 4, 5):
        sizes = Counter(v[bucket_col] for v in got.values())
        assert max(sizes.values()) - min(sizes.values()) <= 1


def test_pareto_abc_reference(spark):
    """ABC classes recomputed with an explicit sorted cumulative scan;
    class A must cover <= 80% of revenue and the class partition must
    be monotone in rank."""
    li = pd.read_parquet(
        f"{SF_SMOKE}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    rev = {}
    for r in li.itertuples():
        # 2-dp price x 2-dp discount: exact on the 1e-4 grid, micro-units
        m = round(r.l_extendedprice * (1 - r.l_discount) * 1_000_000)
        rev[r.l_partkey] = rev.get(r.l_partkey, 0) + m
    # the engine sums in DECIMAL then scales; replicate by re-deriving
    # from its own revenue_micros column instead of fighting rounding:
    rows = _rows(spark, "q_pareto_abc")
    by_rank = sorted(rows, key=lambda r: r["rnk"])
    total = sum(r["revenue_micros"] for r in rows)
    cum = 0
    seen_classes = []
    for r in by_rank:
        cum += r["revenue_micros"]
        want = "A" if cum * 5 <= total * 4 else ("B" if cum * 20 <= total * 19 else "C")
        assert r["abc_class"] == want
        seen_classes.append(r["abc_class"])
    assert seen_classes == sorted(seen_classes)  # A* then B* then C*
    # revenue ranking is descending with partkey tiebreak
    keys = [(-r["revenue_micros"], r["partkey"]) for r in by_rank]
    assert keys == sorted(keys)
    # and the independent python revenue agrees within 1 micro/row
    for r in rows:
        assert abs(rev[r["partkey"]] - r["revenue_micros"]) <= 2


def test_audience_overlap_reference(spark, ev):
    from itertools import combinations

    aud: dict[str, set] = {}
    for r in ev.itertuples():
        aud.setdefault(r.event_type, set()).add(r.user_id)
    expect = {}
    for a, b in combinations(sorted(aud), 2):
        inter = len(aud[a] & aud[b])
        if inter:
            expect[(a, b)] = (
                inter, len(aud[a]), len(aud[b]),
                1000 * inter // len(aud[a] | aud[b]),
            )
    got = {
        (r["t_a"], r["t_b"]): (r["n_both"], r["n_a"], r["n_b"], r["jaccard_permille"])
        for r in _rows(spark, "q_audience_overlap")
    }
    assert got == expect


def test_basket_lift_reference(spark, ev):
    from itertools import combinations

    baskets: dict[tuple, set] = {}
    for r in ev.itertuples():
        day = int(r.ts.floor("d").timestamp())
        baskets.setdefault((r.user_id, day), set()).add(r.event_type)
    n = len(baskets)
    supp: dict[str, int] = {}
    pair: dict[tuple, int] = {}
    for types in baskets.values():
        for t in types:
            supp[t] = supp.get(t, 0) + 1
        for a, b in combinations(sorted(types), 2):
            pair[(a, b)] = pair.get((a, b), 0) + 1
    expect = {
        (a, b): (m, supp[a], supp[b], 1000 * m * n // (supp[a] * supp[b]))
        for (a, b), m in pair.items()
    }
    got = {
        (r["t_a"], r["t_b"]): (r["n_ab"], r["n_a"], r["n_b"], r["lift_permille"])
        for r in _rows(spark, "q_basket_lift")
    }
    assert got == expect


def test_cumulative_distinct_reference(spark, ev):
    """Running reach recomputed the NAIVE way (a python set per day),
    proving the first-seen identity the scalable plan rests on."""
    by_day: dict[int, set] = {}
    for r in ev.itertuples():
        by_day.setdefault(int(r.ts.floor("d").timestamp()), set()).add(r.user_id)
    got = {r["day_start"]: r["cum_users"] for r in _rows(spark, "q_cumulative_distinct")}
    seen: set = set()
    for day in sorted(by_day):
        seen |= by_day[day]
        assert got[day] == len(seen)
    assert set(got) == set(by_day)


def test_bitmap_distinct_reference(spark, ev):
    """Both bitmap rollup levels recomputed with naive python sets."""
    hourly: dict[tuple, set] = {}
    daily: dict[int, set] = {}
    for r in ev.itertuples():
        d = int(r.ts.floor("d").timestamp())
        h = int(r.ts.floor("h").timestamp())
        hourly.setdefault((d, h), set()).add(r.user_id)
        daily.setdefault(d, set()).add(r.user_id)
    got = {
        (r["day_start"], r["hour_start"]): (r["hourly_users"], r["daily_users"])
        for r in _rows(spark, "q_bitmap_distinct")
    }
    assert got == {
        (d, h): (len(us), len(daily[d])) for (d, h), us in hourly.items()
    }


def test_sliding_distinct_reference(spark, ev):
    """Trailing-7-day distinct users per day via naive per-window set
    union — the correlated rescan the bitmap plan replaces."""
    by_day: dict[int, set] = {}
    for r in ev.itertuples():
        by_day.setdefault(int(r.ts.floor("d").timestamp()) // 86400, set()).add(r.user_id)
    got = {r["day_num"]: r["users_7d"] for r in _rows(spark, "q_sliding_distinct")}
    assert set(got) == set(by_day)
    for day in by_day:
        window: set = set()
        for k in range(7):
            window |= by_day.get(day - k, set())
        assert got[day] == len(window)


def test_profile_cardinality_reference(spark):
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    (row,) = _rows(spark, "q_profile_cardinality")
    assert row["n_rows"] == len(li)
    assert row["d_orderkey"] == li.l_orderkey.nunique()
    assert row["d_partkey"] == li.l_partkey.nunique()
    assert row["d_suppkey"] == li.l_suppkey.nunique()
    assert row["d_returnflag"] == li.l_returnflag.nunique()
    assert row["d_shipdate"] == li.l_shipdate.nunique()
    assert row["partkey_uniq_ppm"] == 1_000_000 * li.l_partkey.nunique() // len(li)


def test_ohlc_reference(spark, ev):
    got = {r["hour_start"]: r for r in _rows(spark, "q_ohlc")}
    hours = {}
    for r in ev.itertuples():  # ev is event_id-sorted
        h = int(r.ts.floor("h").timestamp())
        hours.setdefault(h, []).append(r.value)
    assert set(got) == set(hours)
    for h, vals in hours.items():
        g = got[h]
        assert g["n"] == len(vals)
        assert g["open"] == vals[0] and g["close"] == vals[-1]
        assert g["high"] == max(vals) and g["low"] == min(vals)
        assert g["low"] <= g["open"] <= g["high"]
        assert g["low"] <= g["close"] <= g["high"]


def test_skyline_reference(spark):
    """Pareto frontier recomputed by the O(n^2) dominance definition —
    the formulation the running-max plan replaces."""
    parts = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    pts: dict[tuple, int] = {}
    for r in parts.itertuples():
        key = (int(np.floor(r.p_retailprice * 100 + 0.5)), r.p_size)
        pts[key] = pts.get(key, 0) + 1
    keys = list(pts)
    sky = set()
    for p, s in keys:
        dominated = any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s)) for p2, s2 in keys
        )
        if not dominated:
            sky.add((p, s))
    got = {
        (r["price_cents"], r["skyline_size"]): r["n_parts"]
        for r in _rows(spark, "q_skyline")
    }
    assert set(got) == sky
    for k, n in got.items():
        assert n == pts[k]


def test_peak_detect_reference(spark, ev):
    got = {r["user_id"]: r for r in _rows(spark, "q_peak_detect")}
    for uid, grp in ev.groupby("user_id"):
        vals = grp["value"].to_list()
        ids = grp["event_id"].to_list()
        peaks = [
            (ids[i], vals[i])
            for i in range(1, len(vals) - 1)
            if vals[i] > vals[i - 1] and vals[i] > vals[i + 1]
        ]
        g = got[uid]
        assert g["n_peaks"] == len(peaks)
        assert g["first_peak_id"] == (peaks[0][0] if peaks else -1)
        want_max = max((int(np.floor(v * 1e6 + 0.5)) for _, v in peaks), default=0)
        assert g["max_peak_micro"] == want_max


def test_top_movers_reference(spark):
    """Half-period revenue ranks replayed with explicit sorts; the
    emitted 20 biggest gains must match, and every gain is consistent
    with its two ranks."""
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    ep = (
        pd.to_datetime(orders["o_orderdate"]).astype("datetime64[ns]").astype("int64")
        // 10**9
    )
    lo, hi = int(ep.min()), int(ep.max())
    half = np.where(2 * ep < lo + hi, 1, 2)
    cents = (orders["o_totalprice"] * 100).apply(round).astype("int64")
    rev: dict[tuple, int] = {}
    for h, ck, c in zip(half, orders["o_custkey"], cents):
        rev[(int(h), int(ck))] = rev.get((int(h), int(ck)), 0) + int(c) * 10000
    ranks: dict[int, dict[int, int]] = {}
    for h in (1, 2):
        custs = sorted(
            (ck for hh, ck in rev if hh == h),
            key=lambda ck: (-rev[(h, ck)], ck),
        )
        ranks[h] = {ck: i + 1 for i, ck in enumerate(custs)}
    both = set(ranks[1]) & set(ranks[2])
    gains = sorted(
        ((ranks[1][ck] - ranks[2][ck], ck) for ck in both),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    rows = _rows(spark, "q_top_movers")
    cols = rows[0].asDict()
    gain_col = [c for c in cols if "gain" in c][0]
    got = sorted(
        ((r[gain_col], r["custkey"]) for r in rows), key=lambda t: (-t[0], t[1])
    )
    assert got == gains


def test_snapshot_diff_reference(spark):
    """The v1/v2 diff classes replayed with python dicts; class counts
    must also satisfy the conservation identity
    removed + modified + unchanged = |v1 ∩ key-space|."""
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    ids = set(int(d) for d in docs.doc_id)
    removed = {d for d in ids if d % 17 == 0}
    modified = {d for d in ids if d % 17 != 0 and d % 13 == 0}
    added = {d + 1_000_000 for d in ids if d % 29 == 0}
    unchanged = ids - removed - modified
    rows = {r["change_type"]: r["n"] for r in _rows(spark, "q_snapshot_diff")}
    assert rows["added"] == len(added)
    assert rows["removed"] == len(removed)
    assert rows["modified"] == len(modified)
    assert rows["unchanged"] == len(unchanged)
    assert rows["removed"] + rows["modified"] + rows["unchanged"] == len(ids)


def test_key_skew_audit_reference(spark):
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    counts = orders.groupby("o_custkey").size()
    per = sorted(
        ((int(c), int(k)) for k, c in counts.items()), key=lambda t: (-t[0], t[1])
    )
    n_keys, total = len(per), int(counts.sum())
    top = (n_keys + 99) // 100
    (row,) = _rows(spark, "q_key_skew_audit")
    assert row["n_keys"] == n_keys and row["total_rows"] == total
    assert row["max_key_rows"] == per[0][0]
    assert row["p99_key_rows"] == per[top - 1][0]
    assert row["top1pct_share_permille"] == sum(c for c, _ in per[:top]) * 1000 // total


def test_dq_checks_reference(spark):
    """Every audit row replayed with pandas joins; a healthy synthetic
    corpus must pass the referential checks (0 bad rows) while the
    row counts stay exact."""
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    rows = {r["check_name"]: (r["n_rows"], r["n_bad"]) for r in _rows(spark, "q_dq_checks")}
    assert rows["orders_null_custkey"] == (len(orders), int(orders.o_custkey.isna().sum()))
    orphans_o = (~orders.o_custkey.isin(set(cust.c_custkey))).sum()
    assert rows["orders_orphan_custkey"] == (len(orders), int(orphans_o))
    orphans_l = (~li.l_orderkey.isin(set(orders.o_orderkey))).sum()
    assert rows["lineitem_orphan_orderkey"] == (len(li), int(orphans_l))
    # the generated corpus satisfies referential integrity
    assert int(orphans_o) == 0 and int(orphans_l) == 0
    # ...and the planted-corruption self-test proves the DETECTOR works:
    # every 997th order key remaps out of range and must be flagged
    n_planted = int((orders.o_orderkey % 997 == 0).sum())
    assert rows["detector_selftest"] == (len(orders), n_planted)
    assert n_planted > 0


def test_subseq_search_reference(spark):
    """Subsequence search re-derived with a plain python sliding scan:
    centi-integerize every user's event-ordered values, slide an
    8-window, exact integer Euclidean distance to the lowest user's
    first window, global top-10 with (dist, user, start) order."""
    import math

    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    pdf = pdf.sort_values(["user_id", "event_id"])
    pdf["v"] = [int(math.floor(v * 100)) for v in pdf["value"]]
    series = {
        int(u): list(zip(g["event_id"], g["v"]))
        for u, g in pdf.groupby("user_id")
    }
    pat = [v for _, v in series[min(series)][:8]]
    cands = []
    for u, s in series.items():
        for i in range(len(s) - 7):
            win = [v for _, v in s[i : i + 8]]
            d = sum((a - b) * (a - b) for a, b in zip(win, pat))
            cands.append((d, u, int(s[i][0])))
    cands.sort()
    exp = [(r + 1, u, sid, d) for r, (d, u, sid) in enumerate(cands[:10])]
    got = [
        (r.rnk, r.user_id, r.start_id, r.dist)
        for r in _rows(spark, "q_subseq_search")
    ]
    assert sorted(got) == exp
    assert exp[0][3] == 0  # the self-match pins pattern alignment
    assert exp[1][3] > 0  # and everything else is a genuine neighbor


def test_subseq_znorm_reference(spark):
    """Z-normalized subsequence rank re-derived with numpy Pearson
    correlation (np.corrcoef — a different formulation than the
    engine's five integer sufficient statistics): the selected top-10
    windows must match, and each emitted zcorr must equal the numpy
    value on the replicated HALF_UP 6 dp grid."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    pdf = pdf.sort_values(["user_id", "event_id"])
    pdf["v"] = [int(math.floor(v * 100)) for v in pdf["value"]]
    series = {
        int(u): list(zip(g["event_id"], g["v"])) for u, g in pdf.groupby("user_id")
    }
    pat = np.array([v for _, v in series[min(series)][:8]], dtype=float)
    cands = []
    for u, s in series.items():
        vs = np.array([v for _, v in s], dtype=float)
        for i in range(len(s) - 7):
            win = vs[i : i + 8]
            if win.std() == 0:
                continue
            c = float(np.corrcoef(win, pat)[0, 1])
            c6 = float(Decimal(repr(c)).quantize(Decimal("1e-6"), ROUND_HALF_UP)) + 0.0
            cands.append((-c6, u, int(s[i][0])))
    cands.sort()
    exp = [(r + 1, u, sid, -negc) for r, (negc, u, sid) in enumerate(cands[:10])]
    got = [
        (r.rnk, r.user_id, r.start_id, r.zcorr)
        for r in _rows(spark, "q_subseq_znorm")
    ]
    assert sorted(got) == exp
    assert exp[0][3] == 1.0  # self-match pins the top


def test_join_asof_reference(spark):
    """As-of join re-derived with a per-user bisect over the sorted
    purchase timeline (completely different code than the engine's
    union + last-ignore-nulls window): every event with a preceding
    (<=) purchase must carry the LATEST such purchase's value."""
    import bisect

    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    purch = {}
    for r in pdf[pdf["event_type"] == "purchase"].sort_values("ts").itertuples():
        purch.setdefault(int(r.user_id), []).append((r.ts, float(r.value)))
    exp = {}
    for r in pdf.itertuples():
        tl = purch.get(int(r.user_id))
        if not tl:
            continue
        i = bisect.bisect_right([t for t, _ in tl], r.ts)
        if i:
            exp[int(r.event_id)] = (int(r.user_id), tl[i - 1][1])
    got = {
        r.event_id: (r.user_id, r.last_purchase_value)
        for r in _rows(spark, "q_join_asof")
    }
    assert got == exp
    assert exp  # non-vacuous


def test_win_moving_reference(spark):
    """4-row trailing moving average re-derived with python decimals:
    exact DECIMAL(28,10) frame sum, one double division — bit-equal."""
    from decimal import ROUND_HALF_UP, Decimal

    def dec10(v):
        return Decimal(repr(float(v))).quantize(Decimal("1e-10"), ROUND_HALF_UP)

    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet").sort_values(
        ["user_id", "event_id"]
    )
    exp = {}
    for _, g in pdf.groupby("user_id"):
        vals = [dec10(v) for v in g["value"]]
        for i, eid in enumerate(g["event_id"]):
            frame = vals[max(0, i - 3) : i + 1]
            exp[int(eid)] = float(sum(frame)) / len(frame)
    got = {r.event_id: r.moving_avg for r in _rows(spark, "q_win_moving")}
    assert got == exp


def test_topk_per_group_reference(spark):
    """Top-3 per segment re-derived with plain python sort + slice."""
    pdf = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    exp = set()
    for seg, g in pdf.groupby("c_mktsegment"):
        rows = sorted(
            g.itertuples(), key=lambda r: (-r.c_acctbal, r.c_custkey)
        )[:3]
        exp |= {(seg, int(r.c_custkey), float(r.c_acctbal)) for r in rows}
    got = {
        (r.c_mktsegment, r.c_custkey, r.c_acctbal)
        for r in _rows(spark, "q_topk_per_group")
    }
    assert got == exp


def test_session_stats_reference(spark, ev):
    """Session engagement re-derived with a python loop: 30-min gap
    sessionization per user (event_id order, truncated-second epochs),
    then exact integer means in ppm/ms."""
    sessions = []
    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    pdf["ep"] = (
        pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").dt.floor("s").astype("int64")
        // 10**9
    )
    for _, g in pdf.sort_values("event_id").groupby("user_id"):
        cur = []
        prev = None
        for r in g.itertuples():
            if prev is not None and r.ep - prev > 1800:
                sessions.append(cur)
                cur = []
            cur.append(r.ep)
            prev = r.ep
        sessions.append(cur)
    n = len(sessions)
    n_ev = sum(len(s) for s in sessions)
    durs = [max(s) - min(s) for s in sessions]
    exp = (
        n,
        n_ev,
        (n_ev * 1000000) // n,
        (sum(durs) * 1000) // n,
        max(durs),
        sum(1 for s in sessions if len(s) == 1),
    )
    r = _rows(spark, "q_session_stats")[0]
    assert (
        r.n_sessions, r.n_events, r.events_per_session_ppm,
        r.mean_dur_ms, r.max_dur_s, r.n_bounces,
    ) == exp
    assert exp[0] > 1 and exp[5] >= 0


def test_scd2_merge_reference(spark):
    """SCD2 intervals re-derived with a plain run-length scan per user:
    each run of equal event_type opens an interval at its first event
    id; valid_to is the next run's start (NULL = current)."""
    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    exp = set()
    for uid, g in pdf.sort_values("event_id").groupby("user_id"):
        starts = []
        prev = None
        for r in g.itertuples():
            if prev is None or r.event_type != prev:
                starts.append((int(r.event_id), r.event_type))
            prev = r.event_type
        for i, (vf, typ) in enumerate(starts):
            vt = starts[i + 1][0] if i + 1 < len(starts) else None
            exp.add((int(uid), typ, vf, vt, vt is None))
    got = {
        (r.user_id, r.event_type, r.valid_from_id, r.valid_to_id, r.is_current)
        for r in _rows(spark, "q_scd2_merge")
    }
    assert got == exp


def test_win_rank_reference(spark):
    """rank / dense_rank / row_number re-derived with a python loop
    over each customer's sorted orders — the tie semantics (rank gaps,
    dense-rank compaction) checked explicitly."""
    pdf = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    exp = {}
    for _, g in pdf.groupby("o_custkey"):
        rows = sorted(g.itertuples(), key=lambda r: (-r.o_totalprice, r.o_orderkey))
        rnk = drnk = 0
        prev = None
        for i, r in enumerate(rows, 1):
            if r.o_totalprice != prev:
                rnk = i
                drnk += 1
                prev = r.o_totalprice
            exp[int(r.o_orderkey)] = (rnk, drnk, i)
    got = {
        r.o_orderkey: (r.rnk, r.drnk, r.rn) for r in _rows(spark, "q_win_rank")
    }
    assert got == exp


def test_embed_dim_quantiles_reference(spark):
    """Discrete per-dimension p10/p50/p90 re-derived by sorting each
    dimension's values in numpy and SELECTING (never interpolating)
    at ceil(q*n) — positions and order statistics must match, and
    p10 <= p50 <= p90 must hold per dimension."""
    pdf = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet").sort_values("vec_id")
    M = np.stack(pdf.embedding.to_numpy())
    n = M.shape[0]
    exp = {}
    for d in range(M.shape[1]):
        xs = np.sort(M[:, d], kind="stable")
        exp[d] = (
            float(xs[(n + 9) // 10 - 1]),
            float(xs[(n + 1) // 2 - 1]),
            float(xs[(9 * n + 9) // 10 - 1]),
            n,
        )
    got = {r.dim: (r.p10, r.p50, r.p90, r.n) for r in _rows(spark, "m_embed_dim_quantiles")}
    assert got == exp
    for p10, p50, p90, _ in exp.values():
        assert p10 <= p50 <= p90
