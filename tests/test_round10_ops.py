"""Independent re-derivation tests for the round-10 additions
(speculative-decoding acceptance, odds-ratio keywords, pack-mask
stats, one-way ANOVA, WebDataset tar source, spatial kNN join,
curriculum pacing).

The oracle gate proves *engine parity*; these tests prove the shared
formulation against plain Python / numpy re-implementations of the
algorithm definitions (the both-engines-wrong-the-same-way guard)."""

from __future__ import annotations

import collections
import io
import json
import math
import tarfile

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE
from ukis_kafka_spark import api


def _rows(spark, name, sf=SF_SMOKE):
    return api.queries()[name](spark, sf).collect()


def _docs(spark):
    from ukis_kafka_spark.sources import load_table

    return load_table(spark, SF_SMOKE, "documents").collect()


def _events(spark):
    from ukis_kafka_spark.sources import load_table

    return load_table(spark, SF_SMOKE, "events").collect()


def test_anova_matches_numpy(spark):
    docs = _docs(spark)
    groups = collections.defaultdict(list)
    for r in docs:
        groups[r.doc_id % 5].append(len(r.text.split(" ")))
    assert len(groups) == 5
    sizes = {len(v) for v in groups.values()}
    assert len(sizes) == 1, "design must be balanced"
    all_v = np.array([v for g in groups.values() for v in g], dtype=np.float64)
    n, k = len(all_v), 5
    grand = all_v.mean()
    ssb = sum(len(v) * (np.mean(v) - grand) ** 2 for v in groups.values())
    ssw = sum(((np.array(v, dtype=np.float64) - np.mean(v)) ** 2).sum() for v in groups.values())
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    (row,) = _rows(spark, "q_anova")
    assert row.k == 5 and row.n == n
    # exact integer sufficient statistics: n*SSB and n*SSW
    assert row.ssb_scaled == pytest.approx(n * ssb, rel=1e-9)
    assert row.ssw_scaled == pytest.approx(n * ssw, rel=1e-9)
    assert row.f_stat == pytest.approx(f_ref, rel=1e-12)
    assert row.ssb_scaled > 0 and row.ssw_scaled > 0  # non-vacuous


def test_keyword_odds_matches_counter(spark):
    docs = _docs(spark)
    c_en, c_rest = collections.Counter(), collections.Counter()
    for r in docs:
        (c_en if r.lang == "en" else c_rest).update(r.text.split(" "))
    n_en, n_rest = sum(c_en.values()), sum(c_rest.values())
    scored = []
    for tok, ce in c_en.items():
        if ce < 5:
            continue
        cr = c_rest.get(tok, 0)
        ppm = (1_000_000 * ce * (n_rest - cr + 1)) // ((n_en - ce + 1) * (cr + 1))
        scored.append((-ppm, tok, ce, cr))
    scored.sort()
    expected = [(t, ce, cr, -nppm) for nppm, t, ce, cr in scored[:20]]
    got = [(r.tok, r.c_en, r.c_rest, r.odds_ppm) for r in _rows(spark, "m_keyword_odds")]
    assert got == expected
    assert len(got) == 20 and any(cr > 0 for _, _, cr, _ in got)


def test_pack_mask_stats_matches_simulation(spark):
    from ukis_kafka_spark.ml.chunking import CTX, SHARD

    docs = sorted(
        ((r.source, r.doc_id, len(r.text.split(" "))) for r in _docs(spark)),
        key=lambda t: (t[0], t[1]),
    )
    streams = collections.defaultdict(list)
    for source, doc_id, n_tok in docs:
        streams[(source, doc_id // SHARD)].append((doc_id, n_tok))
    expected = {}
    for (source, shard), members in streams.items():
        start = 0
        for _, n_tok in members:
            for b in range(start // CTX, (start + n_tok - 1) // CTX + 1):
                seg = min(start + n_tok, (b + 1) * CTX) - max(start, b * CTX)
                key = (source, shard, b)
                n, spl, st, mm = expected.get(key, (0, 0, 0, 0))
                expected[key] = (n + 1, spl + (seg < n_tok), st + seg, mm + seg * seg)
            start += n_tok
    rows = _rows(spark, "m_pack_mask_stats")
    assert len(rows) == len(expected)
    for r in rows:
        n, spl, st, mm = expected[(r.source, r.shard, r.bin)]
        assert (r.n_segments, r.n_splits, r.seg_tokens, r.mask_mass) == (n, spl, st, mm)
        assert r.density_ppm == 1_000_000 * mm // (st * st)
        assert r.density_ppm <= 1_000_000
    # boundary-crossing fragments actually occur (docs 10-100 tokens on
    # a CTX grid) and window token mass reconciles per stream
    assert sum(r.n_splits for r in rows) > 0
    per_stream = collections.Counter()
    for r in rows:
        per_stream[(r.source, r.shard)] += r.seg_tokens
    for (source, shard), members in streams.items():
        assert per_stream[(source, shard)] == sum(n for _, n in members)


def test_ngram_speculate_matches_python(spark):
    from ukis_kafka_spark.ml.text import _MIX_A, _MIX_M

    docs = _docs(spark)
    c3 = collections.Counter()
    val_tri = collections.defaultdict(list)
    for r in docs:
        toks = r.text.split(" ")
        half = (r.doc_id * _MIX_A % _MIX_M) % 2
        for t1, t2, t3 in zip(toks, toks[1:], toks[2:]):
            if half == 0:
                c3[(t1, t2, t3)] += 1
            else:
                val_tri[r.doc_id].append((t1, t2, t3))
    best = {}
    for (t1, t2, t3), c in c3.items():
        cur = best.get((t1, t2))
        # max count, then lexicographically smallest continuation
        if cur is None or (-c, t3) < cur:
            best[(t1, t2)] = (-c, t3)
    rows = {r.doc_id: r for r in _rows(spark, "m_ngram_speculate")}
    assert set(rows) == set(val_tri)
    for doc_id, tris in val_tri.items():
        r = rows[doc_id]
        n_drafted = sum(1 for t1, t2, _ in tris if (t1, t2) in best)
        n_accepted = sum(
            1 for t1, t2, t3 in tris if (t1, t2) in best and best[(t1, t2)][1] == t3
        )
        assert (r.n_positions, r.n_drafted, r.n_accepted) == (
            len(tris),
            n_drafted,
            n_accepted,
        )
        assert r.n_accepted <= r.n_drafted <= r.n_positions
    # both branches are alive at smoke scale: some positions accept,
    # some contexts have no draft (the trigram scope exists for this)
    assert sum(r.n_accepted for r in rows.values()) > 0
    assert any(r.n_drafted < r.n_positions for r in rows.values())


def test_curriculum_pacing_matches_python(spark):
    docs = sorted((len(r.text.split(" ")), r.doc_id) for r in _docs(spark))
    n = len(docs)
    cum = np.cumsum([t for t, _ in docs])
    rows = sorted(_rows(spark, "m_curriculum_pacing"), key=lambda r: r.epoch)
    assert [r.epoch for r in rows] == [1, 2, 3, 4, 5]
    prev_vis = 0
    for r in rows:
        n_vis = math.floor(n * math.sqrt(r.epoch / 5.0))
        assert r.n_visible == n_vis
        assert r.visible_tok_mass == int(cum[n_vis - 1])
        assert (docs[n_vis - 1][0], docs[n_vis - 1][1]) == (r.frontier_ntok, r.frontier_doc)
        assert r.n_visible > prev_vis  # strictly expanding schedule
        prev_vis = r.n_visible
    assert rows[-1].n_visible == n  # epoch E sees the full corpus


def test_knn_join_matches_brute_force(spark):
    ev = _events(spark)
    ids = np.array([r.event_id for r in ev])
    lon = np.array([r.value * 3.6 - 180 for r in ev])
    lat = np.array([float((r.user_id * 7) % 180 - 90) for r in ev])
    rows = {r.event_id: r for r in _rows(spark, "g_knn_join")}
    assert set(rows) == set(ids.tolist())
    order = np.argsort(ids)
    within = (np.abs(lon[:, None] - lon[None, :]) <= 2.0) & (
        np.abs(lat[:, None] - lat[None, :]) <= 2.0
    )
    np.fill_diagonal(within, False)
    for i in range(len(ids)):
        r = rows[ids[i]]
        nb = np.where(within[i])[0]
        assert r.n_within == len(nb)
        if len(nb) >= 4:
            d2 = (lon[i] - lon[nb]) ** 2 + (lat[i] - lat[nb]) ** 2
            cand = sorted(zip(d2.tolist(), ids[nb].tolist()))
            assert (r.knn4_d2, r.knn4_id) == cand[3]
        else:
            assert r.knn4_id is None and r.knn4_d2 is None
    # both branches fire at smoke scale
    assert any(v.knn4_id is not None for v in rows.values())
    assert any(v.knn4_id is None for v in rows.values())
    del order


def _mini_tar(members):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as t:
        for name, payload in members:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            t.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def _decode(tar_bytes):
    from ukis_kafka_spark.sources.jsonl import _tar_decode_batches

    out = list(
        _tar_decode_batches(iter([pd.DataFrame({"content": [tar_bytes]})]))
    )
    return pd.concat(out, ignore_index=True)


def test_tar_kernel_groups_samples():
    meta = json.dumps({"source": "web", "lang": "en"}).encode()
    good = _mini_tar(
        [
            ("web/00000007.txt", b"hello world"),
            ("web/00000007.json", meta),
            ("web/00000007.cls", b"2"),
            ("web/00000009.txt", b"bye"),
            ("web/00000009.json", meta),
            ("web/00000009.cls", b"1"),
        ]
    )
    df = _decode(good)
    assert df.doc_id.tolist() == [7, 9]
    assert df.n_bytes.tolist() == [11, 3]
    assert df.n_tok.tolist() == [2, 1]
    assert set(df.lang) == {"en"}


def test_tar_kernel_rejects_incomplete_sample():
    meta = json.dumps({"source": "web", "lang": "en"}).encode()
    missing_cls = _mini_tar(
        [
            ("web/00000007.txt", b"hello"),
            ("web/00000007.json", meta),
        ]
    )
    with pytest.raises(ValueError, match="expected"):
        _decode(missing_cls)
    # non-adjacent members of one sample violate the WebDataset
    # streaming contract and must raise, not silently re-group
    scattered = _mini_tar(
        [
            ("web/00000007.txt", b"hello"),
            ("web/00000009.txt", b"bye"),
            ("web/00000007.json", meta),
            ("web/00000007.cls", b"1"),
            ("web/00000009.json", meta),
            ("web/00000009.cls", b"1"),
        ]
    )
    with pytest.raises(ValueError):
        _decode(scattered)
    # two same-suffix members for one key: a dict overwrite would
    # decode the shard silently and still satisfy set(parts) ==
    # expected — the strict contract must reject it (ADVICE r10)
    duped = _mini_tar(
        [
            ("web/00000007.txt", b"hello"),
            ("web/00000007.txt", b"shadowed"),
            ("web/00000007.json", meta),
            ("web/00000007.cls", b"1"),
        ]
    )
    with pytest.raises(ValueError, match="duplicate member suffix"):
        _decode(duped)
