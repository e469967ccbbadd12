"""Registry-wide physical-plan audit: build every batch query's plan
and count the anti-patterns that matter at 100 TB — Python eval
nodes, cartesian products, nested-loop joins, exchange counts.

tests/test_plans.py pins individual load-bearing shapes; this tool is
the SWEEP — it catches a regression in any of the ~300 batch queries
without hand-writing 300 tests, and writes the evidence the at-scale
claims rest on to PLANS_AUDIT.json.

Streaming (s_*) and sink_* queries execute jobs at plan-build time, so
they are audited by their tests instead and skipped here.

Usage: python tools/plan_audit.py   (writes PLANS_AUDIT.json)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ukis_kafka_spark import api  # noqa: E402
from ukis_kafka_spark.plans import get_spark  # noqa: E402

SF_DIR = os.environ.get(
    "SPARK_GRAFT_SF_DIR", os.environ.get("SF_DIR", "/root/testdata/sf0.001")
)

# Python eval is the sanctioned boundary for the u_* surface and for
# m_* Arrow kernels; cartesian/BNLJ appear legitimately where a tiny
# broadcast side makes them linear (theta joins, literal dims).  The
# audit therefore reports COUNTS per family and flags only the
# combinations that are never acceptable: EvalPython in q_/g_/src_
# plans, or a CartesianProduct anywhere.
NEVER_PY = ("q_", "g_", "src_")
# Documented escape hatches (README design rule 3: binary codecs and
# ray casting are sanctioned Arrow kernels even in the g_/src_
# families). src_gpkg_roundtrip decodes msgpack envelopes + WKB — the
# same codec kernel class as g_wkb_serde.
PY_ALLOWLIST = {"g_wkb_serde", "g_point_in_poly", "g_geom_valid", "src_gpkg_roundtrip"}

# A partition-less (global) Window is a single-task funnel — fatal on
# an unbounded input at 100 TB, fine on a provably tiny one. Every
# sanctioned site below rides an input bounded by CONSTRUCTION —
# post-limit rank stamps, fixed histogram grids, calendar-grain
# aggregates, or value-domain supports (VERDICT r5 item 7: count them
# explicitly so the WindowExec warning from an 8-row pattern seed
# can't mask a real global window introduced later). Corpus-growing
# grains (customer/part/user/doc/token/vector/second) were migrated
# to functions.ranks.with_global_order instead. Flag any OTHER query
# whose plan contains one.
GLOBAL_WINDOW_ALLOWLIST: dict[str, str] = {
    # post-limit rank stamps (input is a LIMIT k result)
    "q_sort_multi": "rank stamp on the top-500 TakeOrdered result",
    "q_subseq_search": "rank stamp on the top-10 TakeOrdered result",
    "q_subseq_znorm": "rank stamp on the top-10 TakeOrdered result",
    "m_importance_resample": "rank stamp on the top-50 TakeOrdered result",
    "m_rank_fusion": "rank stamp on the top-10 TakeOrdered result",
    "m_ann_recall_eval": "list-id stamp on the 16-row LIMIT'd centroid seed",
    # fixed-grid / bounded-report windows
    "m_adaboost_round": "cumsums/argmax over the 32-cell stump grid (x2 rounds)",
    "m_decision_stump": "cumsum/rank over the 32-cell threshold grid",
    "m_decile_lift": "cumulative capture over the 10-row decile report",
    "q_lorenz_deciles": "cumulative share over the 10-row decile report",
    "q_quantile_hist": "cumsum over the fixed histogram bin grid",
    "m_neyman_allocation": "largest-remainder rank over |langs| strata",
    # calendar-grain aggregates (one row per hour/day/month)
    "q_changepoint": "deviation scan over hour-grain aggregate",
    "q_cumulative_distinct": "running union over day-grain aggregate",
    "q_mom_growth": "lag over month-grain aggregate",
    "q_rolling_corr": "24h frame over hour-grain aggregate",
    "q_rolling_variance": "24h frame over hour-grain aggregate",
}
# round-6 note: q_ks_test / q_mann_whitney / q_wilcoxon / q_skyline
# were first allowlisted as value-domain-bounded, then migrated to
# with_global_order anyway (cumsum / cummax_before) — the primitive
# costs nothing extra and removes the justification burden.


def _count_global_windows(plan: str) -> int:
    """Window nodes print as ``Window [fns], [partition], [order]``
    when fully specified, ``Window [fns], [partition]`` when
    partition-only (NOT a funnel — it distributes), and
    ``Window [fns], [order]`` when global.  Classify by counting
    top-level bracket groups AND checking the last group for a sort
    direction (ASC/DESC only appear in order specs)."""
    n = 0
    for line in plan.splitlines():
        idx = line.find("Window [")
        if idx < 0:
            continue
        rest = line[idx + len("Window ") :]
        if "more fields" in rest:
            # spark.sql.debug.maxToStringFields truncation ("... N
            # more fields") can swallow the spec groups — count it
            # conservatively so the sweep FLAGS it for a human rather
            # than silently passing a possibly-global window (ADVICE
            # r6: the old wholesale skip was a silent false negative)
            n += 1
            continue
        groups, depth, start = [], 0, None
        for i, ch in enumerate(rest):
            if ch == "[":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(rest[start : i + 1])
        if depth != 0:
            n += 1  # unbalanced/cut-off spec — flag, don't skip
            continue
        if len(groups) != 2 or not (" ASC" in groups[1] or " DESC" in groups[1]):
            continue  # partitioned or partition-only window — distributes
        # the ONE sanctioned global window: with_global_order's
        # internal offsets cumulation — one row per shuffle partition
        # by construction, SUM/MAX over __go_cnt/__go_tot*/__go_totmx*
        # ordered by __go_pid. Scoped to the PARSED groups: a genuine
        # global window whose expressions merely mention __go_ columns
        # is still counted (ADVICE r6 scoped this down from a
        # line-wide substring skip).
        if "__go_pid" in groups[1] and (
            "__go_cnt" in groups[0]
            or "__go_tot" in groups[0]
            or "__go_totmx" in groups[0]
        ):
            continue
        n += 1
    return n


def main() -> int:
    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    rows: dict[str, dict[str, int]] = {}
    flags: list[str] = []
    skipped: list[str] = []
    for name, fn in api.queries().items():
        if name.startswith(("s_", "sink_")):
            skipped.append(name)
            continue
        try:
            plan = (
                fn(spark, SF_DIR)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:  # pragma: no cover - audit robustness
            flags.append(f"{name}: plan build failed: {exc}")
            continue
        info = {
            "eval_python": plan.count("EvalPython"),
            "cartesian": plan.count("CartesianProduct"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "exchanges": plan.count("Exchange"),
            "global_windows": _count_global_windows(plan),
        }
        rows[name] = info
        if info["cartesian"]:
            flags.append(f"{name}: CartesianProduct in plan")
        if info["global_windows"] and name not in GLOBAL_WINDOW_ALLOWLIST:
            flags.append(
                f"{name}: {info['global_windows']} partition-less Window "
                "node(s) — single-task funnel unless the input is bounded; "
                "add to GLOBAL_WINDOW_ALLOWLIST with a justification"
            )
        if (
            info["eval_python"]
            and name.startswith(NEVER_PY)
            and name not in PY_ALLOWLIST
        ):
            flags.append(f"{name}: Python eval in a JVM-only family")

    out = {
        "sf_dir": SF_DIR,
        "n_audited": len(rows),
        "n_skipped_streaming": len(skipped),
        "flags": flags,
        "global_window_allowlist": GLOBAL_WINDOW_ALLOWLIST,
        "totals": {
            "eval_python_plans": sum(1 for r in rows.values() if r["eval_python"]),
            "bnlj_plans": sum(1 for r in rows.values() if r["bnlj"]),
            "cartesian_plans": sum(1 for r in rows.values() if r["cartesian"]),
            "global_window_plans": sum(
                1 for r in rows.values() if r["global_windows"]
            ),
        },
        "queries": rows,
    }
    with open(os.path.join(REPO, "PLANS_AUDIT.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(
        f"audited {len(rows)} plans, skipped {len(skipped)} streaming/sink; "
        f"flags: {len(flags)}"
    )
    for f in flags:
        print("FLAG", f)
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())
