"""Self-tests for the differential-oracle harness (tests/util.py):
prove the comparator actually FAILS on each discrepancy class — a
compare that silently passes everything would turn the whole oracle
gate vacuous, which no green suite would ever reveal.
"""

from __future__ import annotations

import duckdb
import pytest

from .util import assert_parity, assert_scalar_schema, norm_df


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _df(spark, sql):
    return spark.sql(sql)


def test_parity_passes_on_equal(spark, duck):
    assert_parity(
        _df(spark, "SELECT 1 AS a, 'x' AS b UNION ALL SELECT 2, 'y'"),
        duck,
        "SELECT 2 AS a, 'y' AS b UNION ALL SELECT 1, 'x'",  # order-insensitive
        "equal",
    )


def test_parity_fails_on_value_diff(spark, duck):
    with pytest.raises(AssertionError, match="values differ"):
        assert_parity(
            _df(spark, "SELECT 1 AS a"), duck, "SELECT 2 AS a", "valdiff"
        )


def test_parity_fails_on_rowcount_diff(spark, duck):
    with pytest.raises(AssertionError, match="rowcount"):
        assert_parity(
            _df(spark, "SELECT 1 AS a"),
            duck,
            "SELECT 1 AS a UNION ALL SELECT 1",
            "rowdiff",
        )


def test_parity_fails_on_column_diff(spark, duck):
    with pytest.raises(AssertionError, match="columns"):
        assert_parity(
            _df(spark, "SELECT 1 AS a"), duck, "SELECT 1 AS b", "coldiff"
        )


def test_parity_fails_on_float_ulp(spark, duck):
    """One ULP of double difference must NOT slip through — the entire
    hash-safety discipline (decimal sums, fixed-point, grids) exists
    because the comparator is this strict."""
    with pytest.raises(AssertionError, match="values differ"):
        assert_parity(
            _df(spark, "SELECT CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE) AS x"),
            duck,
            "SELECT CAST(0.3 AS DOUBLE) AS x",  # 0.1+0.2 != 0.3 in IEEE
            "ulp",
        )


def test_parity_distinguishes_null_from_zero(spark, duck):
    with pytest.raises(AssertionError, match="values differ"):
        assert_parity(
            _df(spark, "SELECT CAST(NULL AS INT) AS x"),
            duck,
            "SELECT 0 AS x",
            "nullzero",
        )


def test_scalar_schema_guard_rejects_nested(spark):
    for sql, kind in [
        ("SELECT array(1, 2) AS a", "array"),
        ("SELECT map('k', 1) AS m", "map"),
        ("SELECT named_struct('f', 1) AS s", "struct"),
    ]:
        with pytest.raises(AssertionError, match="non-scalar"):
            assert_scalar_schema(_df(spark, sql), kind)
    assert_scalar_schema(_df(spark, "SELECT 1 AS a, 'x' AS b"), "scalars-ok")


def test_norm_df_canonicalization(spark):
    """Row order and column order must not affect the canonical form;
    NaN and NULL must stay distinguishable."""
    a = norm_df(_df(spark, "SELECT 1 AS a, 2 AS b UNION ALL SELECT 3, 4").toPandas())
    b = norm_df(_df(spark, "SELECT 4 AS b, 3 AS a UNION ALL SELECT 2, 1").toPandas())
    assert a == b
    # DOCUMENTED LIMIT: pandas materialization folds a NULL double into
    # NaN, so the comparator cannot distinguish them for float columns
    # (the driver's canonicalizer shares this property). Integer NULLs
    # stay distinct (test_parity_distinguishes_null_from_zero above).
    nan = norm_df(_df(spark, "SELECT CAST('NaN' AS DOUBLE) AS x").toPandas())
    nul = norm_df(_df(spark, "SELECT CAST(NULL AS DOUBLE) AS x").toPandas())
    assert nan == nul


def test_dead_column_audit_flags_planted_vacuities(spark):
    """The dead-column audit's detector itself (tools/dead_column_audit
    .audit_df) must fire on planted vacuities — a numeric measure that
    never fires (DEAD), a CASE label branch that never fires so the
    string column is constant (CONST), a boolean that never flips, an
    all-rows-identical group key — and stay silent on a healthy frame
    (VERDICT r5 item 5: the round-5 numeric sweep caught 7 real
    vacuities; string-shaped ones were invisible until this check)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from dead_column_audit import audit_df

    planted = spark.sql("""
        SELECT id,
               0 * id                                   AS never_fires,
               CASE WHEN id > 100 THEN 'big' ELSE 'small' END AS label,
               id > 100                                 AS flag,
               'NATION_0'                               AS grp_key,
               id + 1                                   AS healthy_num,
               CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS healthy_label
        FROM range(10)
    """)
    flags = audit_df(planted)
    assert flags["dead"] == ["never_fires"]
    assert set(flags["const"]) == {"never_fires", "label", "flag", "grp_key"}

    healthy = spark.sql(
        "SELECT id, id + 1 AS v, CAST(id % 2 = 0 AS BOOLEAN) AS b, "
        "concat('k', id) AS k FROM range(10)"
    )
    assert audit_df(healthy) == {"dead": [], "const": []}

    # single-row results are exempt from CONST (a global aggregate is
    # legitimately one row of constants) but not from DEAD
    one = spark.sql("SELECT 0 AS z, 'tag' AS t")
    flags1 = audit_df(one)
    assert flags1["dead"] == ["z"] and flags1["const"] == []


def test_deadcols_baseline_fresh_and_reviewed():
    """The dead-column RATCHET (VERDICT r6 item 8): DEADCOLS.json is
    the committed, human-reviewed vacuity baseline written by
    ``tools/dead_column_audit.py --write`` at sf0.01.

    (a) FRESHNESS — every registered batch query must have an audit
        row: a new operator fails the suite until the sweep is re-run;
    (b) REVIEWED — every flag row must carry ``reviewed: true``: the
        --write tool stamps a NEW or CHANGED flag set ``false``, so a
        freshly-landed vacuous column fails until a human judges it
        (honest zero / by-design constant → flip by hand; real
        vacuity → fix the operator and re-run);
    (c) no stale rows for queries that no longer exist.
    """
    import json
    from pathlib import Path

    from ukis_kafka_spark import api

    path = Path(__file__).resolve().parents[1] / "DEADCOLS.json"
    data = json.loads(path.read_text())
    batch = {
        n for n in api.QUERIES if not n.startswith(("s_", "sink_", "src_"))
    }
    audited = set(data["audited"])
    missing = batch - audited
    assert not missing, (
        f"operators missing from the dead-column baseline: {sorted(missing)} "
        "— run `python tools/dead_column_audit.py --write`, review any new "
        "flags, and commit DEADCOLS.json"
    )
    stale = audited - batch
    assert not stale, f"stale audit rows for removed queries: {sorted(stale)}"
    unreviewed = [n for n, v in data["flags"].items() if not v.get("reviewed")]
    assert not unreviewed, (
        f"unreviewed vacuity flags: {unreviewed} — judge each column "
        "(honest zero / by-design constant / real vacuity) before flipping "
        "reviewed: true in DEADCOLS.json"
    )
    assert set(data["flags"]) <= audited


def test_plan_fingerprints_fresh():
    """Physical-plan fingerprint RATCHET (VERDICT r10 stretch item 7):
    PLAN_FINGERPRINTS.json is the committed per-query plan-hash record
    that lets tools/plan_audit.py detect a refactored plan whose old
    driver row still counts as green (the _REFLOAT_MIN_ROUND discipline,
    harness-enforced). Freshness contract mirrors DEADCOLS: every batch
    query has a fingerprint, no stale rows. The hash COMPARISON runs in
    plan_audit (plan builds are too expensive for the suite); this test
    only pins record coverage so a new operator forces a sweep."""
    import json
    from pathlib import Path

    from ukis_kafka_spark import api

    path = Path(__file__).resolve().parents[1] / "PLAN_FINGERPRINTS.json"
    data = json.loads(path.read_text())
    batch = {n for n in api.QUERIES if not n.startswith(("s_", "sink_"))}
    missing = batch - set(data)
    assert not missing, (
        f"operators missing from PLAN_FINGERPRINTS.json: {sorted(missing)} "
        "— run `python tools/plan_audit.py --write-fingerprints` and commit"
    )
    stale = set(data) - batch
    assert not stale, f"stale fingerprints for removed queries: {sorted(stale)}"


def test_plan_fingerprint_canonicalization():
    """plan_fingerprint must be invariant to the run-to-run noise in a
    physical-plan string (expression IDs, RDD numbers, staging paths,
    statistics) and sensitive to the operator tree."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "plan_audit", Path(__file__).resolve().parents[1] / "tools" / "plan_audit.py"
    )
    pa = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pa)

    a = (
        "*(2) HashAggregate(keys=[lang#123], functions=[sum(v#45L)])\n"
        "+- Exchange hashpartitioning(lang#123, 32), true, [id=#77]\n"
        "   +- Scan ExistingRDD[doc_id#12L,lang#123] MapPartitionsRDD[41]\n"
        "      +- FileScan parquet [v#45L] Location InMemoryFileIndex(1 paths)"
        "[file:/tmp/spark-graft-cache/ab12cd/x.parquet], Statistics(sizeInBytes=1.2 KiB)"
    )
    b = (
        "*(2) HashAggregate(keys=[lang#9], functions=[sum(v#2L)])\n"
        "+- Exchange hashpartitioning(lang#9, 32), true, [id=#3]\n"
        "   +- Scan ExistingRDD[doc_id#5L,lang#9] MapPartitionsRDD[7]\n"
        "      +- FileScan parquet [v#2L] Location InMemoryFileIndex(1 paths)"
        "[file:/tmp/spark-graft-cache/ff99ee/y.parquet], Statistics(sizeInBytes=88.0 B)"
    )
    assert pa.plan_fingerprint(a) == pa.plan_fingerprint(b)
    c = a.replace("HashAggregate", "SortAggregate")
    assert pa.plan_fingerprint(a) != pa.plan_fingerprint(c)


def test_bench_violation_adjudication_hook():
    """bench.py's self-adjudicating budget hook (VERDICT r09 item 5)
    runs only when a pass has violations, so healthy zero-violation
    benches never execute it — this test drives the extracted function
    directly: (a) only >2x-budget queries are re-run, worst first;
    (b) the emitted record carries both numbers and the family budget;
    (c) the in-pass number is never replaced by the isolated one."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).resolve().parents[1] / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    times = {
        "q_fast": 1.0,          # within budget — untouched
        "q_blown": 9.0,         # 4.5x the 2.0 q-budget — adjudicated
        "m_heavy_ok": 12.0,     # 1.5x the 8.0 m-budget — NOT a violation
        "s_blown": 13.0,        # 2.2x the 6.0 s-budget — adjudicated
    }
    reruns = []

    def rerun(name):
        reruns.append(name)
        return 0.8  # isolated run comes back healthy (host noise)

    v = bench.adjudicate_violations(times, rerun)
    assert reruns == ["s_blown", "q_blown"]  # worst-first, only violators
    assert set(v) == {"q_blown", "s_blown"}
    assert v["q_blown"] == {"in_pass": 9.0, "isolated": 0.8, "budget": 2.0}
    assert v["s_blown"]["budget"] == 6.0
    assert times["q_blown"] == 9.0  # in-pass number not overwritten

    # a violation that REPRODUCES in isolation stays fully recorded
    v2 = bench.adjudicate_violations({"q_blown": 9.0}, lambda n: 8.5)
    assert v2["q_blown"]["isolated"] == 8.5
