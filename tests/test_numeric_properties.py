"""Hypothesis property tests for the round-5 exact-arithmetic kernels:
hex cube-rounding (g_hex_bin) and sign-factored fixed-point linear
interpolation (q_interpolate_linear).  Pure-python replicas of the SQL
formulas, probed over the full input lattice — the oracle gate proves
engine parity on the corpus; these prove the FORMULAS' invariants on
inputs the corpus never hits (negative slopes, cell boundaries, huge
gaps)."""

from __future__ import annotations

import math
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


def _hex_cell(x: float, y: float, size: float = 3.0):
    """Replica of _hexbin_sql's axial transform + cube rounding."""
    xf = (math.sqrt(3.0) / 3.0 * x - y / 3.0) / size
    zf = (2.0 / 3.0 * y) / size
    yf = -xf - zf
    rx, ry, rz = (math.floor(v + 0.5) for v in (xf, yf, zf))
    dx, dy, dz = abs(rx - xf), abs(ry - yf), abs(rz - zf)
    if dx > dy and dx > dz:
        rx = -ry - rz
    elif not (dy > dz):
        rz = -rx - ry
    else:
        ry = -rx - rz
    return rx, ry, rz, (xf, yf, zf)


@settings(max_examples=300, deadline=None)
@given(
    st.floats(-180, 180, allow_nan=False), st.floats(-90, 90, allow_nan=False)
)
def test_hex_cube_round_invariants(x, y):
    rx, ry, rz, (xf, yf, zf) = _hex_cell(x, y)
    # the fixed cube coordinate always satisfies the hex-lattice plane
    assert rx + ry + rz == 0
    # and stays within one cell radius of the fractional cube point
    # (cube rounding never teleports: each |delta| < 1)
    assert abs(rx - xf) < 1 and abs(ry - yf) < 1 and abs(rz - zf) < 1


def _interp_micro(v1: int, v2: int, e1: int, eid: int, e2: int) -> int:
    """Replica of q_interpolate_linear's sign-factored integer kernel."""
    num = (v2 - v1) * (eid - e1) * 1000000
    den = e2 - e1
    if num >= 0:
        frac = num // den
    else:
        frac = -((-num) // den)
    return v1 * 1000000 + frac


@settings(max_examples=300, deadline=None)
@given(
    st.integers(-60000, 60000),
    st.integers(-60000, 60000),
    st.integers(0, 10**6),
    st.integers(1, 10**5),
    st.integers(1, 10**5),
)
def test_interpolation_kernel_properties(v1, v2, e1, off, extra):
    eid = e1 + off
    e2 = eid + extra
    got = _interp_micro(v1, v2, e1, eid, e2)
    # exact rational reference, truncated toward zero on the fraction
    true = Fraction(v2 - v1) * Fraction(eid - e1, e2 - e1) * 1000000
    trunc = math.trunc(true)
    assert got == v1 * 1000000 + trunc
    # endpoints are exact
    assert _interp_micro(v1, v2, e1, e1, e2) == v1 * 1000000
    assert _interp_micro(v1, v2, e1, e2, e2) == v2 * 1000000
    # monotone bounds: interpolant lies between the endpoints
    lo, hi = sorted((v1 * 1000000, v2 * 1000000))
    assert lo <= got <= hi


# ---- distributed global ordering (functions/ranks.py) ----


def test_with_global_order_matches_single_task_window(spark):
    """The range-partitioned rank/cumsum/ntile must be value-identical
    to the partition-less window it replaces, on data with duplicates
    in the primary key (tie-broken by id) and negative values (a
    signed cumsum's partition total is its LAST local value, not its
    max)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ukis_kafka_spark.functions.ranks import with_global_order

    df = spark.sql("""
        SELECT id,
               CAST(id % 7 AS BIGINT)            AS k,
               CAST((id % 5) - 2 AS BIGINT)      AS v
        FROM range(1000)
    """)
    order = [F.col("k").asc(), F.col("id").asc()]
    got = with_global_order(
        df, order, rank_col="rn", cumsum={"cv": F.col("v")}, ntile=("t", 7)
    )
    w = Window.orderBy(*order)
    want = df.select(
        "id", "k", "v",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.ntile(7).over(w).cast("bigint").alias("t"),
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cv"),
    )
    assert got.columns == ["id", "k", "v", "rn", "t", "cv"]
    diff = got.select("id", "rn", "cv", "t").exceptAll(
        want.select("id", "rn", "cv", "t")
    )
    assert diff.count() == 0
    assert got.count() == 1000


def test_with_global_order_partition_invariance(spark):
    """Global ranks/cumsums depend only on the total order — never on
    where the range boundaries fall. Recompute under wildly different
    input partitioning and shuffle-partition counts."""
    from pyspark.sql import functions as F

    from ukis_kafka_spark.functions.ranks import with_global_order

    base = spark.sql(
        "SELECT id, CAST(id * 37 % 101 AS BIGINT) AS v FROM range(500)"
    )
    order = [F.col("v").asc(), F.col("id").asc()]

    def run(df):
        return {
            (r["id"], r["rn"], r["cv"])
            for r in with_global_order(
                df, order, rank_col="rn", cumsum={"cv": F.col("v")}
            ).collect()
        }

    a = run(base.repartition(1))
    b = run(base.repartition(16, "id"))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        c = run(base.repartition(7))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b == c


def test_with_global_order_ntile_small_n(spark):
    """n < k: Spark's ntile gives every row its own bucket — the
    derived-from-rank formula must reproduce that edge."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ukis_kafka_spark.functions.ranks import with_global_order

    df = spark.range(4).select(F.col("id"))
    got = with_global_order(df, [F.col("id").asc()], ntile=("t", 10))
    want = df.select(
        "id", F.ntile(10).over(Window.orderBy("id")).cast("bigint").alias("t")
    )
    assert got.exceptAll(want).count() == 0


def test_with_global_order_cummax_before(spark):
    """Exclusive prefix max (the skyline frontier scan) must match the
    single-task window exactly, including the NULL on the globally
    first row and across different partitionings."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ukis_kafka_spark.functions.ranks import with_global_order

    df = spark.sql(
        "SELECT id, CAST((id * 53) % 97 - 48 AS BIGINT) AS v FROM range(400)"
    )
    order = [F.col("id").asc()]
    got = with_global_order(df, order, cummax_before={"best": F.col("v")})
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want = df.select("id", "v", F.max("v").over(w).alias("best"))
    assert got.exceptAll(want).count() == 0 and got.count() == 400
    # first row must be NULL (no predecessor)
    assert got.orderBy("id").first()["best"] is None
    # partition-invariance
    got2 = with_global_order(
        df.repartition(13, "v"), order, cummax_before={"best": F.col("v")}
    )
    assert got2.exceptAll(want).count() == 0


@given(
    st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=5),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=300, deadline=None)
def test_epoch_waterfill_unrolled_rounds_reach_fixed_point(masses, budget_mult, cap_mult):
    """m_epoch_cap_mix unrolls exactly 5 rounds; the claim is that
    |langs| rounds is ALWAYS a fixed point (each round either caps a
    new language or changes nothing). Verified against a run-to-
    convergence while-loop over arbitrary masses and cap/budget
    multipliers, plus the invariants: caps respected, budget never
    exceeded, equal shares for the uncapped."""
    b = budget_mult * sum(masses)
    cap = [cap_mult * m for m in masses]

    def run(max_rounds):
        capped: set[int] = set()
        share = None
        for _ in range(max_rounds):
            rem = b - sum(cap[i] for i in capped)
            unc = [i for i in range(len(masses)) if i not in capped]
            if not unc:
                break
            share = rem // len(unc)
            new = {i for i in unc if share > cap[i]}
            if not new:
                break
            capped |= new
        return capped, share

    converged = run(10**6)
    unrolled = run(len(masses))
    assert unrolled == converged
    capped, share = converged
    if len(capped) < len(masses):
        alloc = [cap[i] if i in capped else share for i in range(len(masses))]
        assert all(a <= c for a, c in zip(alloc, cap))
        assert sum(alloc) <= b


@given(
    st.integers(min_value=1, max_value=10**12),
    st.integers(min_value=1, max_value=100),
    st.data(),
)
@settings(max_examples=300, deadline=None)
def test_ntile_bigint_formula_matches_definition(n, k, data):
    """The all-BIGINT ntile arithmetic in functions/ranks.py
    (ceil-as-div: (g+s) div (s+1) / r + (g-big+s-1) div s) must equal
    the SQL-standard ntile definition — first n%k buckets hold
    ceil(n/k) rows — for any rank, including n < k and the huge-n
    range where the old double division was inexact."""
    g = data.draw(st.integers(min_value=1, max_value=n))
    s, r = n // k, n % k
    big = r * (s + 1)
    if g <= big:
        tile = (g + s) // (s + 1)
    else:
        tile = r + (g - big + s - 1) // s
    # definition: bucket sizes are (s+1) for the first r buckets, s after
    if g <= big:
        want = (g - 1) // (s + 1) + 1
    else:
        want = r + (g - big - 1) // s + 1
    assert tile == want
    assert 1 <= tile <= min(k, n)
