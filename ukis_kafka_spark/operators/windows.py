"""Window-function operators (SURVEY.md §2.2 "Window functions").

Determinism rules used throughout:
- every ORDER BY carries a unique-key tiebreak (o_orderkey/event_id),
- event-time ordering uses ``event_id`` (verified ts-monotone in the
  corpus; same-user events are seconds apart, so the ns-vs-µs
  precision mismatch between DuckDB and Spark can never flip an order),
- frame sums run over exact decimals (hashsafe rules).

Scale: one shuffle on the partition key per window spec; Spark chains
same-spec window functions into a single Window exec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashsafe import DEC
from ..registry import query
from ..sources import load_table


@query(
    "q_win_rank",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       row_number() OVER w AS rn
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
""",
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
    )


@query(
    "q_win_lag_lead",
    oracle="""
SELECT event_id, user_id, value,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       value - lag(value) OVER w AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
""",
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("event_id")
    v = F.col("value")
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.lag(v).over(w).alias("prev_value"),
        F.lead(v).over(w).alias("next_value"),
        (v - F.lag(v).over(w)).alias("delta"),
    )


@query(
    "q_win_running",
    oracle="""
SELECT event_id, user_id,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) OVER (
         PARTITION BY user_id ORDER BY event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_value
FROM events
""",
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per user — exact decimal prefix sums, so every prefix
    is identical across engines, not just the total."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("running_value"),
    )


@query(
    "q_win_moving",
    oracle="""
SELECT event_id, user_id,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) OVER w AS VARCHAR) AS DOUBLE)
         / COUNT(*) OVER w AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
)
def q_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over a 4-row frame: exact decimal frame sum divided
    by the frame count (native avg() would round engine-specifically)."""
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-3, 0)
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (F.sum(F.col("value").cast(DEC)).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "moving_avg"
        ),
    )


@query(
    "q_win_range_frame",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice,
       COUNT(*) OVER (
         PARTITION BY o_orderstatus ORDER BY o_totalprice
         RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_in_band,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) OVER (
         PARTITION BY o_orderstatus ORDER BY o_totalprice
         RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS band_sum
FROM orders
""",
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric order key: all orders of the same
    status within 1k price below the current row. Frame membership is
    a double comparison — identical in both engines — and the frame
    aggregate is order-insensitive by the range definition.

    Uses the SQL frontend: PySpark's ``rangeBetween`` only accepts
    integral boundaries, while RANGE over a double key needs a double
    offset.

    Scale note: Spark's bounded-RANGE frame aggregation is O(rows x
    frame width) (no incremental eviction, measured 11s->0.5s for
    10000->100 band at sf0.1), so wide bands over dense keys should be
    re-expressed as a bucketed self-join; the declared band keeps
    frames narrow."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_rf")
    return spark.sql(
        """
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               COUNT(*) OVER w AS n_in_band,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) OVER w AS DOUBLE) AS band_sum
        FROM orders_rf
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
                     RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)
        """
    )


@query(
    "q_win_ntile_firstlast",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       ntile(4) OVER w AS quartile,
       first_value(c_custkey) OVER w AS richest_cust,
       last_value(c_custkey) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest_cust
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
""",
)
def q_win_ntile_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.first("c_custkey").over(w).alias("richest_cust"),
        F.last("c_custkey").over(w_full).alias("poorest_cust"),
    )


@query(
    "q_win_pctrank",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC)
""",
)
def q_win_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist — ratios of integer rank counts, so the
    doubles are identical across engines without rounding."""
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "q_distinct_on",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate_s, o_totalprice FROM (
  SELECT o_custkey, o_orderkey,
         CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate_s,
         o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
""",
)
def q_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest order per customer — the DISTINCT ON / argmax pattern via
    row_number with a deterministic (date, key) tiebreak. One shuffle
    on the partition key; at scale this is the standard dedup-to-latest
    shape (same plan as a max-by self-join but single-pass)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate_s"),
            "o_totalprice",
        )
    )


@query(
    "q_win_cume_nth",
    oracle="""
SELECT s_suppkey, n_name, s_acctbal,
       cume_dist() OVER w AS cd,
       nth_value(s_name, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS runner_up
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WINDOW w AS (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey ASC)
""",
)
def q_win_cume_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + nth_value per nation (suppliers ranked by balance).
    cume_dist's k/n division is a single correctly-rounded IEEE op on
    identical integers, so raw doubles hash-match across engines; the
    nth_value frame is pinned to the full partition explicitly (the
    default frame stops at CURRENT ROW and would NULL the first row).
    One shuffle on the partition key; both functions share one window
    spec ordering so Spark evaluates them in a single Window exec."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey").asc())
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "s_suppkey",
            "n_name",
            "s_acctbal",
            F.cume_dist().over(w).alias("cd"),
            F.nth_value("s_name", 2).over(wfull).alias("runner_up"),
        )
    )


@query(
    "q_scd2_intervals",
    oracle="""
WITH chg AS (
  SELECT user_id, event_type, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
  FROM events
), runs AS (
  SELECT user_id, event_type, event_id AS valid_from_id
  FROM chg
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type, valid_from_id,
       lead(valid_from_id) OVER (PARTITION BY user_id ORDER BY valid_from_id) AS valid_to_id,
       lead(valid_from_id) OVER (PARTITION BY user_id ORDER BY valid_from_id) IS NULL AS is_current
FROM runs
""",
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → SCD-type-2 intervals: collapse each user's event
    stream into half-open validity runs [valid_from, valid_to) keyed by
    the monotone event_id (the corpus-verified version axis — ts is
    nanos and never emitted raw). Two window passes over the same
    partition key = one shuffle total; this is the standard
    dimension-building shape for CDC feeds at scale."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "event_id")
    w = Window.partitionBy("user_id").orderBy("event_id")
    runs = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select("user_id", "event_type", F.col("event_id").alias("valid_from_id"))
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from_id")
    nxt = F.lead("valid_from_id").over(w2)
    return runs.select(
        "user_id",
        "event_type",
        "valid_from_id",
        nxt.alias("valid_to_id"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "q_win_count_distinct",
    oracle="""
SELECT event_id, user_id, event_type,
       CAST(count(DISTINCT event_type) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_types_so_far
FROM events
""",
)
def q_win_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an ordered window — a frame Spark's
    window exec does not support natively.  Re-expressed as
    ``size(collect_set(...))`` over the running frame: collect_set
    dedups inside the state, so the set size IS the distinct count and
    ordering inside the set never matters.  State per row is bounded by
    the event-type vocabulary (5 values), not the frame length, so the
    running frame stays O(|vocab|) memory at any scale; one shuffle on
    user_id."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.size(F.collect_set("event_type").over(w)).cast("bigint").alias("n_types_so_far"),
    )


@query(
    "q_gaps_islands",
    oracle="""
WITH g AS (
  SELECT user_id, event_type, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id)
         - row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS grp
  FROM events
)
SELECT user_id, event_type,
       min(event_id) AS island_start,
       max(event_id) AS island_end,
       count(*) AS island_len
FROM g
GROUP BY user_id, event_type, grp
""",
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive same-type events
    per user via the classic difference-of-row-numbers island key
    (monotone along event_id; constant within a run, distinct across
    runs).  Two window specs share the user_id shuffle, then one
    aggregate on (user_id, event_type, grp) — 2 shuffles total and no
    self-join, the shape that survives a 100× corpus."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "event_id")
    w_all = Window.partitionBy("user_id").orderBy("event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    g = e.withColumn(
        "grp", F.row_number().over(w_all) - F.row_number().over(w_typ)
    )
    return g.groupBy("user_id", "event_type", "grp").agg(
        F.min("event_id").alias("island_start"),
        F.max("event_id").alias("island_end"),
        F.count(F.lit(1)).alias("island_len"),
    ).drop("grp")


@query(
    "q_fill_forward",
    oracle="""
SELECT event_id, user_id,
       (event_id % 7 = 0) AS was_gap,
       last_value(CASE WHEN event_id % 7 <> 0 THEN value END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled_value
FROM events
""",
)
def q_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (LOCF gap repair): a deterministic mask knocks out
    every 7th reading, then ``last(..., ignorenulls=True)`` over the
    running frame carries the previous observation forward — the
    standard sensor/telemetry repair step before feature extraction.
    The filled value is a bit-identical pass-through of a parquet
    double (no arithmetic), so it hash-matches across engines; a
    user's leading masked rows stay NULL on both sides by the same
    rule.  One shuffle on user_id; running state is one value."""
    e = load_table(spark, sf_dir, "events")
    masked = F.when(F.col("event_id") % 7 != 0, F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        (F.col("event_id") % 7 == 0).alias("was_gap"),
        F.last(masked, ignorenulls=True).over(w).alias("filled_value"),
    )


@query(
    "q_time_weighted_avg",
    oracle="""
WITH seq AS (
  SELECT user_id, value,
         CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS ep,
         CAST(floor(epoch(date_trunc('second', lead(ts) OVER (PARTITION BY user_id ORDER BY event_id)))) AS BIGINT) AS ep_next
  FROM events
), held AS (
  SELECT user_id, value, ep_next - ep AS dt
  FROM seq WHERE ep_next IS NOT NULL
)
SELECT user_id,
       CAST(SUM(dt) AS BIGINT) AS total_s,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,10)) * dt) * 1000000 AS BIGINT)
            // CAST(SUM(dt) AS BIGINT) AS BIGINT) AS twa_micro
FROM held
GROUP BY user_id
""",
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's reading — Σ(value·Δt)/Σ(Δt)
    under sample-and-hold semantics, the correct mean for irregularly
    sampled telemetry (a plain AVG over-weights bursts).  Δt comes
    from second-truncated epochs (exact integers, ≥8 s same-user gaps
    make truncation safe); the weighted sum runs in DECIMAL (value is
    2-6 dp data, so value·Δt is exact) and the mean is emitted as
    fixed-point micro-units via integer division — a rounded double
    quotient would sit on midpoints (CLAUDE.md rule).  One shuffle on
    user_id for the lead(), the aggregate reuses the partitioning."""
    e = load_table(spark, sf_dir, "events")
    ep = F.floor(F.unix_timestamp(F.date_trunc("second", F.col("ts")))).cast("bigint")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = e.select("user_id", "event_id", "value", ep.alias("ep")).withColumn(
        "ep_next", F.lead("ep").over(w)
    )
    held = seq.where(F.col("ep_next").isNotNull()).select(
        "user_id", "value", (F.col("ep_next") - F.col("ep")).alias("dt")
    )
    return held.groupBy("user_id").agg(
        F.sum("dt").cast("bigint").alias("total_s"),
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(28,10)) * dt) * 1000000 AS BIGINT)"
            " div SUM(dt)"
        ).cast("bigint").alias("twa_micro"),
    )


@query(
    "q_trend_slope",
    oracle="""
WITH pts AS (
  SELECT user_id,
         (CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT)
          - min(CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT))
              OVER (PARTITION BY user_id)) // 60 AS x,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS y
  FROM events
)
SELECT user_id,
       count(*) AS n,
       CAST(count(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT) AS slope_num,
       CAST(count(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT) AS slope_den
FROM pts
GROUP BY user_id
""",
)
def q_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares trend slope of the reading over time,
    emitted as the EXACT rational (numerator, denominator) of the
    closed form (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) instead of a rounded
    quotient — rounded quotients of correlated integer sums sit on
    midpoints (CLAUDE.md), the rational never does, and the consumer
    divides at whatever precision it wants.  x is minutes since the
    user's first event (per-user centering keeps x² sums ~10¹³ even
    for year-long histories; raw epochs squared would overflow), y is
    the reading in milli-units via an explicit half-up floor.  One
    window pass for the per-user minimum + one aggregate, both on the
    same user_id shuffle."""
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        "user_id",
        F.expr(
            "(CAST(floor(unix_timestamp(date_trunc('second', ts))) AS BIGINT)"
            " - min(CAST(floor(unix_timestamp(date_trunc('second', ts))) AS BIGINT))"
            "     OVER (PARTITION BY user_id)) div 60"
        ).alias("x"),
        F.floor(F.col("value") * 1000 + 0.5).cast("bigint").alias("y"),
    )
    n = F.count(F.lit(1))
    return pts.groupBy("user_id").agg(
        n.alias("n"),
        (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
        .cast("bigint")
        .alias("slope_num"),
        (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x"))
        .cast("bigint")
        .alias("slope_den"),
    )


@query(
    "q_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS dst
  FROM events
),
trans AS (SELECT src, dst, count(*) AS n FROM seq WHERE dst IS NOT NULL GROUP BY src, dst)
SELECT src, dst, n,
       (1000000 * n) // CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS p_ppm
FROM trans
""",
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the per-user event
    stream: counts and fixed-point per-million probabilities of each
    type→type transition — the behavioral model behind session
    simulation and anomaly scoring.  One lead() pass and one aggregate
    share the user_id shuffle; the row-probability normalization is a
    5×5-group window over the tiny transition table.  Probabilities
    are integer ppm via div (a rounded double quotient of small-
    denominator counts would sit on midpoints — CLAUDE.md rule)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = e.select(
        F.col("event_type").alias("src"), F.lead("event_type").over(w).alias("dst")
    ).where(F.col("dst").isNotNull())
    trans = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    return trans.select(
        "src",
        "dst",
        "n",
        F.expr("(1000000 * n) div sum(n) OVER (PARTITION BY src)").alias("p_ppm"),
    )


@query(
    "q_mom_growth",
    oracle="""
WITH monthly AS (
  SELECT CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS revenue,
         count(*) AS n_orders
  FROM orders
  GROUP BY 1
)
SELECT month_start, revenue, n_orders,
       lag(revenue) OVER (ORDER BY month_start) AS prev_revenue,
       CASE WHEN lag(revenue) OVER (ORDER BY month_start) IS NOT NULL
            THEN CAST(floor((revenue - lag(revenue) OVER (ORDER BY month_start))
                            / lag(revenue) OVER (ORDER BY month_start) * 1000000) AS BIGINT)
       END AS growth_ppm
FROM monthly
""",
)
def q_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the two-level BI construct
    (aggregate to a monthly series, THEN window over the series) that
    exercises re-windowing of an aggregate output. Revenue is an exact
    decimal sum surfaced as double; the growth rate divides two such
    exact doubles (single correctly-rounded IEEE ops) and is floored
    onto an integer ppm grid — floor of a ratio strictly between grid
    points is engine-stable, and the explicit floor sidesteps the
    double→int cast divergence. The monthly series is tiny, so the
    window runs on one partition after a map-side-combined aggregate —
    the 100 TB cost is the first aggregate alone."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.unix_timestamp(F.date_trunc("month", F.col("o_orderdate"))).cast("bigint").alias(
            "month_start"
        )
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,10)")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("month_start")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month_start",
        "revenue",
        "n_orders",
        prev.alias("prev_revenue"),
        F.when(
            prev.isNotNull(),
            F.floor((F.col("revenue") - prev) / prev * 1_000_000).cast("bigint"),
        ).alias("growth_ppm"),
    )


@query(
    "q_drawdown",
    oracle="""
WITH runs AS (
  SELECT user_id, event_id, value,
         max(value) OVER (PARTITION BY user_id ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
  FROM events
),
dd AS (SELECT user_id, event_id, run_max - value AS drawdown FROM runs)
SELECT user_id,
       CAST(CAST(SUM(CAST(drawdown AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS dd_mass,
       max(drawdown) AS max_drawdown,
       min(CASE WHEN drawdown = (SELECT max(d2.drawdown) FROM dd d2
                                 WHERE d2.user_id = dd.user_id)
                THEN event_id END) AS worst_event
FROM dd
GROUP BY user_id
""",
)
def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user maximum drawdown of the reading: running max minus
    current value (both bit-identical parquet doubles — the subtraction
    is one exact IEEE op), its per-user maximum, the first event where
    the worst drawdown occurred (min event_id among argmax ties), and
    the exact-decimal total drawdown mass. The running max and the
    argmax resolution share one user_id shuffle (window + self-
    aggregated max re-join expressed as windowed max), so the whole
    risk profile is a two-pass scan at any scale."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = e.select(
        "user_id",
        "event_id",
        (F.max("value").over(w) - F.col("value")).alias("drawdown"),
    )
    wmax = Window.partitionBy("user_id")
    flagged = dd.withColumn("dd_max", F.max("drawdown").over(wmax))
    return flagged.groupBy("user_id").agg(
        F.sum(F.col("drawdown").cast("decimal(28,10)")).cast("double").alias("dd_mass"),
        F.max("drawdown").alias("max_drawdown"),
        F.min(F.when(F.col("drawdown") == F.col("dd_max"), F.col("event_id"))).alias(
            "worst_event"
        ),
    )


_SCD2_CUTOVER = 8000  # event_id split: base load vs CDC batch


@query(
    "q_scd2_merge",
    oracle="""
WITH chg AS (
  SELECT user_id, event_type, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
  FROM events
), runs AS (
  SELECT user_id, event_type, event_id AS valid_from_id
  FROM chg
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type, valid_from_id,
       lead(valid_from_id) OVER (PARTITION BY user_id ORDER BY valid_from_id) AS valid_to_id,
       lead(valid_from_id) OVER (PARTITION BY user_id ORDER BY valid_from_id) IS NULL AS is_current
FROM runs
""",
)
def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance: a CDC batch (events past the
    cutover id) is merged into the existing dimension by recomputing
    ONLY the users present in the batch and unioning everyone else's
    intervals untouched — the partition-pruned incremental-maintenance
    pattern that makes nightly dimension builds O(changed keys) instead
    of O(history). The oracle is the FULL recompute, so the merge path
    is proven equivalent to rebuilding from scratch — the property an
    incremental pipeline must hold and rarely tests. Shapes: the
    touched-user set broadcasts; untouched intervals stream through an
    anti-join; only touched users' history re-windows."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "event_id")

    def intervals(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy("event_id")
        runs = (
            df.withColumn("prev_type", F.lag("event_type").over(w))
            .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
            .select("user_id", "event_type", F.col("event_id").alias("valid_from_id"))
        )
        w2 = Window.partitionBy("user_id").orderBy("valid_from_id")
        nxt = F.lead("valid_from_id").over(w2)
        return runs.select(
            "user_id", "event_type", "valid_from_id",
            nxt.alias("valid_to_id"), nxt.isNull().alias("is_current"),
        )

    base = intervals(e.where(F.col("event_id") < _SCD2_CUTOVER))
    batch = e.where(F.col("event_id") >= _SCD2_CUTOVER)
    touched = batch.select("user_id").distinct()
    untouched = base.join(F.broadcast(touched), "user_id", "left_anti")
    # touched users: re-derive from their FULL history (base + batch
    # rows for exactly those users) — O(changed keys), not O(table)
    rebuilt = intervals(e.join(F.broadcast(touched), "user_id"))
    return untouched.unionByName(rebuilt)


@query(
    "q_interval_coalesce",
    oracle="""
WITH iv AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS s,
         CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) + 1800 AS e
  FROM events
),
flagged AS (
  SELECT user_id, event_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS new_grp
  FROM iv
),
grouped AS (
  SELECT user_id, s, e,
         SUM(new_grp) OVER (PARTITION BY user_id ORDER BY s, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM flagged
)
SELECT user_id,
       min(s) AS span_start,
       max(e) AS span_end,
       max(e) - min(s) AS covered_s,
       count(*) AS n_intervals
FROM grouped
GROUP BY user_id, grp
""",
)
def q_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing: each event opens a 30-minute validity
    window; overlapping windows per user merge into maximal covered
    spans — the classic union-of-intervals algorithm (availability
    windows, on-call coverage, sensor uptime) as two window passes: a
    running max of interval ends detects gaps (a window starting past
    everything seen so far begins a new span), a running sum of those
    flags numbers the spans, and one aggregate emits span extents.
    All exact integer seconds; the three window specs and the
    aggregate share ONE user_id shuffle."""
    e = load_table(spark, sf_dir, "events")
    ep = F.floor(F.unix_timestamp(F.date_trunc("second", F.col("ts")))).cast("bigint")
    iv = e.select("user_id", "event_id", ep.alias("s"), (ep + 1800).alias("e"))
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = iv.withColumn(
        "new_grp",
        F.when(F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)), 1).otherwise(0),
    )
    grouped = flagged.withColumn("grp", F.sum("new_grp").over(w_run))
    return grouped.groupBy("user_id", "grp").agg(
        F.min("s").alias("span_start"),
        F.max("e").alias("span_end"),
        (F.max("e") - F.min("s")).alias("covered_s"),
        F.count(F.lit(1)).alias("n_intervals"),
    ).drop("grp")


@query(
    "q_peak_detect",
    oracle="""
WITH seq AS (
  SELECT user_id, event_id, value,
         lag(value)  OVER (PARTITION BY user_id ORDER BY event_id) AS pv,
         lead(value) OVER (PARTITION BY user_id ORDER BY event_id) AS nv
  FROM events
),
pk AS (
  SELECT user_id, event_id, value,
         CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
                   AND value > pv AND value > nv THEN 1 END AS is_peak
  FROM seq
)
SELECT user_id,
       COUNT(is_peak) AS n_peaks,
       COALESCE(MIN(CASE WHEN is_peak = 1 THEN event_id END), -1) AS first_peak_id,
       COALESCE(MAX(CASE WHEN is_peak = 1
                         THEN CAST(floor(value * 1000000 + 0.5) AS BIGINT) END), 0)
         AS max_peak_micro
FROM pk
GROUP BY user_id
""",
)
def q_peak_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-extrema detection: a reading is a peak when it strictly
    exceeds both its neighbours in the user's event-id order (the
    1-D relief of telemetry spike mining).  Interior-only by
    construction (boundary rows have a NULL neighbour and can never
    flag), so both engines agree without edge-rule fineprint.  Peak
    magnitudes are emitted in integer micro-units (floor(x·1e6+0.5) —
    the corpus is 2-6 dp data, so the scaled value is never near a
    rounding boundary).  One user_id shuffle serves lag, lead and the
    aggregate."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = e.select("user_id", "event_id", "value").withColumn(
        "pv", F.lag("value").over(w)
    ).withColumn("nv", F.lead("value").over(w))
    pk = seq.withColumn(
        "is_peak",
        F.when(
            F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
            & (F.col("value") > F.col("pv"))
            & (F.col("value") > F.col("nv")),
            1,
        ),
    )
    micro = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
    return pk.groupBy("user_id").agg(
        F.count("is_peak").alias("n_peaks"),
        F.coalesce(
            F.min(F.when(F.col("is_peak") == 1, F.col("event_id"))), F.lit(-1)
        ).alias("first_peak_id"),
        F.coalesce(
            F.max(F.when(F.col("is_peak") == 1, micro)), F.lit(0)
        ).alias("max_peak_micro"),
    )


# q_ewma_fixed: dyadic weights 2^7 .. 2^0 over the last 8 readings.
_EWMA_TAPS = 8


def _ewma_oracle() -> str:
    num = " + ".join(
        f"COALESCE(x{k} * {2 ** (_EWMA_TAPS - 1 - k)}, 0)" for k in range(_EWMA_TAPS)
    )
    den = " + ".join(
        f"CASE WHEN x{k} IS NOT NULL THEN {2 ** (_EWMA_TAPS - 1 - k)} ELSE 0 END"
        for k in range(_EWMA_TAPS)
    )
    lags = ",\n         ".join(
        "CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS x0"
        if k == 0
        else f"lag(CAST(floor(value * 1000000 + 0.5) AS BIGINT), {k})"
        f" OVER (PARTITION BY user_id ORDER BY event_id) AS x{k}"
        for k in range(_EWMA_TAPS)
    )
    return f"""
WITH taps AS (
  SELECT user_id, event_id,
         {lags},
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rd
  FROM events
)
SELECT user_id,
       CAST({num} AS BIGINT) AS ewma_num,
       CAST({den} AS BIGINT) AS ewma_den
FROM taps WHERE rd = 1
"""


@query("q_ewma_fixed", oracle=_ewma_oracle())
def q_ewma_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average as a FIXED-POINT 8-tap
    dyadic filter: weight 2^(7-k) on the k-th most recent reading,
    evaluated at each user's latest event.  A float recurrence
    (a·x + (1-a)·prev) is order-dependent and lands on rounding
    midpoints (CLAUDE.md: iterative float is unhashable); the
    truncated dyadic kernel IS the operator's spec here, so the whole
    thing is exact BIGINT arithmetic — the weighted sum and the
    realised weight mass are emitted as a (num, den) fixed-point
    rational instead of a divided double.  Ragged history (users with
    <8 events) drops missing taps from both numerator and mass.  One
    user_id shuffle serves the 7 lags and the latest-row filter."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    wd = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    micro = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
    taps = e.select("user_id", "event_id", micro.alias("x0"))
    for k in range(1, _EWMA_TAPS):
        taps = taps.withColumn(f"x{k}", F.lag("x0", k).over(w))
    taps = taps.withColumn("rd", F.row_number().over(wd))
    num = sum(
        (
            F.coalesce(F.col(f"x{k}") * (2 ** (_EWMA_TAPS - 1 - k)), F.lit(0))
            for k in range(_EWMA_TAPS)
        ),
        start=F.lit(0),
    )
    den = sum(
        (
            F.when(F.col(f"x{k}").isNotNull(), 2 ** (_EWMA_TAPS - 1 - k)).otherwise(0)
            for k in range(_EWMA_TAPS)
        ),
        start=F.lit(0),
    )
    return taps.where(F.col("rd") == 1).select(
        "user_id",
        num.cast("bigint").alias("ewma_num"),
        den.cast("bigint").alias("ewma_den"),
    )


@query(
    "q_interpolate_linear",
    oracle="""
WITH pts AS (
  SELECT event_id, user_id,
         (event_id % 7 = 0) AS was_gap,
         CASE WHEN event_id % 7 <> 0
              THEN CAST(floor(value * 100) AS BIGINT) END AS vc
  FROM events
),
nb AS (
  SELECT event_id, user_id, was_gap,
         last_value(vc IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v1,
         last_value(CASE WHEN vc IS NOT NULL THEN event_id END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e1,
         first_value(vc IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v2,
         first_value(CASE WHEN vc IS NOT NULL THEN event_id END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS e2
  FROM pts
)
SELECT event_id, user_id, was_gap,
       COALESCE(
         CASE WHEN v1 IS NOT NULL AND v2 IS NOT NULL AND e2 > e1 THEN
           v1 * 1000000 + (CASE
             WHEN (v2 - v1) * (event_id - e1) >= 0
             THEN ((v2 - v1) * (event_id - e1) * 1000000) // (e2 - e1)
             ELSE -(((v1 - v2) * (event_id - e1) * 1000000) // (e2 - e1))
           END)
         END,
         v1 * 1000000, v2 * 1000000, 0) AS interp_micro
FROM nb
""",
)
def q_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR-interpolation gap fill — the numeric twin of
    [q_fill_forward]'s LOCF: the same deterministic holes (every 7th
    event id loses its reading) are refilled by interpolating between
    the previous and next KNOWN readings, positioned by event id.  The
    interpolant is exact fixed-point: centi-integer values, micro-unit
    output, and the fractional term is a SIGN-FACTORED integer division
    (Spark `div` truncates toward zero, DuckDB `//` floors — on
    magnitudes they agree; `/` on BIGINT in DuckDB is float and never
    used).  Boundary holes (before the first / after the last known
    point per user) degrade to LOCF / NOCB via COALESCE, so the output
    is total.  Known rows interpolate to themselves exactly (e1 =
    event_id → fraction 0), which pins alignment.  Scale: two window
    specs over ONE user_id shuffle (forward + backward ignore-nulls
    fills), then stateless arithmetic — no join, no spine table."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    pts = e.select(
        "event_id",
        "user_id",
        (F.col("event_id") % 7 == 0).alias("was_gap"),
        F.when(
            F.col("event_id") % 7 != 0,
            F.floor(F.col("value") * 100).cast("long"),
        ).alias("vc"),
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    eid_known = F.when(F.col("vc").isNotNull(), F.col("event_id"))
    nb = pts.select(
        "event_id",
        "user_id",
        "was_gap",
        F.last("vc", ignorenulls=True).over(wp).alias("v1"),
        F.last(eid_known, ignorenulls=True).over(wp).alias("e1"),
        F.first("vc", ignorenulls=True).over(wn).alias("v2"),
        F.first(eid_known, ignorenulls=True).over(wn).alias("e2"),
    )
    num_pos = (F.col("v2") - F.col("v1")) * (F.col("event_id") - F.col("e1"))
    interp = F.when(
        F.col("v1").isNotNull() & F.col("v2").isNotNull() & (F.col("e2") > F.col("e1")),
        F.col("v1") * 1000000
        + F.when(
            num_pos >= 0,
            F.expr("((v2 - v1) * (event_id - e1) * 1000000) div (e2 - e1)"),
        ).otherwise(
            -F.expr("((v1 - v2) * (event_id - e1) * 1000000) div (e2 - e1)")
        ),
    )
    return nb.select(
        "event_id",
        "user_id",
        "was_gap",
        F.coalesce(
            interp, F.col("v1") * 1000000, F.col("v2") * 1000000, F.lit(0)
        ).alias("interp_micro"),
    )
