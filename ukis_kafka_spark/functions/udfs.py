"""UDF / UDAF / UDTF surface (SURVEY.md §2.2 "UDF surface").

These queries deliberately cross the Python boundary — that is what
they test. Everything else in the engine stays JVM-side; the patterns
here are the sanctioned escape hatches, ordered by preference:

1. ``pandas_udf`` (Arrow-batched, vectorized) — the default slow path.
2. ``applyInPandas`` / GROUPED_AGG for custom per-group aggregation.
3. Row-at-a-time ``udf`` — parity demo only; never in a hot path.
4. Python UDTF (Spark 4) — table-valued expansion.

Determinism notes: the grouped UDAF uses ``math.fsum`` over
exactly-representable integer products, so its result is
order-independent and matches the SQL twin bit-for-bit.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udf

from ..functions.hashsafe import DEC
from ..registry import query
from ..sources import load_table


@udf(returnType=T.StringType())
def _price_band_py(price: float) -> str:
    if price is None:
        return None
    if price > 200000:
        return "high"
    if price > 100000:
        return "mid"
    return "low"


@query(
    "u_py_udf",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 200000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS band
FROM orders
""",
)
def u_py_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (parity surface; ~10-100x slower than
    the built-in CASE — kept out of every other query)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", _price_band_py(F.col("o_totalprice")).alias("band"))


@pandas_udf(T.DoubleType())
def _capped_fee_pandas(price: pd.Series) -> pd.Series:
    # vectorized; per-element IEEE ops → engine-deterministic
    return (price * 0.01).clip(upper=500.0)


@query(
    "u_pandas_udf",
    oracle="""
SELECT o_orderkey, least(o_totalprice * 0.01, 500.0) AS fee
FROM orders
""",
)
def u_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched Series→Series pandas UDF, same semantics as the
    SQL LEAST twin."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", _capped_fee_pandas(F.col("o_totalprice")).alias("fee"))


@pandas_udf(T.DoubleType())
def _weighted_avg_qty(qty: pd.Series, weight: pd.Series) -> float:
    # GROUPED_AGG. fsum = exactly-rounded sum → order-independent; the
    # products are integers (exact doubles), so this equals the SQL
    # SUM(x*w)/SUM(w) twin bit-for-bit.
    num = math.fsum((qty * weight).tolist())
    den = math.fsum(weight.tolist())
    return num / den if den else None


@query(
    "u_grouped_udaf",
    oracle="""
SELECT l_returnflag, SUM(l_quantity * l_linenumber) / SUM(l_linenumber) AS w_avg_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def u_grouped_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom weighted-average UDAF via GROUPED_AGG pandas_udf."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        _weighted_avg_qty(F.col("l_quantity"), F.col("l_linenumber").cast("double")).alias(
            "w_avg_qty"
        )
    )


@query(
    "u_udtf",
    oracle="""
SELECT d.doc_id, t.tok, t.pos
FROM documents d,
     (SELECT unnest(string_split(d.text, ' ')) AS tok,
             generate_subscripts(string_split(d.text, ' '), 1) AS pos) t
WHERE d.doc_id < 50
""",
)
def u_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): explode a document into (doc_id, token,
    1-based position) rows. The lateral-join shape is the same the
    posexplode fast path would produce; the UDTF exists to cover the
    table-function surface."""
    from pyspark.sql.functions import udtf

    # r11 (guide §4): Arrow batch transfer for the scalar-argument
    # UDTFs — identical rows, ~3x less boundary cost. The TABLE-input
    # UDTF (u_udtf_table) stays on pickled rows: its per-partition Row
    # stream degenerates badly under Arrow (measured 4.3 -> 17-20 s).
    @udtf(returnType="doc_id bigint, tok string, pos int", useArrow=True)
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield doc_id, tok, i + 1

    spark.udtf.register("tokenize_docs", Tokenize)
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    d.createOrReplaceTempView("docs_udtf")
    return spark.sql(
        "SELECT t.doc_id, t.tok, t.pos FROM docs_udtf d, LATERAL tokenize_docs(d.doc_id, d.text) t"
    )


def _iter_taxed():
    """SCALAR_ITER pandas UDF: the iterator form amortizes expensive
    per-worker init (model load, codec setup) across all Arrow batches
    of a partition — the sanctioned shape for per-partition setup cost.
    Defined in a factory so the (deliberately trivial) 'model' init
    runs once per worker, not per batch. (Iterator must be imported at
    module scope — pandas_udf's hint inspection cannot see function
    locals, the same trap CLAUDE.md notes for a local pd import.)"""

    @pandas_udf(T.DoubleType())
    def taxed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        coeffs = (4.0, 7.0)  # stand-in for a once-per-worker model load
        for price in batches:
            yield price * coeffs[0] + coeffs[1]

    return taxed


@query(
    "u_pandas_iter_udf",
    oracle="""
SELECT o_orderkey, o_totalprice * 4.0 + 7.0 AS scored
FROM orders
""",
)
def u_pandas_iter_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form (SCALAR_ITER) pandas UDF over orders — same Arrow
    batching as the series form, plus once-per-worker init. The scoring
    polynomial is exact double arithmetic (no rounding rules needed)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", _iter_taxed()(F.col("o_totalprice")).alias("scored"))


@query(
    "u_mapinarrow",
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(CAST(SUM(CAST(round(value * 1.5 + 10.0, 6) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS adj_sum
FROM events
GROUP BY event_type
""",
)
def u_mapinarrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (Spark 4): the lowest-overhead Python boundary —
    RecordBatches in, RecordBatches out, no pandas materialization.
    Completes the UDF surface next to row-UDF / pandas_udf /
    iterator-pandas / grouped-agg / UDTF. The batch kernel applies a
    vectorized per-row adjustment (pyarrow.compute — per-element IEEE
    ops, engine-deterministic, 6 dp-rounded before the decimal sum per
    the transcendental rule); the aggregate stays JVM-side."""
    import pyarrow as pa
    import pyarrow.compute as pc

    e = load_table(spark, sf_dir, "events").select("event_type", "value")

    def adjust(batches):
        for batch in batches:
            adj = pc.round(
                pc.add(pc.multiply(batch.column(1), pa.scalar(1.5)), pa.scalar(10.0)),
                ndigits=6,
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), adj], ["event_type", "adj"]
            )

    out = e.mapInArrow(adjust, "event_type string, adj double")
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("adj").cast(DEC)).cast("double").alias("adj_sum"),
    )


@udf(returnType=T.StringType(), useArrow=True)
def _priority_bucket_arrow(prio: str) -> str:
    # same row-at-a-time author experience; Arrow moves the batches
    if prio is None:
        return None
    return "rush" if int(prio.split("-")[0]) <= 2 else "routine"


@query(
    "u_arrow_py_udf",
    oracle="""
SELECT o_orderkey,
       CASE WHEN CAST(string_split(o_orderpriority, '-')[1] AS BIGINT) <= 2
            THEN 'rush' ELSE 'routine' END AS prio_band
FROM orders
""",
)
def u_arrow_py_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (``useArrow=True``): the author
    still writes a scalar function, but batches cross the boundary as
    Arrow record batches instead of pickled rows — the Spark 3.5+
    migration path that recovers most of the pandas-UDF win without
    rewriting call sites (measured ~2-5× over pickled row transfer;
    still JVM-external, so the relational core keeps avoiding it).
    Completes the UDF parity matrix: row-Python (u_py_udf), Arrow-row
    (this), pandas Series (u_pandas_udf), iterator (u_pandas_iter_udf),
    Arrow-batch map (u_mapinarrow), grouped agg, and UDTF."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", _priority_bucket_arrow(F.col("o_orderpriority")).alias("prio_band")
    )


@query(
    "u_udtf_table",
    oracle="""
WITH runs AS (
  SELECT user_id, event_type, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id)
         - row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS grp
  FROM events
)
SELECT user_id, event_type AS run_type, count(*) AS run_len, min(event_id) AS run_start
FROM runs
GROUP BY user_id, event_type, grp
HAVING count(*) >= 2
""",
)
def u_udtf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a TABLE argument (Spark 4's
    table-valued-function input surface): the UDTF receives each
    user's rows as a PARTITION BY ... ORDER BY stream and emits that
    user's same-type runs of length ≥ 2 — imperative per-group
    sequential logic (terminate() flushes the open run) that would
    need the gaps-and-islands double-window trick in pure SQL, which
    is exactly what the oracle uses, proving the two formulations
    equivalent. The partitioned-table input keeps the dataflow
    shuffle-on-user_id + per-group Python — the sanctioned custom
    stateful batch shape when logic outgrows window functions."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, run_type string, run_len bigint, run_start bigint")
    class Runs:
        def __init__(self):
            self._user = None
            self._type = None
            self._len = 0
            self._start = None

        def _flush(self):
            if self._type is not None and self._len >= 2:
                yield self._user, self._type, self._len, self._start

        def eval(self, row):
            # positional access (user_id, event_id, event_type — the
            # projection below): Row.__getitem__ by index skips the
            # per-row field-name lookup of attribute access
            uid, eid, etype = row[0], row[1], row[2]
            if etype == self._type and uid == self._user:
                self._len += 1
                return
            yield from self._flush()
            self._user, self._type = uid, etype
            self._len, self._start = 1, eid

        def terminate(self):
            yield from self._flush()

    spark.udtf.register("user_runs", Runs)
    load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type"
    ).createOrReplaceTempView("events_udtf")
    return spark.sql(
        """
        SELECT user_id, run_type, run_len, run_start
        FROM user_runs(TABLE(events_udtf) PARTITION BY user_id ORDER BY event_id)
        """
    )


@query(
    "u_sql_udf",
    oracle="""
SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 150000 THEN 'mid'
            ELSE 'high' END AS band,
       count(*) AS n,
       min(o_orderkey) AS min_key
FROM orders
GROUP BY 1
""",
)
def u_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar UDF (Spark 4 ``CREATE TEMPORARY FUNCTION …
    RETURNS … RETURN expr``): the banding logic lives as a named,
    reusable SQL function rather than Python — so unlike every u_py/
    u_pandas entry it stays fully inside Catalyst (inlined into the
    plan, codegen'd, pushdown-eligible).  The oracle inlines the same
    expression; matching results prove the function registry adds
    nothing to the semantics.  This is the UDF form to prefer at
    100 TB whenever the logic is expressible in SQL."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE) RETURNS STRING "
        "RETURN CASE WHEN p < 50000 THEN 'low' "
        "WHEN p < 150000 THEN 'mid' ELSE 'high' END"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sqludf")
    return spark.sql(
        """
        SELECT price_band(o_totalprice) AS band,
               count(*) AS n,
               min(o_orderkey) AS min_key
        FROM orders_sqludf
        GROUP BY 1
        """
    )


@query(
    "u_sql_params",
    oracle="""
SELECT o_orderpriority, count(*) AS n
FROM orders
WHERE o_totalprice >= 100000 AND o_orderstatus = 'F'
GROUP BY o_orderpriority
""",
)
def u_sql_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named-parameter binding): the query
    text carries ``:min_price`` / ``:status`` placeholders and values
    bind server-side through ``spark.sql(..., args=...)`` — the
    injection-safe templating surface an application layer uses
    instead of string interpolation.  Binding happens before analysis,
    so constant folding / pushdown see real literals (same plan as the
    inlined oracle)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_params")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders_params
        WHERE o_totalprice >= :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"min_price": 100000, "status": "F"},
    )


@query(
    "u_grouped_map",
    oracle="""
WITH g AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS vc FROM events
), st AS (
  SELECT event_type, count(*) AS n, CAST(SUM(vc) AS BIGINT) AS s
  FROM g GROUP BY event_type
)
SELECT g.event_type,
       min(st.n) AS n,
       CAST(SUM(abs(g.vc * st.n - st.s)) AS BIGINT) AS abs_dev_scaled
FROM g JOIN st USING (event_type)
GROUP BY g.event_type
""",
)
def u_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-MAP ``applyInPandas`` — the escape hatch missing from
    the original u_* quartet (pandas_udf is per-batch, GROUPED_AGG is
    one-scalar-per-group; grouped map hands the ENTIRE group to
    Python and may return any number of rows — the API behind custom
    per-group normalization, resampling, model-per-key fitting).
    The kernel standardizes each group in exact integer arithmetic —
    per-row deviation ``vc*n - s`` (= n·var-scaled z numerator, the
    q_parallel_variance trick) summed as |·| into one audit row per
    group — so the numpy path is order-independent and bit-matches
    the SQL twin.  Scale: one shuffle on the grouping key; each
    group's rows must fit one worker's memory — the documented
    grouped-map constraint (keys here are 5 event types; skewed key
    domains belong in mapInPandas or window form instead)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("vc")
    )

    def standardize_audit(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype="object"),
                    "n": pd.Series([], dtype="int64"),
                    "abs_dev_scaled": pd.Series([], dtype="int64"),
                }
            )
        vc = pdf["vc"].to_numpy()
        n = len(vc)
        s = int(vc.sum())
        dev = vc.astype(object) * n - s  # object ints: no silent overflow
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [n],
                "abs_dev_scaled": [int(sum(abs(d) for d in dev))],
            }
        )

    return e.groupBy("event_type").applyInPandas(
        standardize_audit, "event_type string, n bigint, abs_dev_scaled bigint"
    )


@query(
    "u_pandas_window_agg",
    oracle="""
WITH c AS (
  SELECT user_id, event_id,
         CAST(floor(value * 100) AS BIGINT) AS vc
  FROM events
  WHERE user_id % 4 = 0
)
SELECT user_id, event_id,
       CAST(SUM(vc) OVER (PARTITION BY user_id ORDER BY event_id
            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail_sum
FROM c
""",
)
def u_pandas_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDAF applied OVER A WINDOW FRAME — the fourth
    invocation mode of the vectorized-UDF surface (scalar batch:
    u_pandas_udf; grouped agg: u_grouped_udaf; grouped map:
    u_grouped_map; this: bounded-frame window aggregation, where
    Spark hands the UDF each row's trailing frame as an Arrow
    series).  The kernel sums exact centi-unit integers so the
    result bit-matches the built-in window twin in the oracle.
    Scale: same single user-partitioned shuffle as any window; the
    Python boundary costs one Arrow transfer PER FRAME — by far the
    most expensive vectorized-UDF mode, which is why production code
    uses built-in sums and reserves this mode for aggregations SQL
    lacks (custom decay kernels, order statistics over frames), and
    why this contract demo runs on a deterministic quarter of the
    users (the mode is what's under test, not the volume; unfiltered
    it is the suite's only per-frame transfer and costs ~4 s of pure
    boundary overhead at sf0.1)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").where(
        F.col("user_id") % 4 == 0
    ).select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("vc"),
    )

    @pandas_udf("long")
    def frame_sum(v: pd.Series) -> int:
        return int(v.sum())

    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-4, 0)
    )
    return e.select(
        "user_id", "event_id", frame_sum("vc").over(w).alias("trail_sum")
    )


@query(
    "u_sql_table_udf",
    oracle="""
WITH ext AS (
  SELECT event_type,
         CAST(floor(min(value) / 50) * 50 AS BIGINT) AS lo,
         CAST(floor(max(value) / 50) * 50 AS BIGINT) AS hi
  FROM events GROUP BY event_type
), spine AS (
  SELECT e.event_type, s.band
  FROM ext e, LATERAL (SELECT unnest(generate_series(e.lo, e.hi, 50)) AS band) s
), counts AS (
  SELECT event_type, CAST(floor(value / 50) * 50 AS BIGINT) AS band,
         count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT sp.event_type, sp.band,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM spine sp
LEFT JOIN counts c ON c.event_type = sp.event_type AND c.band = sp.band
""",
)
def u_sql_table_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined TABLE function (Spark 4 ``CREATE FUNCTION ...
    RETURNS TABLE``) invoked through a correlated LATERAL join: each
    event type's value extent expands into its dense 50-unit band
    spine via the TVF, and a left join zero-fills empty bands — the
    declarative gap-filling idiom (q_date_spine's sequence-explode,
    but packaged as a REUSABLE catalog object callers invoke by
    name, the governance difference).  Completes the UDF matrix:
    scalar SQL UDF (u_sql_udf), Python UDTF (u_udtf), TABLE-argument
    UDTF (u_udtf_table), and now the pure-SQL table function — fully
    JVM-side, Catalyst inlines it like a parameterized view."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("ev_tvf")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION band_spine(lo BIGINT, hi BIGINT)"
        " RETURNS TABLE(band BIGINT)"
        " RETURN SELECT explode(sequence(lo, hi, 50)) AS band"
    )
    return spark.sql(
        """
        WITH ext AS (
          SELECT event_type,
                 CAST(floor(min(value) / 50) * 50 AS BIGINT) AS lo,
                 CAST(floor(max(value) / 50) * 50 AS BIGINT) AS hi
          FROM ev_tvf GROUP BY event_type
        ), spine AS (
          SELECT e.event_type, s.band
          FROM ext e, LATERAL band_spine(e.lo, e.hi) s
        ), counts AS (
          SELECT event_type, CAST(floor(value / 50) * 50 AS BIGINT) AS band,
                 count(*) AS n
          FROM ev_tvf GROUP BY event_type, CAST(floor(value / 50) * 50 AS BIGINT)
        )
        SELECT sp.event_type, sp.band,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n
        FROM spine sp
        LEFT JOIN counts c ON c.event_type = sp.event_type AND c.band = sp.band
        """
    )


@query(
    "u_udtf_polymorphic",
    oracle="""
SELECT doc_id,
       l[1] AS p1, l[2] AS p2, l[3] AS p3, l[4] AS p4,
       CAST(len(l) AS BIGINT) AS n_tokens
FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
WHERE doc_id < 60
""",
)
def u_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()``): the output
    schema is computed at PLAN TIME from a literal argument — here
    ``head_cols(doc_id, text, 4)`` derives columns p1..p4 (+ the token
    count) from the constant 4, the API that makes one UDTF serve any
    width without string-built DDL.  [u_udtf] covers the static-schema
    path; this covers schema-from-arguments, which Catalyst resolves
    during analysis so downstream pruning/codegen see ordinary
    columns.  Out-of-range positions yield NULL, exactly like the
    oracle's list indexing.  Scale: embarrassingly parallel
    one-in-N-out Arrow-batched lateral, no shuffle."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf(useArrow=True)
    class HeadCols:
        @staticmethod
        def analyze(
            doc_id: AnalyzeArgument, text: AnalyzeArgument, n: AnalyzeArgument
        ) -> AnalyzeResult:
            k = int(n.value)
            fields = [T.StructField("doc_id", T.LongType())] + [
                T.StructField(f"p{i + 1}", T.StringType()) for i in range(k)
            ]
            fields.append(T.StructField("n_tokens", T.LongType()))
            return AnalyzeResult(T.StructType(fields))

        def eval(self, doc_id, text, n):
            toks = text.split(" ") if text is not None else []
            yield tuple(
                [doc_id]
                + [(toks[i] if i < len(toks) else None) for i in range(n)]
                + [len(toks)]
            )

    spark.udtf.register("head_cols", HeadCols)
    load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 60
    ).createOrReplaceTempView("docs_poly")
    return spark.sql(
        "SELECT s.* FROM docs_poly d, LATERAL head_cols(d.doc_id, d.text, 4) s"
    )


@query(
    "u_apply_in_arrow",
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v_centi,
       min(event_id) AS min_id,
       max(event_id) AS max_id
FROM events
GROUP BY event_type
""",
)
def u_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map **applyInArrow** (Spark 4): the zero-pandas grouped
    kernel — each group arrives as ONE pyarrow.Table and the kernel
    runs entirely in pyarrow.compute (no pandas materialization, no
    index machinery — the cheapest Python boundary Spark offers for
    grouped logic).  [u_grouped_map] covers the pandas flavor; this is
    the Arrow-native one.  The kernel is integer-exact per the repo's
    rules: centi-unit value mass via floor(value*100) (one IEEE
    product) summed as int64, plus count and id extrema.  Scale: one
    hash shuffle on the group key, then embarrassingly parallel
    per-group Arrow batches."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(t: pa.Table) -> pa.Table:
        centi = pc.cast(pc.floor(pc.multiply(t.column("value"), 100.0)), pa.int64())
        return pa.table(
            {
                "event_type": [t.column("event_type")[0].as_py()],
                "n": [t.num_rows],
                "v_centi": [pc.sum(centi).as_py()],
                "min_id": [pc.min(t.column("event_id")).as_py()],
                "max_id": [pc.max(t.column("event_id")).as_py()],
            }
        )

    e = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    return e.groupBy("event_type").applyInArrow(
        stats, schema="event_type string, n long, v_centi long, min_id long, max_id long"
    )


@query(
    "u_cogrouped_map",
    oracle="""
WITH a AS (
  SELECT event_type, count(*) AS n_a,
         CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS mass_a
  FROM events WHERE event_id % 2 = 0 GROUP BY event_type
), b AS (
  SELECT event_type, count(*) AS n_b,
         CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS mass_b
  FROM events WHERE event_id % 2 = 1 GROUP BY event_type
)
SELECT COALESCE(a.event_type, b.event_type) AS event_type,
       COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
       COALESCE(mass_a, 0) AS mass_a, COALESCE(mass_b, 0) AS mass_b,
       CAST(abs(COALESCE(mass_a, 0) * COALESCE(n_b, 0)
              - COALESCE(mass_b, 0) * COALESCE(n_a, 0)) AS BIGINT) AS drift_scaled
FROM a FULL OUTER JOIN b ON a.event_type = b.event_type
""",
)
def u_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COGROUPED-map ``applyInPandas`` — the last pandas-UDF API
    surface the u_* family was missing: ``groupBy(k).cogroup(
    other.groupBy(k))`` hands BOTH datasets' rows for a key to one
    Python kernel (the primitive behind custom as-of merges,
    train-vs-serve feature reconciliation, model-per-key fit+score).
    Here the two halves of the event stream (event_id parity — a
    stand-in for yesterday's batch vs today's) are reconciled per
    event type: counts, exact centi-unit mass, and the cross-frame
    drift |mass_a·n_b − mass_b·n_a| (the mean-difference numerator
    cross-multiplied to stay in exact integers — n·mass products are
    ≤2^53·100 headroom at 100×, within int64 for this corpus family;
    numpy sums go through object ints so an overflow would raise, not
    wrap). The oracle is the equivalent FULL OUTER JOIN of two
    filtered aggregates. Scale: one co-partitioned shuffle on the key
    (Spark aligns both sides), 5 bounded groups; per-key rows must
    fit one worker — the documented cogroup constraint (skewed or
    unbounded key domains belong in a join, not a cogroup kernel)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.floor(F.col("value") * 100).cast("long").alias("vc")
    )
    a = e.where(F.col("event_id") % 2 == 0).select("event_type", "vc")
    b = e.where(F.col("event_id") % 2 == 1).select("event_type", "vc")

    def reconcile(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        key = (left if len(left) else right)["event_type"].iloc[0]
        na, nb = len(left), len(right)
        ma = int(left["vc"].astype(object).sum()) if na else 0
        mb = int(right["vc"].astype(object).sum()) if nb else 0
        return pd.DataFrame(
            {
                "event_type": [key],
                "n_a": [na],
                "n_b": [nb],
                "mass_a": [ma],
                "mass_b": [mb],
                "drift_scaled": [abs(ma * nb - mb * na)],
            }
        )

    return (
        a.groupBy("event_type")
        .cogroup(b.groupBy("event_type"))
        .applyInPandas(
            reconcile,
            "event_type string, n_a bigint, n_b bigint,"
            " mass_a bigint, mass_b bigint, drift_scaled bigint",
        )
    )
