"""Scalar-function family queries (SURVEY.md §2.2 "Scalar functions").

Each query exercises one function family end-to-end over a corpus
table. All expressions are built-in ``pyspark.sql.functions`` — they
stay inside whole-stage codegen; no Python boundary is crossed.

Cross-engine hazards handled here (probe-verified against DuckDB 1.0):
- DuckDB ``dayofweek`` is 0-based Sunday, Spark's is 1-based → +1.
- DuckDB casts double→int by *rounding*, Spark truncates → any such
  cast goes through explicit FLOOR/CEIL on both sides.
- double→VARCHAR formatting differs → never emit it.
- No months_between in DuckDB → interval/datediff arithmetic only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


@query(
    "q_str_basic",
    oracle="""
SELECT p_partkey,
       lower(p_name) AS lname,
       upper(p_brand) AS ubrand,
       substr(p_name, 1, 4) AS name4,
       p_name || '/' || p_brand AS concat_nb,
       trim('  ' || p_name || ' ') AS trimmed,
       lpad(p_brand, 12, '*') AS padded,
       length(p_name) AS name_len
FROM part
""",
)
def q_str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.substring("p_name", 1, 4).alias("name4"),
        F.concat_ws("/", "p_name", "p_brand").alias("concat_nb"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.length("p_name").alias("name_len"),
    )


@query(
    "q_str_regex",
    oracle="""
SELECT p_partkey, p_type,
       regexp_extract(p_type, '^([A-Z]+)', 1) AS first_word,
       regexp_replace(p_type, ' ', '_', 'g') AS underscored,
       regexp_matches(p_type, '^(ECONOMY|PROMO)') AS is_cheap_line
FROM part
WHERE regexp_matches(p_name, '^[a-z]+ [a-z]+$')
""",
)
def q_str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSIX-simple patterns only — the overlap where Java and RE2-ish
    dialects agree. Note Spark regexp_replace is global by default;
    DuckDB needs the 'g' flag."""
    p = load_table(spark, sf_dir, "part")
    return p.where(F.col("p_name").rlike("^[a-z]+ [a-z]+$")).select(
        "p_partkey",
        "p_type",
        F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("first_word"),
        F.regexp_replace("p_type", " ", "_").alias("underscored"),
        F.col("p_type").rlike("^(ECONOMY|PROMO)").alias("is_cheap_line"),
    )


@query(
    "q_str_split",
    oracle="""
SELECT p_partkey,
       string_split(p_name, ' ')[1] AS tok_first,
       string_split(p_name, ' ')[-1] AS tok_last,
       len(string_split(p_name, ' ')) AS n_tokens
FROM part
""",
)
def q_str_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.element_at(toks, 1).alias("tok_first"),
        F.element_at(toks, -1).alias("tok_last"),
        F.size(toks).alias("n_tokens"),
    )


@query(
    "q_date_extract",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS y,
       month(o_orderdate) AS m,
       day(o_orderdate) AS d,
       dayofweek(o_orderdate) + 1 AS dow,
       quarter(o_orderdate) AS q,
       date_trunc('month', o_orderdate) AS month_start
FROM orders
""",
)
def q_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.dayofweek(d).alias("dow"),
        F.quarter(d).alias("q"),
        F.date_trunc("month", d).alias("month_start"),
    )


@query(
    "q_date_arith",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_shipdate + INTERVAL 30 DAY AS ship_plus_30,
       date_diff('day', TIMESTAMP '1995-01-01 00:00:00', l_shipdate) AS days_since_epoch_start,
       CAST(l_shipdate AS DATE) - CAST(TIMESTAMP '1995-01-01 00:00:00' AS DATE) AS day_delta
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1995-03-01 00:00:00'
""",
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    ship = F.col("l_shipdate")
    anchor = F.lit("1995-01-01 00:00:00").cast("timestamp")
    return l.where(ship < F.lit("1995-03-01 00:00:00").cast("timestamp")).select(
        "l_orderkey",
        "l_linenumber",
        (ship + F.expr("INTERVAL 30 DAYS")).alias("ship_plus_30"),
        F.datediff(ship.cast("date"), anchor.cast("date")).alias("days_since_epoch_start"),
        F.datediff(ship.cast("date"), anchor.cast("date")).alias("day_delta"),
    )


@query(
    "q_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_quantity - 25) AS dev_from_25,
       CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
       CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
       sqrt(l_quantity) AS qty_sqrt,
       l_quantity * l_quantity AS qty_sq,
       CAST(l_quantity AS BIGINT) % 7 AS qty_mod7
FROM lineitem
WHERE l_linenumber = 1 AND l_orderkey % 10 = 0
""",
)
def q_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/ceil/floor/sqrt/power/mod. sqrt is IEEE-exact so safe to
    emit; ln/exp are deliberately excluded from the hash-checked set
    (JVM StrictMath vs libm differ in final ULPs) and covered by the
    property tests instead."""
    l = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return l.where((F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 10 == 0)).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(q - 25).alias("dev_from_25"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.floor(F.col("l_tax") * 100).alias("tax_pct_floor"),
        F.sqrt(q).alias("qty_sqrt"),
        (q * q).alias("qty_sq"),
        (q.cast("bigint") % 7).alias("qty_mod7"),
    )


@query(
    "q_cond",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 200000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       coalesce(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_full,
       greatest(o_totalprice, 150000.0) AS at_least_150k,
       least(o_totalprice, 150000.0) AS at_most_150k
FROM orders
""",
)
def q_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(p > 200000, "high").when(p > 100000, "mid").otherwise("low").alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_full"
        ),
        F.greatest(p, F.lit(150000.0)).alias("at_least_150k"),
        F.least(p, F.lit(150000.0)).alias("at_most_150k"),
    )


@query(
    "q_json_extract",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("bigint").alias("k_int"),
    ).where(F.col("k_int") > 50)


@query(
    "q_array_ops",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_elem,
       CAST(embedding[8] AS DOUBLE) AS eighth_elem,
       list_reduce(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)), (a, b) -> a + b) AS head4_sum,
       list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b) AS sq_norm
FROM embeddings
""",
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops incl. higher-order transform/aggregate. Elements are
    float32; they widen exactly to double before any arithmetic, and
    folds are sequential left-folds in both engines → bit-identical."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    as_dbl = F.transform(emb, lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_elem"),
        F.element_at(emb, 8).cast("double").alias("eighth_elem"),
        F.aggregate(
            F.slice(as_dbl, 1, 4), F.lit(0.0), lambda acc, x: acc + x
        ).alias("head4_sum"),
        F.aggregate(
            F.transform(emb, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sq_norm"),
    )


@query(
    "q_map_ops",
    oracle="""
SELECT event_id,
       '{"type":"' || event_type || '","user":"' || CAST(user_id AS VARCHAR) || '"}'
         AS attrs_json,
       event_type AS type_from_map,
       'type,user' AS attr_keys,
       2 AS n_keys
FROM events
""",
)
def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map from key/value arrays, look values up, serialize.

    The map itself is exercised Spark-side (map_from_arrays,
    element_at, map_keys, size) but the *output* columns are scalar
    projections of it — raw MapType/ArrayType columns are not sortable
    by pandas-based harnesses (round-1 driver crash), and to_json gives
    a deterministic encoding both engines can state exactly. Map
    insertion order is preserved by Spark's to_json/map_keys, so the
    oracle can spell the literal JSON."""
    e = load_table(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("user")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")),
    )
    return e.select(
        "event_id",
        F.to_json(m).alias("attrs_json"),
        F.element_at(m, "type").alias("type_from_map"),
        F.array_join(F.map_keys(m), ",").alias("attr_keys"),
        F.size(m).alias("n_keys"),
    )


@query(
    "q_cast",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
       CAST(floor(o_totalprice) AS BIGINT) AS price_floor_int,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
       CAST('42.5' AS DOUBLE) AS lit_dbl,
       CAST(o_orderstatus = 'O' AS INTEGER) AS is_open_int
FROM orders
""",
)
def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast matrix across int/string/date/double/bool. double→int goes
    through explicit floor (DuckDB's direct cast rounds, Spark's
    truncates); double→string is never emitted (formatting differs)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.floor(F.col("o_totalprice")).cast("bigint").alias("price_floor_int"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
        F.lit("42.5").cast("double").alias("lit_dbl"),
        (F.col("o_orderstatus") == "O").cast("int").alias("is_open_int"),
    )


@query(
    "q_array_predicates",
    oracle="""
SELECT vec_id,
       len(list_filter(embedding, x -> x > 0.4)) > 0 AS has_large,
       len(list_filter(embedding, x -> NOT (x > -10))) = 0 AS all_above_neg10,
       len(list_filter(embedding, x -> x < 0)) AS n_negative,
       CAST(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE) AS max_elem,
       list_position(list_transform(embedding, x -> x > 0.4), true) AS first_large_pos
FROM embeddings
""",
)
def q_array_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array predicates: exists / forall / filter-count /
    max / first-match position — all JVM-side lambdas over the
    embedding arrays. float32 comparisons against float literals are
    exact widenings, so verdicts match across engines."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.exists(emb, lambda x: x > 0.4).alias("has_large"),
        F.forall(emb, lambda x: x > -10).alias("all_above_neg10"),
        F.size(F.filter(emb, lambda x: x < 0)).alias("n_negative"),
        F.array_max(F.transform(emb, lambda x: x.cast("double"))).alias("max_elem"),
        F.array_position(
            F.transform(emb, lambda x: x > 0.4), F.lit(True)
        ).alias("first_large_pos"),
    )


@query(
    "q_variant",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       json_extract_string(props, '$.missing') AS missing
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 = 0
""",
)
def q_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type: parse the JSON property bag into a
    variant column once, then extract typed fields with
    try_variant_get — the open-schema path that beats per-field JSON
    string parsing when many fields are read (one parse, binary-encoded
    access). Missing paths yield NULL (try_ semantics), matching the
    oracle's json_extract behavior."""
    e = load_table(spark, sf_dir, "events")
    v = e.select("event_id", F.parse_json(F.col("props")).alias("v"))
    out = v.select(
        "event_id",
        F.try_variant_get("v", "$.k", "bigint").alias("k"),
        F.try_variant_get("v", "$.missing", "string").alias("missing"),
    )
    return out.where(F.col("k") % 3 == 0)


@query(
    "q_month_end_arith",
    oracle="""
SELECT o_orderkey,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
       CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)
            AS VARCHAR) AS plus_one_month,
       CAST(CAST(date_trunc('month', CAST(o_orderdate AS DATE))
            + INTERVAL 2 MONTH - INTERVAL 1 DAY AS DATE) AS VARCHAR)
         AS second_month_end,
       CASE WHEN CAST(o_orderdate AS DATE)
                 = last_day(CAST(o_orderdate AS DATE)) THEN 1 ELSE 0 END
         AS is_month_end
FROM orders
WHERE o_orderkey % 7 = 0
""",
)
def q_month_end_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-boundary date arithmetic — the calendar edge semantics
    (last_day, end-of-month clamping when adding months across
    28/29/30/31-day months, month-end flags) that billing/close
    pipelines depend on and engines historically disagree about; the
    hash check pins that Spark's ``add_months`` clamp and DuckDB's
    ``+ INTERVAL 1 MONTH`` resolve every (day, target-month) pair
    identically, including leap February.  Dates are emitted as ISO
    strings (stable scalar canon).  Pure projection; the panel keeps
    output bounded."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 == 0)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.last_day(d).cast("string").alias("month_end"),
        F.add_months(d, 1).cast("string").alias("plus_one_month"),
        F.date_sub(F.add_months(F.date_trunc("month", d).cast("date"), 2), 1)
        .cast("string")
        .alias("second_month_end"),
        F.when(d == F.last_day(d), 1).otherwise(0).alias("is_month_end"),
    )


@query(
    "q_try_arith",
    oracle="""
SELECT event_id,
       CASE WHEN CAST(floor(value) AS BIGINT) - 50 = 0 THEN NULL
            ELSE value / (CAST(floor(value) AS BIGINT) - 50) END AS safe_ratio,
       CASE WHEN CAST(floor(value) AS BIGINT) - 50 = 0 THEN NULL
            WHEN CAST(floor(value) AS BIGINT) - 50 < 0
              THEN -(CAST(floor(value * 100) AS BIGINT)
                     // (50 - CAST(floor(value) AS BIGINT)))
            ELSE CAST(floor(value * 100) AS BIGINT)
                 // (CAST(floor(value) AS BIGINT) - 50) END AS safe_int_div,
       CASE WHEN CAST(floor(value) AS BIGINT) - 50 = 0 THEN 1 ELSE 0 END
         AS hit_zero
FROM events
WHERE event_type = 'view'
""",
)
def q_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic via ``try_divide``: under this engine's
    ANSI mode a plain division by zero THROWS (by design — silent
    nulls hide data bugs), and try_* is the sanctioned per-expression
    opt-out that yields NULL instead — the working-notes dt=0 guard
    class expressed through the API.  The oracle mirrors with an
    explicit CASE (DuckDB floats double /0 to inf and errors on
    integer /0 — neither matches try semantics, so the guard is
    written out), divisors hit zero for real (value in [50, 51)
    exists at both gate scales), and the integer division factors the
    SIGN out on BOTH sides because Spark div truncates while DuckDB
    // floors on negatives (the m_pca_power trap)."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "view")
    den = (F.floor("value").cast("long") - 50).alias("den")
    return e.select(
        "event_id",
        F.try_divide(F.col("value"), F.floor("value").cast("long") - 50).alias(
            "safe_ratio"
        ),
        F.expr(
            "CASE WHEN CAST(floor(value) AS BIGINT) - 50 = 0 THEN NULL"
            " WHEN CAST(floor(value) AS BIGINT) - 50 < 0"
            "   THEN -(CAST(floor(value * 100) AS BIGINT)"
            "          div (50 - CAST(floor(value) AS BIGINT)))"
            " ELSE CAST(floor(value * 100) AS BIGINT)"
            "      div (CAST(floor(value) AS BIGINT) - 50) END"
        ).alias("safe_int_div"),
        F.when(F.floor("value").cast("long") - 50 == 0, 1)
        .otherwise(0)
        .alias("hit_zero"),
    )
