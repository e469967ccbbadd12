"""Training-data chunking and packing operators over ``documents``
(SURVEY.md §2.3 LLM-pipeline extensions).

Three pre-tokenization shapes every large-scale LLM data pipeline
needs, all pure JVM built-ins (split / sequence / explode / slice /
window) — no Python boundary, fully hash-checkable:

- sliding-window token chunking with overlap (``m_chunk_tokens``),
- greedy sequential concat-and-chunk packing into fixed context
  windows (``m_seq_pack``),
- passage-level exact dedup across the corpus (``m_passage_dedup``).

Scale notes: chunking is embarrassingly parallel (per-row explode, no
shuffle until a consumer aggregates); packing windows are partitioned
by (source, shard) so no single partition ever holds more than a
bounded slice of the corpus — the global-cumsum variant would serialize
100 TB through one task; passage dedup is one hash-shuffle on the
passage digest, the same single-shuffle shape as exact doc dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

# Chunking geometry: 32-token windows advancing 24 tokens → 8-token
# overlap between consecutive chunks (a typical ~25% overlap setting).
CHUNK = 32
STRIDE = 24

# Packing context size (tokens) and shard width (docs per packing
# window). Shards bound window-state size: each packing window sees at
# most SHARD documents regardless of corpus size. Sized to the
# MEASURED corpus (round-6 dead-column audit): docs are 10-100 tokens
# (~55 mean) and each source carries 25 docs/500 at sf0.01, so a
# (source, shard-of-128) cell holds ~6 docs ≈ 350 tokens — CTX=128
# advances the bin counter ~2-3x per cell and SHARD=128 splits even
# the sf0.01 corpus into 4 shards. The original production-flavored
# (2048, 512) left every doc in bin 0 of shard 0 at the gate scales:
# vacuous agreement, the packing logic never demonstrated a cut.
CTX = 128
SHARD = 128

# Passage dedup granularity (tokens). Small corpus vocabulary → 4-token
# passages actually collide at sf0.01 (≈340 duplicated passages), so
# the driver row is non-vacuous.
PASSAGE = 4


@query(
    "m_chunk_tokens",
    oracle=f"""
SELECT doc_id,
       CAST(s AS BIGINT) AS start,
       CAST(len(l[s+1 : s+{CHUNK}]) AS BIGINT) AS chunk_len,
       md5(array_to_string(l[s+1 : s+{CHUNK}], ' ')) AS chunk_hash
FROM (SELECT doc_id, string_split(text, ' ') AS l,
             len(string_split(text, ' ')) AS n
      FROM documents),
     unnest(generate_series(0, n - 1, {STRIDE})) AS t(s)
""",
)
def m_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking: each document becomes
    ceil(n_tokens / STRIDE) chunks of ≤CHUNK tokens with CHUNK-STRIDE
    token overlap. Emits the chunk digest (not the text) so downstream
    dedup/packing joins move 16-byte keys, not repeated text.

    Per-row ``sequence``+``explode`` — no shuffle, whole-stage codegen
    end to end; at 100 TB this is a map-only stage.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    d = d.select(
        "doc_id",
        toks.alias("l"),
        F.explode(F.sequence(F.lit(0), n - 1, F.lit(STRIDE))).alias("s"),
    )
    chunk = F.slice(F.col("l"), F.col("s") + 1, CHUNK)
    return d.select(
        "doc_id",
        F.col("s").cast("long").alias("start"),
        F.size(chunk).cast("long").alias("chunk_len"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


@query(
    "m_seq_pack",
    oracle=f"""
SELECT source, shard, bin,
       count(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM (
  SELECT source, doc_id, doc_id // {SHARD} AS shard, n_tok,
         (CAST(SUM(n_tok) OVER (PARTITION BY source, doc_id // {SHARD}
                                ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
          - n_tok) // {CTX} AS bin
  FROM (SELECT source, doc_id,
               len(string_split(text, ' ')) AS n_tok
        FROM documents)
)
GROUP BY source, shard, bin
""",
)
def m_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential packing (concat-and-chunk): within each
    (source, shard) stream, documents in doc_id order are concatenated
    and cut into CTX-token context windows; a document's bin is its
    starting token offset div CTX.

    The shard key bounds each window partition to SHARD documents, so
    the running-sum window never serializes the corpus through one
    task — the scale-correct form of "pack the dataset in order".
    Integer-only arithmetic → exact hash parity.
    """
    d = load_table(spark, sf_dir, "documents")
    d = d.select(
        "source",
        "doc_id",
        F.expr(f"doc_id div {SHARD}").alias("shard"),
        F.size(F.split(F.col("text"), " ")).alias("n_tok"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("start", F.sum("n_tok").over(w) - F.col("n_tok"))
        .withColumn("bin", F.expr(f"start div {CTX}"))
        .drop("start")
        .groupBy("source", "shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "m_pack_mask_stats",
    oracle=f"""
WITH packed AS (
  SELECT source, doc_id, n_tok,
         (CAST(SUM(n_tok) OVER (PARTITION BY source, doc_id // {SHARD}
                                ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
          - n_tok) AS start,
         doc_id // {SHARD} AS shard
  FROM (SELECT source, doc_id,
               len(string_split(text, ' ')) AS n_tok
        FROM documents)
), segs AS (
  SELECT source, shard, b AS bin,
         least(start + n_tok, (b + 1) * {CTX})
           - greatest(start, b * {CTX}) AS seg,
         n_tok
  FROM packed,
       unnest(generate_series(start // {CTX}, (start + n_tok - 1) // {CTX})) AS t(b)
)
SELECT source, shard, bin,
       count(*) AS n_segments,
       count(CASE WHEN seg < n_tok THEN 1 END) AS n_splits,
       CAST(SUM(seg) AS BIGINT) AS seg_tokens,
       CAST(SUM(seg * seg) AS BIGINT) AS mask_mass,
       (1000000 * CAST(SUM(seg * seg) AS BIGINT))
         // (CAST(SUM(seg) AS BIGINT) * CAST(SUM(seg) AS BIGINT)) AS density_ppm
FROM segs
GROUP BY source, shard, bin
""",
)
def m_pack_mask_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attention-mask efficiency audit for packed context windows —
    the companion measurement to ``m_seq_pack``: when documents are
    greedily concatenated into CTX-token windows and attention is
    masked at document boundaries (the standard "sample packing with
    block-diagonal mask" training setup), each window's usable
    attention fraction is Σ seg_i² / (Σ seg_i)² over the document
    SEGMENTS that land in it. Unlike m_seq_pack (which bins a doc by
    its start offset), this op SPLITS spanning documents across every
    window they touch — n_splits counts the boundary-crossing
    fragments whose attention the mask severs, and density_ppm is the
    block-diagonal mask's fill rate in fixed-point ppm (exact BIGINT
    floor-division — no rounding surface).

    All arithmetic is integer (token offsets on the CTX grid), so the
    hash surface is exact; n_splits fires at every scale (docs are
    10-100 tokens on a 128-token grid, so ~40% of docs cross a
    boundary). Scale: the same (source, shard)-bounded running-sum
    window as m_seq_pack — never a global cumsum — plus a per-row
    sequence/explode over the 1-2 bins a doc touches."""
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.expr(f"doc_id div {SHARD}").alias("shard"),
        F.size(F.split(F.col("text"), " ")).alias("n_tok"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d.withColumn("start", F.sum("n_tok").over(w) - F.col("n_tok"))
    segs = packed.select(
        "source",
        "shard",
        "n_tok",
        "start",
        F.explode(
            F.sequence(
                F.expr(f"start div {CTX}"),
                F.expr(f"(start + n_tok - 1) div {CTX}"),
            )
        ).alias("bin"),
    ).select(
        "source",
        "shard",
        "bin",
        "n_tok",
        (
            F.least(F.col("start") + F.col("n_tok"), (F.col("bin") + 1) * CTX)
            - F.greatest(F.col("start"), F.col("bin") * CTX)
        ).alias("seg"),
    )
    return segs.groupBy("source", "shard", "bin").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.count(F.when(F.col("seg") < F.col("n_tok"), 1)).alias("n_splits"),
        F.sum("seg").cast("bigint").alias("seg_tokens"),
        F.sum(F.col("seg") * F.col("seg")).cast("bigint").alias("mask_mass"),
        F.expr(
            "(1000000 * CAST(SUM(seg * seg) AS BIGINT))"
            " div (CAST(SUM(seg) AS BIGINT) * CAST(SUM(seg) AS BIGINT))"
        ).alias("density_ppm"),
    )


@query(
    "m_passage_dedup",
    oracle=f"""
SELECT h AS passage_hash,
       count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS n_docs,
       min(doc_id) AS first_doc
FROM (
  SELECT doc_id, md5(array_to_string(l[s+1 : s+{PASSAGE}], ' ')) AS h
  FROM (SELECT doc_id, string_split(text, ' ') AS l,
               len(string_split(text, ' ')) AS n
        FROM documents),
       unnest(generate_series(0, n - 1, {PASSAGE})) AS t(s)
)
GROUP BY h
HAVING count(*) > 1
""",
)
def m_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup: split every document into
    non-overlapping PASSAGE-token passages, digest each, and report
    passages occurring more than once corpus-wide (the candidate set a
    passage-level deduplicator would rewrite).

    One explode (map-only) + one hash-shuffle on the 16-byte digest —
    identical scale shape to document-level exact dedup; the HAVING
    filter runs map-side partial then final, so only duplicated
    digests leave the aggregate. Digests are computed INSIDE a
    transform over the offsets before the explode, so exploded rows
    carry a 32-char hash, never the document's token array (the
    array-through-explode variant duplicated the tokens ~15× into the
    shuffle).
    """
    d = load_table(spark, sf_dir, "documents")
    # r11: split staged as a column — the inline split referenced
    # inside the transform lambda re-evaluated once per passage slot
    staged = d.select("doc_id", F.split(F.col("text"), " ").alias("tk"))
    toks = F.col("tk")
    hashes = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 1, F.lit(PASSAGE)),
        lambda s: F.md5(F.array_join(F.slice(toks, s + 1, PASSAGE), " ")),
    )
    return (
        staged.select("doc_id", F.explode(hashes).alias("passage_hash"))
        .groupBy("passage_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .where(F.col("n_occurrences") > 1)
    )


@query(
    "m_boilerplate",
    oracle=f"""
SELECT p AS passage,
       count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS n_docs,
       min(doc_id) AS first_doc
FROM (
  SELECT doc_id, array_to_string(l[s+1 : s+{PASSAGE}], ' ') AS p
  FROM (SELECT doc_id, string_split(text, ' ') AS l,
               len(string_split(text, ' ')) AS n
        FROM documents),
       unnest(generate_series(0, n - 1, {PASSAGE})) AS t(s)
)
GROUP BY p
ORDER BY count(DISTINCT doc_id) DESC, p ASC
LIMIT 10
""",
)
def m_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: the 10 passages shared by the MOST
    documents — headers, footers, license blurbs, navigation chrome —
    which a curation pass strips *by content* rather than by document
    (the complement of m_passage_dedup, which only flags that
    duplication exists). Passages here are short strings (PASSAGE
    tokens), so carrying the literal text through the explode is cheap
    and makes the output directly actionable as a strip-list; the
    top-10 is TakeOrderedAndProject over the map-side-combined
    aggregate — at 100 TB the strip-list builder is one explode + one
    digest-sized shuffle + a bounded top-k, then the list broadcasts
    back to the rewrite pass."""
    d = load_table(spark, sf_dir, "documents")
    # r11: split staged as a column — the inline split referenced
    # inside the transform lambda re-evaluated once per passage slot
    staged = d.select("doc_id", F.split(F.col("text"), " ").alias("tk"))
    toks = F.col("tk")
    passages = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 1, F.lit(PASSAGE)),
        lambda s: F.array_join(F.slice(toks, s + 1, PASSAGE), " "),
    )
    return (
        staged.select("doc_id", F.explode(passages).alias("passage"))
        .groupBy("passage")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy(F.col("n_docs").desc(), F.col("passage").asc())
        .limit(10)
    )


@query(
    "m_span_corruption",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
SELECT doc_id,
       array_to_string(list_filter(
         list_transform(generate_series(1, len(l)), i ->
           CASE WHEN (i - 1) % 7 >= 2 THEN l[i]
                WHEN (i - 1) % 7 = 0 THEN '<X' || CAST((i - 1) // 7 AS VARCHAR) || '>'
                ELSE NULL END),
         x -> x IS NOT NULL), ' ') AS input_text,
       array_to_string(list_filter(
         list_transform(generate_series(1, len(l)), i ->
           CASE WHEN (i - 1) % 7 = 0 THEN '<X' || CAST((i - 1) // 7 AS VARCHAR) || '> ' || l[i]
                WHEN (i - 1) % 7 = 1 AND i <= len(l) THEN l[i]
                ELSE NULL END),
         x -> x IS NOT NULL), ' ') AS target_text,
       CAST(len(list_filter(generate_series(1, len(l)), i -> (i - 1) % 7 < 2)) AS BIGINT) AS n_masked
FROM toks
""",
)
def m_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption: deterministic 2-token spans (every
    7th position, ≈29% corruption rate) are cut out of each document,
    the input keeps one sentinel token per span, and the target lists
    each sentinel followed by the span it replaced — the
    encoder-decoder pretraining pair format, produced at corpus scale.
    Pure higher-order array functions on the token list (transform /
    filter / join — array_join drops NULLs on both engines) with NO
    explode: each row stays one row, so the transform is map-only and
    embarrassingly parallel at 100 TB. Deterministic positions instead
    of RNG keep it engine-reproducible and hash-checked; a production
    pipeline swaps the position rule for a seeded hash of
    (doc_id, pos) with the same dataflow."""
    d = load_table(spark, sf_dir, "documents")
    # r11: stage the split array AND the index sequence as columns —
    # inline expressions referenced inside transform()/filter() lambdas
    # re-evaluate once PER ARRAY ELEMENT (the m_near_dedup measurement:
    # ~10x on the split alone), and three lambdas each touched them.
    staged = d.select(
        "doc_id",
        F.split(F.col("text"), " ").alias("tk"),
    ).select("doc_id", "tk", F.sequence(F.lit(1), F.size("tk")).alias("idx"))
    toks = F.col("tk")
    idx = F.col("idx")
    sentinel = lambda i: F.concat(  # noqa: E731
        F.lit("<X"), (((i - 1) / 7).cast("long")).cast("string"), F.lit(">")
    )
    input_arr = F.transform(
        idx,
        lambda i: F.when((i - 1) % 7 >= 2, F.element_at(toks, i))
        .when((i - 1) % 7 == 0, sentinel(i))
        .otherwise(F.lit(None)),
    )
    target_arr = F.transform(
        idx,
        lambda i: F.when(
            (i - 1) % 7 == 0,
            F.concat(sentinel(i), F.lit(" "), F.element_at(toks, i)),
        )
        .when((i - 1) % 7 == 1, F.element_at(toks, i))
        .otherwise(F.lit(None)),
    )
    return staged.select(
        "doc_id",
        F.array_join(input_arr, " ").alias("input_text"),
        F.array_join(target_arr, " ").alias("target_text"),
        F.size(F.filter(idx, lambda i: (i - 1) % 7 < 2)).cast("bigint").alias("n_masked"),
    )


def _fim_sql(table: str) -> str:
    """Fill-in-the-middle transform, one SQL text for both engines.
    Cut points derive from Lehmer-style modular hashes of doc_id
    (products < 2^42, safe under ANSI); all arithmetic is integer."""
    return f"""
WITH d AS (
  SELECT doc_id, text, n_chars AS n,
         1 + (doc_id * 48271 % 2147483647) % (n_chars - 1) AS cut1
  FROM {table} WHERE n_chars >= 3
),
c AS (
  SELECT doc_id, text, n, cut1,
         cut1 + 1 + (doc_id * 16807 % 2147483647) % (n - cut1) AS cut2
  FROM d
)
SELECT doc_id,
       cut1 AS len_prefix,
       cut2 - cut1 AS len_middle,
       n - cut2 AS len_suffix,
       n,
       md5(substring(text, 1, cut1) || '<SUF>'
           || substring(text, cut2 + 1, n - cut2) || '<MID>'
           || substring(text, cut1 + 1, cut2 - cut1)) AS psm_digest
FROM c
"""


@query("m_fim_transform", oracle=_fim_sql("documents"))
def m_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022 — the data
    prep that gives code models infilling ability): split each
    document at two pseudo-random character cuts into
    prefix/middle/suffix and reassemble in PSM order
    (prefix <SUF> suffix <MID> middle), so the model learns to emit
    the middle conditioned on both sides.  Cut points are Lehmer-hash
    functions of doc_id (deterministic, engine-neutral integer
    arithmetic; cut1 in [1, n-1], cut2 in (cut1, n], middle always
    non-empty) — the oracle recomputes the same cuts and the PSM
    digest, so the reordered string itself is hash-checked, not just
    the lengths (which the output also carries, with n, so length
    conservation lp+lm+ls = n is checkable by eye).  One shared SQL
    text drives both engines; corpus text is ASCII so char indexing ==
    byte indexing in both.  Scale: stateless per-row string surgery,
    map-only, no shuffle at all."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("fim_docs")
    return spark.sql(_fim_sql("fim_docs"))


_SHUFFLE_SHARDS = 16


@query(
    "m_global_shuffle",
    oracle=f"""
WITH h AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents
), r AS (
  SELECT doc_id, hx, row_number() OVER (ORDER BY hx, doc_id) AS rn FROM h
)
SELECT CAST((rn - 1) % {_SHUFFLE_SHARDS} AS BIGINT) AS shard,
       count(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS docid_sum,
       min(hx) AS first_hash,
       CAST(max(rn) AS BIGINT) AS last_pos
FROM r GROUP BY 1
""",
)
def m_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle + reshard — the step every
    training run performs before epoch 0 (sequential corpora carry
    source/time locality that correlates adjacent batches; hash-order
    breaks it reproducibly, no RNG state to ship).  Documents are
    totally ordered by (md5(doc_id), doc_id) — both engines emit
    identical lowercase-hex md5 strings, so the order is
    engine-neutral — the global position comes from the
    RANGE-PARTITIONED rank (functions.ranks.with_global_order: the
    shuffle-order rank over the full corpus is exactly the
    corpus-growing case that must not funnel through one task), and
    shards are assigned round-robin on the position so every shard's
    size is within 1 of the others (the balanced-shard property a
    data loader wants).  The audit row per shard: size, a doc-id
    checksum (catches drops/dupes), the first hash (pins the order
    itself), and the last global position.  Scale: one ranged shuffle
    + one hash aggregate; writing the shards is a partitionBy on the
    shard column downstream."""
    from ..functions.ranks import with_global_order

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("hx")
    )
    r = with_global_order(
        d, [F.col("hx").asc(), F.col("doc_id").asc()], rank_col="rn"
    )
    return r.groupBy(
        ((F.col("rn") - 1) % _SHUFFLE_SHARDS).cast("bigint").alias("shard")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("docid_sum"),
        F.min("hx").alias("first_hash"),
        F.max("rn").cast("bigint").alias("last_pos"),
    )


_BATCH_BUCKET = 16  # token-length bucket width
_BATCH_SIZE = 8     # sequences per batch


@query(
    "m_length_batching",
    oracle=f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
), b AS (
  SELECT doc_id, n_tok, n_tok // {_BATCH_BUCKET} AS bucket,
         row_number() OVER (PARTITION BY n_tok // {_BATCH_BUCKET}
                            ORDER BY n_tok, doc_id) AS rnk
  FROM t
), batches AS (
  SELECT bucket, (rnk - 1) // {_BATCH_SIZE} AS batch_id, n_tok, doc_id
  FROM b
)
SELECT bucket, batch_id,
       count(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS tok_mass,
       CAST(MAX(n_tok) * count(*) AS BIGINT) AS padded_tokens,
       CAST((MAX(n_tok) * count(*) - SUM(n_tok)) * 1000000
            // (MAX(n_tok) * count(*)) AS BIGINT) AS waste_ppm,
       min(doc_id) AS first_doc
FROM batches
GROUP BY bucket, batch_id
""",
)
def m_length_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-grouped batch assembly (dynamic batching): sequences are
    bucketed by token-length band, ordered (n_tok, doc_id) within the
    band, and cut into fixed-size batches — the standard trick that
    cuts padding waste versus random batching (a batch pads every
    member to its max length, so batching near-equal lengths together
    is the win; the emitted ``waste_ppm`` per batch IS the metric).
    All integer arithmetic: token counts, padded mass = max·n, waste
    in exact ppm via integer div.  Scale: the rank is PARTITIONED by
    the length band (bands are ~fixed cardinality, rows within a band
    distribute by the hash shuffle — no global window anywhere), one
    aggregate per batch; at a real corpus the band window distributes
    by (band, shard) exactly like m_seq_pack's packing streams."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.size(F.split("text", " ")).alias("n_tok"))
    b = t.select(
        "doc_id",
        "n_tok",
        F.expr(f"n_tok div {_BATCH_BUCKET}").alias("bucket"),
    )
    batches = b.select(
        "bucket",
        "n_tok",
        "doc_id",
        F.expr(f"(row_number() OVER (PARTITION BY bucket ORDER BY n_tok, doc_id) - 1) div {_BATCH_SIZE}").alias("batch_id"),
    )
    padded = F.max("n_tok") * F.count(F.lit(1))
    return batches.groupBy("bucket", "batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("tok_mass"),
        padded.cast("bigint").alias("padded_tokens"),
        F.expr(
            f"(MAX(n_tok) * count(1) - SUM(n_tok)) * 1000000"
            f" div (MAX(n_tok) * count(1))"
        ).alias("waste_ppm"),
        F.min("doc_id").alias("first_doc"),
    )


_PACING_EPOCHS = 5


@query(
    "m_curriculum_pacing",
    oracle=f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
), r AS (
  SELECT doc_id, n_tok,
         row_number() OVER (ORDER BY n_tok, doc_id) AS rn,
         CAST(SUM(n_tok) OVER (ORDER BY n_tok, doc_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_mass,
         count(*) OVER () AS n
  FROM t
), ep AS (
  SELECT epoch,
         CAST(floor(n * sqrt(CAST(epoch AS DOUBLE) / 5e0)) AS BIGINT) AS n_visible
  FROM (VALUES (1), (2), (3), (4), (5)) e(epoch)
  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n FROM t)
)
SELECT ep.epoch, ep.n_visible,
       r.tok_mass AS visible_tok_mass,
       r.doc_id AS frontier_doc,
       CAST(r.n_tok AS BIGINT) AS frontier_ntok
FROM ep JOIN r ON r.rn = ep.n_visible
""",
)
def m_curriculum_pacing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning pacing schedule (Bengio et al. 2009;
    root pacing function g(e) = sqrt(e/E), the competence-based
    curriculum of Platanios et al. 2019): documents are totally
    ordered easy-to-hard (token count, doc_id tiebreak) and epoch e
    of E=5 trains on the first floor(N·sqrt(e/E)) of them. Emits the
    schedule a data loader executes: per epoch, the visible-prefix
    size, its exact token mass, and the frontier document (the
    hardest example admitted that epoch).

    The corpus-growing easy-to-hard rank/cumsum rides
    functions.ranks.with_global_order (range shuffle + offset
    recombination — NEVER a partition-less window, the round-6 rule);
    the epoch dim is a 5-row spark.sql VALUES literal (not
    createDataFrame — pickled-RDD trap) crossed with one scalar agg.
    Hash surface: sqrt/division/floor on exact integers are all
    correctly-rounded single ops (the Wilson rule — both engines hand
    floor the identical double), everything else is exact BIGINT.
    Scale: one ranged shuffle + a 5-row broadcast probe join."""
    from ..functions.ranks import with_global_order

    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.size(F.split("text", " ")).alias("n_tok"))
    r = with_global_order(
        t,
        [F.col("n_tok").asc(), F.col("doc_id").asc()],
        rank_col="rn",
        cumsum={"tok_mass": F.col("n_tok")},
    )
    n = t.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ep = (
        spark.sql(
            "SELECT epoch FROM VALUES "
            + ", ".join(f"({e})" for e in range(1, _PACING_EPOCHS + 1))
            + " AS e(epoch)"
        )
        .crossJoin(F.broadcast(n))
        .select(
            "epoch",
            F.expr(
                "CAST(floor(n * sqrt(CAST(epoch AS DOUBLE) / 5e0)) AS BIGINT)"
            ).alias("n_visible"),
        )
    )
    return r.join(F.broadcast(ep), r.rn == ep.n_visible).select(
        "epoch",
        "n_visible",
        F.col("tok_mass").cast("bigint").alias("visible_tok_mass"),
        F.col("doc_id").alias("frontier_doc"),
        F.col("n_tok").cast("bigint").alias("frontier_ntok"),
    )


_ACCUM_TOKENS = 512


@query(
    "m_grad_accum_plan",
    oracle=f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
), r AS (
  SELECT doc_id, n_tok,
         CAST(SUM(n_tok) OVER (ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tok
           AS cum_before
  FROM t
)
SELECT cum_before // {_ACCUM_TOKENS} AS step_id,
       count(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS step_tokens,
       (CAST(SUM(n_tok) AS BIGINT) * 1000000) // {_ACCUM_TOKENS} AS fill_ppm,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM r
GROUP BY 1
""",
)
def m_grad_accum_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient-accumulation step plan: documents stream in doc_id
    order and each optimizer step closes once the RUNNING token total
    crosses the next B=512-token boundary (step_id = pre-doc cumulative
    mass div B — a doc spanning a boundary belongs wholly to the step
    it starts in, the greedy data-loader rule). Emits per step the doc
    count, exact token mass, fill ratio in ppm (can exceed 1e6 on
    boundary-spanning docs; the tail step runs short), and the
    first/last doc — what a trainer needs to size accumulation so
    every global batch carries ~B tokens regardless of document
    length skew.

    The corpus-growing global cumsum rides
    functions.ranks.with_global_order (range shuffle + offset
    recombination, never a partition-less window); the per-step
    aggregate is one hash shuffle on the derived step key. Everything
    is exact BIGINT — counts, masses, integer div — no rounding
    surface at all. Scale: one ranged shuffle + one hash aggregate,
    both linear."""
    from ..functions.ranks import with_global_order

    t = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    r = with_global_order(
        t, [F.col("doc_id").asc()], cumsum={"cum": F.col("n_tok")}
    ).select(
        "doc_id",
        "n_tok",
        (F.col("cum").cast("bigint") - F.col("n_tok")).alias("cum_before"),
    )
    return (
        r.groupBy(F.expr(f"cum_before div {_ACCUM_TOKENS}").alias("step_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("step_tokens"),
            F.expr(
                f"(CAST(SUM(n_tok) AS BIGINT) * 1000000) div {_ACCUM_TOKENS}"
            ).alias("fill_ppm"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )
