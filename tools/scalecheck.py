"""Scaling-curve harness: measure representative plan shapes at 1x /
4x / 16x the sf0.1 row count and report how close each stays to
linear.

The brief's question is "would this hold at 100x?" — this tool answers
the measurable slice of it on one box: replicate the sf0.1 corpus
in-plan (explode over a k-row sequence, ids offset per replica so key
cardinality grows with data, per-key row counts stay constant — the
realistic growth mode), run one representative query per physical
shape, and print seconds plus the ratio to perfectly-linear scaling
from the 1x point (ratio ~1.0 = linear; <1 = amortized constant
overhead; >1 = super-linear danger).

Usage: python tools/scalecheck.py   (writes SCALE.json next to repo root)
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas  # module-level: pandas_udf type hints must resolve in
# function __globals__ (a locally-imported alias breaks infer_eval_type
# under `from __future__ import annotations` — CLAUDE.md PySpark-4 trap)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ukis_kafka_spark.plans import get_spark  # noqa: E402
from ukis_kafka_spark.sources import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = tuple(int(x) for x in os.environ.get("SCALE_REPS", "1,4,16").split(","))


def _replicate(df, k: int, id_cols: list[str]):
    """k logical copies; each replica offsets its keys so cardinality
    scales with volume (the realistic growth mode for users/orders)."""
    if k == 1:
        return df
    r = df.crossJoin(F.broadcast(
        get_spark("scale").range(k).select(F.col("id").alias("_rep"))
    ))
    for c in id_cols:
        r = r.withColumn(c, F.col(c) + F.col("_rep") * F.lit(100_000_000))
    return r.drop("_rep")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("scale")
    spark.sparkContext.setLogLevel("ERROR")

    li = load_table(spark, SF_DIR, "lineitem")
    ev = load_table(spark, SF_DIR, "events")

    def scan_agg(k: int):
        l = _replicate(li, k, ["l_orderkey"])
        return l.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(28,10)")).alias("q"),
        )

    def window_per_key(k: int):
        from pyspark.sql import Window

        e = _replicate(ev, k, ["user_id", "event_id"])
        w = (
            Window.partitionBy("user_id")
            .orderBy("event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return e.select("user_id", F.sum(F.floor("value")).over(w).alias("r"))

    def shuffle_join(k: int):
        e = _replicate(ev, k, ["user_id", "event_id"])
        per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        return e.join(per_user, "user_id").where(F.col("n") > 0).groupBy(
            "event_type"
        ).agg(F.count(F.lit(1)).alias("m"))

    def exact_dedup(k: int):
        e = _replicate(ev, k, ["event_id"])
        return (
            e.select(F.sha2(F.concat_ws("|", "event_type", "props"), 256).alias("h"))
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > 1)
            .agg(F.count(F.lit(1)).alias("dups"))
        )

    def iterative_graph(k: int):
        """Pregel-as-joins (the m_graph_pagerank JVM shape): carried
        rank table re-joined against a materialized edge list for 3
        rounds, lineage truncated per round. Node count scales with k.
        checkpoint_df is EAGER, so the whole loop runs inside the
        returned thunk — the timed region."""
        from ukis_kafka_spark.registry import checkpoint_df

        def timed():
            e = _replicate(
                li.select("l_orderkey", "l_suppkey").limit(200_000),
                k,
                ["l_orderkey", "l_suppkey"],
            )
            edges = checkpoint_df(
                e.select(F.col("l_orderkey").alias("src"), F.col("l_suppkey").alias("dst"))
            )
            deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
            ranks = deg.select("src", F.lit(1_000_000).alias("r"))
            for _ in range(3):
                contrib = edges.join(ranks, "src").join(deg, "src").select(
                    "dst", F.expr("r div d").alias("c")
                )
                ranks = checkpoint_df(
                    contrib.groupBy("dst")
                    .agg((F.lit(150_000) + F.expr("850 * sum(c) div 1000")).alias("r"))
                    .withColumnRenamed("dst", "src")
                )
            _force(ranks.orderBy(F.col("r").desc()).limit(20))

        return timed

    def banded_dedup(k: int):
        """The m_near_dedup physical shape: 4 band keys per doc
        computed BEFORE the explode, self-join bucket-local on the
        8-byte band key, candidate pairs counted. Doc count scales
        with k; never all-pairs."""
        d = _replicate(
            load_table(spark, SF_DIR, "documents").select("doc_id", "text"),
            k,
            ["doc_id"],
        )
        # mix the replica component into the band key: replicated
        # corpora otherwise produce quadratic artifact pairs (every
        # replica of a doc collides with every other), which is not
        # the growth mode — new data is mostly NEW documents.
        rep_of = F.expr("doc_id div 100000000")
        bands = d.select(
            "doc_id",
            F.posexplode(
                F.array(*[
                    F.xxhash64(F.substring("text", 1 + 40 * i, 40), F.lit(i), rep_of)
                    for i in range(4)
                ])
            ).alias("band_idx", "band_key"),
        )
        a, b = bands.alias("a"), bands.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .agg(F.count(F.lit(1)).alias("cand_pairs"))
        )

    def stateful_stream(k: int):
        """Micro-batch stateful aggregation (the s_* family shape):
        file-source replay of k x 100k events through a watermarked
        1-hour windowed count, 4 state partitions, availableNow drain.
        Input chunks are staged OUTSIDE the timed region."""
        import atexit
        import shutil
        import tempfile

        stage = tempfile.mkdtemp(prefix=f"scalestream_{k}_")
        # staged replicas + checkpoints reach several GB across a full
        # REPS sweep (ADVICE r09) — reclaim them at interpreter exit
        # (not after the drain: the timed thunk re-runs per rep)
        atexit.register(shutil.rmtree, stage, True)
        src_dir = os.path.join(stage, "in")
        (
            _replicate(
                ev.select(F.col("ts").cast("timestamp").alias("ts"), "user_id", "event_type"),
                k,
                ["user_id"],
            )
            .repartition(8)
            .write.mode("overwrite")
            .parquet(src_dir)
        )
        schema = spark.read.parquet(src_dir).schema

        def timed():
            prev = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", "4")
            try:
                stream = (
                    spark.readStream.schema(schema)
                    .parquet(src_dir)
                    .withWatermark("ts", "1 hour")
                    .groupBy(F.window("ts", "1 hour"), "event_type")
                    .agg(F.count(F.lit(1)).alias("n"))
                )
                q = (
                    stream.writeStream.format("noop")
                    .outputMode("update")
                    .option("checkpointLocation", os.path.join(stage, "ck"))
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev)

        return timed

    def stream_join(k: int):
        """Stateful stream-stream join (the s_stream_join family shape
        — VERDICT r8 item 8, the one expensive s_* shape without a
        curve): k x 100k events replayed through a watermarked
        click-purchase inner join with a 1-hour event-time bound,
        4 state partitions, availableNow drain. Both sides' state is
        watermark-bounded, so the cost model is rows x state-commit
        I/O — the curve must stay ~linear. Staging (replication +
        parquet write) is untimed."""
        import atexit
        import shutil
        import tempfile
        import uuid as _uuid

        stage = tempfile.mkdtemp(prefix=f"scalesjoin_{k}_")
        atexit.register(shutil.rmtree, stage, True)  # see stateful_stream
        src_dir = os.path.join(stage, "in")
        (
            _replicate(
                ev.select(
                    F.col("ts").cast("timestamp").alias("ts"),
                    "event_id",
                    "user_id",
                    "event_type",
                ),
                k,
                ["user_id", "event_id"],
            )
            .repartition(8)
            .write.mode("overwrite")
            .parquet(src_dir)
        )
        schema = spark.read.parquet(src_dir).schema

        def timed():
            prev = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", "4")
            try:
                stream = spark.readStream.schema(schema).parquet(src_dir)
                clicks = (
                    stream.where(F.col("event_type") == "click")
                    .select(
                        F.col("event_id").alias("click_id"),
                        "user_id",
                        F.col("ts").alias("click_ts"),
                    )
                    .withWatermark("click_ts", "10 minutes")
                )
                purchases = (
                    stream.where(F.col("event_type") == "purchase")
                    .select(
                        F.col("event_id").alias("purchase_id"),
                        F.col("user_id").alias("p_user_id"),
                        F.col("ts").alias("p_ts"),
                    )
                    .withWatermark("p_ts", "10 minutes")
                )
                joined = clicks.join(
                    purchases,
                    (F.col("user_id") == F.col("p_user_id"))
                    & (F.col("p_ts") >= F.col("click_ts"))
                    & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
                    "inner",
                )
                q = (
                    joined.writeStream.format("noop")
                    .outputMode("append")
                    .option(
                        "checkpointLocation",
                        os.path.join(stage, "ck_" + _uuid.uuid4().hex[:8]),
                    )
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev)

        return timed

    def ranged_rank(k: int):
        """functions.ranks.with_global_order (round-6 primitive): range
        repartition + per-partition windows + broadcast offsets, over a
        corpus-growing per-user aggregate. The distributed replacement
        for every partition-less rank/cumsum — must stay ~linear (one
        ranged shuffle, one pinned materialization, one tiny offset
        broadcast). The helper pins via checkpoint_df (lazy since
        round 7, but the materialization still happens during the
        first downstream job), so the whole build runs inside the
        timed thunk — returning the DataFrame would leave the
        expensive ranged sort in the untimed staging phase."""
        from ukis_kafka_spark.functions.ranks import with_global_order

        def timed():
            e = _replicate(ev, k, ["user_id", "event_id"])
            per_user = e.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.floor("value")).cast("long").alias("mass"),
            )
            _force(
                with_global_order(
                    per_user,
                    [F.col("n").desc(), F.col("user_id").asc()],
                    rank_col="rn",
                    cumsum={"cmass": F.col("mass")},
                )
            )

        return timed

    def ranged_rank_skew(k: int):
        """with_global_order under a HOT ORDER KEY (VERDICT r6 item 6:
        the one distribution that could re-funnel a range partitioner)
        — half of all users share ONE value of the leading order
        column. The primitive REQUIRES a total order, so the unique
        tiebreak (user_id) is part of the range key: repartitionByRange
        partitions on the COMPOSITE (hot, user_id), splitting the hot
        value's ties across partitions by tiebreak. This entry
        MEASURES that the tiebreak genuinely absorbs the skew (curve
        must match the uniform ranged_rank shape, no single-partition
        funnel)."""
        from ukis_kafka_spark.functions.ranks import with_global_order

        def timed():
            e = _replicate(ev, k, ["user_id", "event_id"])
            per_user = e.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.floor("value")).cast("long").alias("mass"),
            )
            # 50% of users collapse onto hot=0; the rest keep n
            skewed = per_user.withColumn(
                "hot",
                F.when(F.col("user_id") % 2 == 0, F.lit(0)).otherwise(F.col("n")),
            )
            _force(
                with_global_order(
                    skewed,
                    [F.col("hot").asc(), F.col("user_id").asc()],
                    rank_col="rn",
                    cumsum={"cmass": F.col("mass")},
                )
            )

        return timed

    def subseq_scan(k: int):
        """q_subseq_search shape: 8-wide per-user sliding windows +
        broadcast pattern + integer distance fold + TakeOrdered top-10.
        One pass over the event stream — must stay ~linear."""
        from pyspark.sql import Window

        e = _replicate(
            ev.select(
                "user_id",
                "event_id",
                F.floor(F.col("value") * 100).cast("long").alias("v"),
            ),
            k,
            ["user_id", "event_id"],
        )
        pat = spark.sql("SELECT array(1L,2L,3L,4L,5L,6L,7L,8L) AS p")
        w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
            Window.currentRow, 7
        )
        wins = (
            e.withColumn("wv", F.collect_list("v").over(w))
            .where(F.size("wv") == 8)
            .crossJoin(F.broadcast(pat))
        )
        scored = wins.select(
            "user_id",
            "event_id",
            F.aggregate(
                F.zip_with("wv", "p", lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda a, t: a + t,
            ).alias("dist"),
        )
        return scored.orderBy("dist", "user_id", "event_id").limit(10)

    def blocked_cosine(k: int):
        """m_cosine_topk's exact GEMM kernel (block-pair applyInPandas,
        in-kernel top-k pruning). Exact all-pairs is inherently
        O(n²) COMPUTE — the expected curve is ~k× linear (quadratic
        total), which is exactly WHY the ANN family (banded/bucketed,
        measured linear above) is the 100 TB path; this entry
        MEASURES that boundary instead of asserting it."""
        from ukis_kafka_spark.ml.similarity import _blocked_cosine_pairs

        emb = _replicate(
            load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding"),
            k,
            ["vec_id"],
        )
        pairs = _blocked_cosine_pairs(emb, block=1024, local_topk=5)
        return pairs.agg(F.count(F.lit(1)).alias("n"))

    def ann_query(k: int):
        """The ANN QUERY path (VERDICT r10 item 4): per-vector nearest
        neighbor via random-hyperplane LSH buckets + per-bucket numpy
        GEMM with IN-KERNEL per-row argmax — the family SURVEY §6.1
        routes 100 TB similarity to, measured instead of asserted.
        Two honesty rules: (1) the bit count grows with log2(k) so
        bucket occupancy stays ~constant (~625) — the real-world scale
        lever (at 100 TB you grow bits/lists with the corpus to bound
        per-bucket GEMMs; a fixed bit count would re-derive
        blocked_cosine's quadratic); (2) replicas are sign-flipped per
        replica id (a signed permutation of a gaussian vector is
        gaussian), so new data is genuinely NEW vectors spread across
        buckets, not same-bucket artifact collisions (banded_dedup's
        rule — an unperturbed copy lands in its original's bucket at
        ANY bit count). Expected curve: ~linear — sig cost/vector
        grows log k, shuffle is tables x corpus, GEMM work/vector is
        occupancy-bounded, output is one row per (vector, table)
        reduced to one per vector. Contrast with blocked_cosine's
        measured 1.31x-super-linear crossover at 128x."""
        import math

        import numpy as _np
        import pandas as _pd
        from pyspark.sql import types as _T
        from pyspark.sql.functions import pandas_udf as _pudf

        from ukis_kafka_spark.ml.similarity import _DIM, _hyperplane_int

        n_tables = 8
        n_bits = 4 + int(round(math.log2(k)))
        planes = _np.array(
            [_hyperplane_int(t, b) for t in range(n_tables) for b in range(n_bits)],
            dtype=_np.int64,
        ).T  # dim x (tables*bits)
        pow2 = 1 << _np.arange(n_bits, dtype=_np.int64)

        @_pudf(_T.ArrayType(_T.LongType()))
        def lsh_buckets(emb: pandas.Series) -> pandas.Series:
            M = _np.floor(
                _np.stack(emb.to_numpy()).astype(_np.float64) * 10000
            ).astype(_np.int64)
            bits = (M @ planes >= 0).astype(_np.int64)
            ids = bits.reshape(len(M), n_tables, n_bits) @ pow2
            return _pd.Series(list(ids))

        def bucket_nn(pdf):
            if len(pdf) < 2:
                return _pd.DataFrame(
                    {"vec_id": _pd.Series(dtype="int64"),
                     "nb_id": _pd.Series(dtype="int64"),
                     "cos_sim": _pd.Series(dtype="float64")}
                )
            M = _np.stack(pdf.embedding.to_numpy()).astype(_np.float64)
            ids = pdf.vec_id.to_numpy()
            nrm = _np.sqrt(_np.einsum("ij,ij->i", M, M))
            cos = (M @ M.T) / _np.outer(nrm, nrm)
            _np.fill_diagonal(cos, -2.0)
            j = cos.argmax(axis=1)
            return _pd.DataFrame(
                {"vec_id": ids, "nb_id": ids[j],
                 "cos_sim": cos[_np.arange(len(ids)), j]}
            )

        e = _replicate(
            load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding"),
            k,
            ["vec_id"],
        )
        # sign-flip perturbation per replica (rep 0 = the real corpus)
        pert = e.select(
            "vec_id",
            F.expr(
                "transform(embedding, (x, i) -> IF("
                "  pmod(xxhash64(vec_id div 100000000, i), 2) = 0 "
                "  OR vec_id div 100000000 = 0, x, -x))"
            ).alias("embedding"),
        )
        buck = pert.select(
            "vec_id",
            "embedding",
            F.posexplode(lsh_buckets(F.col("embedding"))).alias("table_id", "bucket"),
        )
        return (
            buck.groupBy("table_id", "bucket")
            .applyInPandas(bucket_nn, "vec_id long, nb_id long, cos_sim double")
            .groupBy("vec_id")
            .agg(F.max(F.struct("cos_sim", "nb_id")).alias("best"))
            .select("vec_id", "best.cos_sim", "best.nb_id")
        )

    def kmv_theta(k: int):
        """m_theta_intersect / m_kmv_distinct's physical shape
        (VERDICT r09 stretch item 8): per-lang bottom-64 KMV sketch
        build over a growing trigram universe + pairwise theta
        intersection FROM SKETCH STATE ALONE. The property this entry
        documents: the sketch state is k-BOUNDED (64 rows per lang,
        TakeOrderedAndProject = per-partition heads + a
        |partitions|x64 merge), so the end-to-end cost must track the
        SCAN (~linear or better), never the universe pair count — the
        set algebra itself is constant work on 64-row pins at every
        scale. The replica id is mixed into the trigram hash
        (banded_dedup's rule): replicated corpora otherwise keep the
        distinct-set size constant, which would measure the scan but
        not the growing-universe sketch. The whole build (explode,
        distinct, bottom-64 pins, intersections) runs inside the
        timed closure — eager checkpoints OUTSIDE it would silently
        move the scan into untimed staging (caught in this shape's
        first cut: the 128x point read 0.2 s)."""
        from ukis_kafka_spark.registry import checkpoint_df as _ckpt

        def timed():
            d = _replicate(
                load_table(spark, SF_DIR, "documents").select(
                    "doc_id", "lang", "text"
                ),
                k,
                ["doc_id"],
            )
            rep_of = F.expr("doc_id div 100000000")
            # stage the token array as a column FIRST — split()
            # referenced inside the transform lambda re-splits per
            # element (the m_repetition CSE trap, ~10 s of the 1x pt)
            dk = d.select(
                "lang", rep_of.alias("rep"), F.split("text", " ").alias("tk")
            ).select(
                "lang",
                F.explode(
                    F.when(
                        F.size("tk") >= 3,
                        F.expr(
                            "transform(sequence(1, size(tk) - 2),"
                            " i -> array_join(slice(tk, i, 3), ' '))"
                        ),
                    ).otherwise(F.array().cast("array<string>"))
                ).alias("g3"),
                "rep",
            ).select(
                "lang",
                # 60-bit non-negative key, replica-salted so distincts grow
                F.expr("xxhash64(g3, rep) & 1152921504606846975").alias("hv"),
            ).distinct()
            hv = _ckpt(dk)
            sk = {
                l: _ckpt(
                    hv.where(F.col("lang") == l).select("hv").orderBy("hv").limit(64)
                )
                for l in ("en", "fr", "de")
            }
            counts = None
            for f1, f2 in (("en", "fr"), ("en", "de"), ("fr", "de")):
                st = (
                    sk[f1].agg(F.max("hv").alias("k1"))
                    .crossJoin(F.broadcast(sk[f2].agg(F.max("hv").alias("k2"))))
                    .select(F.least("k1", "k2").alias("theta"))
                )
                c = (
                    sk[f1].join(sk[f2], "hv")
                    .crossJoin(F.broadcast(st))
                    .agg(
                        F.count(F.when(F.col("hv") < F.col("theta"), 1)).alias("n")
                    )
                    .select(F.lit(f1 + f2).alias("pair"), "n")
                )
                counts = c if counts is None else counts.unionByName(c)
            _force(counts)

        return timed

    def hash_walks(k: int):
        """m_hash_walks' physical shape (VERDICT r7 item 6): per step,
        frontier ⋈ edge list then per-walker argmin as groupBy
        min(struct) — map-side combined, frontier stays |V|. Expected
        ~linear: each step is one shuffle whose input is |E| matches,
        and edge count scales with k here (keys offset per replica).
        checkpoint_df is EAGER in this harness, so the walk loop runs
        inside the timed thunk like iterative_graph.  Edge sample is
        50k (vs iterative_graph's 200k): the per-step intermediate is
        Σ deg(cur) over walkers, and order→supplier hubs concentrate
        walkers after step 1, so 200k edges at 64x produced ~640M-row
        join intermediates that OOM'd the single-JVM 8g harness heap —
        on a cluster that's a spilled shuffle, here it would measure
        the allocator, not the plan shape."""
        from ukis_kafka_spark.registry import checkpoint_df

        def timed():
            e = _replicate(
                li.select("l_orderkey", "l_suppkey").limit(50_000),
                k,
                ["l_orderkey", "l_suppkey"],
            )
            edges = e.select(
                F.col("l_orderkey").alias("src"), F.col("l_suppkey").alias("dst")
            )
            sym = checkpoint_df(
                edges.unionByName(
                    edges.select(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    )
                )
            )
            walks = (
                sym.select(F.col("src").alias("start"))
                .distinct()
                .withColumn("cur", F.col("start"))
            )
            for step in range(1, 4):
                hv = F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":", F.col("start"), F.lit(step), F.col("dst")
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                walks = (
                    walks.join(sym, walks.cur == sym.src)
                    .select("start", "dst", hv.alias("hv"))
                    .groupBy("start")
                    .agg(F.min(F.struct("hv", "dst")).alias("pick"))
                    .select("start", F.col("pick.dst").alias("cur"))
                )
            _force(walks.groupBy("cur").agg(F.count(F.lit(1)).alias("n")))

        return timed

    def bottom_k(k: int):
        """The TakeOrderedAndProject primitive (round-8 session 2):
        orderBy(col).limit(64) over a growing distinct-hash frame —
        the physical shape under m_kmv_distinct, every top-k audit,
        and the engine-shared ORDER BY..LIMIT argmax idiom. The
        top-k itself is per-partition heads + a |partitions|·64-row
        driver merge (never a global sort); the measured curve is
        ~linear (0.60-0.68x vs linear to 64x) because the upstream
        distinct-hash shuffle dominates — the honest reading is
        'bottom-k adds nothing on top of the scan/distinct', which
        is exactly the 100 TB property the sketch relies on."""

        def timed():
            h = _replicate(
                li.select("l_orderkey", "l_partkey"), k, ["l_orderkey", "l_partkey"]
            )
            hv = F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("l_orderkey"), F.col("l_partkey"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            _force(h.select(hv.alias("hv")).distinct().orderBy("hv").limit(64))

        return timed

    shapes = {
        "scan_agg": scan_agg,
        "window_per_key": window_per_key,
        "shuffle_join": shuffle_join,
        "exact_dedup": exact_dedup,
        "iterative_graph": iterative_graph,
        "banded_dedup": banded_dedup,
        "stateful_stream": stateful_stream,
        "stream_join": stream_join,
        "ranged_rank": ranged_rank,
        "ranged_rank_skew": ranged_rank_skew,
        "subseq_scan": subseq_scan,
        "blocked_cosine": blocked_cosine,
        "ann_query": ann_query,
        "kmv_theta": kmv_theta,
        "hash_walks": hash_walks,
        "bottom_k": bottom_k,
    }

    # warm the JVM + file index once; also pay the one-time streaming
    # engine init outside any timed region (first micro-batch query
    # costs ~1.5 s of class loading that would otherwise land on the
    # stateful_stream 1x point and make the curve look super-sub-linear)
    _force(scan_agg(1))
    stateful_stream(1)()

    only = {s for s in os.environ.get("SCALE_ONLY", "").split(",") if s}
    if only:
        unknown = only - set(shapes)
        if unknown:
            raise SystemExit(f"unknown SCALE_ONLY shapes: {sorted(unknown)}")
        shapes = {n: f for n, f in shapes.items() if n in only}
        # fail BEFORE measuring if the partial run can't merge — the
        # write-time check below would still protect the record, but
        # only after wasting the whole measurement
        path0 = os.path.join(REPO, "SCALE.json")
        if os.path.exists(path0):
            with open(path0) as fh:
                prev0 = json.load(fh)
            if prev0.get("sf_dir") != SF_DIR or prev0.get("reps") != list(REPS):
                raise SystemExit(
                    f"SCALE_ONLY partial run contract mismatch: existing "
                    f"record has sf_dir={prev0.get('sf_dir')} "
                    f"reps={prev0.get('reps')}, this run has "
                    f"sf_dir={SF_DIR} reps={list(REPS)} — set SCALE_REPS/"
                    f"SPARK_GRAFT_SF_DIR to match (or run without "
                    f"SCALE_ONLY to re-measure all)"
                )

    out: dict[str, dict[str, float]] = {}
    for name, fn in shapes.items():
        times = {}
        for k in REPS:
            work = fn(k)  # staging (untimed) happens here
            t0 = time.time()
            if callable(work):
                work()  # streaming shapes time their own drain
            else:
                _force(work)
            times[str(k)] = round(time.time() - t0, 3)
        base = times[str(REPS[0])]
        ratios = {
            str(k): round(times[str(k)] / (base * k), 3) for k in REPS
        }
        out[name] = {"sec": times, "vs_linear": ratios}
        print(name, json.dumps(out[name]))

    path = os.path.join(REPO, "SCALE.json")
    doc = {"sf_dir": SF_DIR, "reps": list(REPS), "shapes": out}
    if only and os.path.exists(path):
        # partial run: merge the re-measured shapes into the record,
        # keeping the other curves (same sf_dir/reps contract)
        with open(path) as fh:
            prev = json.load(fh)
        if prev.get("sf_dir") == SF_DIR and prev.get("reps") == list(REPS):
            merged = dict(prev.get("shapes", {}))
            merged.update(out)
            doc["shapes"] = merged
        else:
            # a partial run that can't merge would silently DROP every
            # other curve (it did once, round 9 — SCALE_REPS defaulted
            # to 1,4,16 against a 1,4,16,64 record). Refuse instead.
            raise SystemExit(
                f"SCALE_ONLY partial run contract mismatch: existing "
                f"record has sf_dir={prev.get('sf_dir')} "
                f"reps={prev.get('reps')}, this run has sf_dir={SF_DIR} "
                f"reps={list(REPS)} — set SCALE_REPS/SPARK_GRAFT_SF_DIR "
                f"to match (or run without SCALE_ONLY to re-measure all)"
            )
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print("wrote SCALE.json")


if __name__ == "__main__":
    main()
