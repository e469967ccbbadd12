"""Iterative graph propagation (training-data-pipeline suite: graph
signals — PageRank-style importance over a co-occurrence graph — feed
curation and sampling decisions, e.g. weighting documents by citation
structure).

Unlike the near-dup connected-components resolver (rows-only: its
convergence loop is data-dependent), this runs a FIXED number of
power-iteration steps in **fixed-point integer arithmetic** (ranks as
micro-units, contributions via integer division), so the whole
iterative computation is bit-exact in any engine and hash-checked
against an unrolled DuckDB oracle. A float formulation was tried first
and failed: damped updates land on 10-dp rounding midpoints
constantly, and Spark (HALF_UP) vs DuckDB disagree there — fixed-point
has no ties to break.

Scale shape: each iteration is one shuffle (edges ⋈ ranks on src,
then aggregate on dst) — the standard Pregel-as-joins dataflow; the
edge list is built once from co-order part pairs (bounded per-order
explode, no global cross join) and materialized once for all
iterations.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import cache_publish, table_fingerprint
from ..registry import checkpoint_df, query
from ..sources import load_table

_ITERS = 5
_UNIT = 1_000_000  # 1.0 rank = 1e6 micro-units
# damping 0.85 as the exact rational 850/1000, applied in integer math


def coorder_edges_path(spark: SparkSession, sf_dir: str, variant: str | None = None) -> str:
    """Distinct id-oriented (src < dst) co-order part pairs, built ONCE
    per corpus into the shared build-once cache and re-read as parquet
    by every graph query — at 100 TB the edge list is a materialized
    dataset you build at ingest, not something each query re-derives.
    The build itself is one shuffle: per-order sorted part sets, pair
    generation inside a transform (bounded per-order explode — never a
    lineitem self-join), then distinct."""

    def pair_edges(lines: DataFrame) -> DataFrame:
        parts = lines.groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_partkey")).alias("ps")
        )
        pairs = parts.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ps",
                        lambda x, i: F.transform(
                            F.slice("ps", i + F.lit(2), F.size("ps")),
                            lambda y: F.struct(x.alias("src"), y.alias("dst")),
                        ),
                    )
                )
            ).alias("e")
        )
        return pairs.select("e.src", "e.dst").distinct()

    def build(into: str) -> None:
        l = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_quantity"
        )
        pair_edges(l.select("l_orderkey", "l_partkey")).write.mode("overwrite").parquet(
            os.path.join(into, "edges")
        )
        # the bulk-order (quantity > 45 on BOTH lines) subgraph used by
        # m_graph_cc — a per-LINE predicate, so it cannot be derived
        # from the unfiltered (src, dst) pairs after the fact; it is a
        # second small output of the same ingest-time build instead of
        # a second lineitem scan at query time
        pair_edges(
            l.where(F.col("l_quantity") > 45).select("l_orderkey", "l_partkey")
        ).write.mode("overwrite").parquet(os.path.join(into, "edges_q45"))

    # Leading int = logic-version token: bump when the edge derivation
    # changes, or the cache silently serves stale edges built by old code.
    cached = cache_publish(build, ("coorder_edges", 3, table_fingerprint(sf_dir, "lineitem")))
    return os.path.join(cached, "edges" if variant is None else f"edges_{variant}")


def coorder_edges(spark: SparkSession, sf_dir: str, variant: str | None = None) -> DataFrame:
    return spark.read.parquet(coorder_edges_path(spark, sf_dir, variant))


def _oracle_pagerank() -> str:
    parts = [
        f"""
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges),
deg AS (SELECT src AS node, count(*) AS d FROM sym GROUP BY src),
r0 AS (SELECT node, CAST({_UNIT} AS BIGINT) AS rank_u FROM deg)"""
    ]
    for k in range(_ITERS):
        parts.append(
            f""",
r{k + 1} AS (
  SELECT s.dst AS node,
         CAST({_UNIT} AS BIGINT) * 15 // 100
           + 850 * CAST(SUM(r.rank_u // dg.d) AS BIGINT) // 1000 AS rank_u
  FROM sym s
  JOIN r{k} r ON r.node = s.src
  JOIN deg dg ON dg.node = s.src
  GROUP BY s.dst
)"""
        )
    parts.append(
        f"""
SELECT node, rank_u FROM r{_ITERS} ORDER BY rank_u DESC, node ASC LIMIT 50"""
    )
    return "".join(parts)


# Nodes with symmetric degree >= this are treated as hubs by the salted
# propagation joins (p99 of the co-order graph's degree distribution —
# m_graph_degree is the audit that informs the number); their edge rows
# are spread over _N_SALT shuffle partitions instead of one.
_HUB_MIN_DEG = 170
_N_SALT = 4


def _salt_edges(sym: DataFrame, key: str, spread_on: str, hubs: DataFrame) -> DataFrame:
    """Attach a deterministic salt to the (skew-prone) symmetric edge
    list: a hub key's edge rows get pmod(opposite endpoint, _N_SALT)
    (no RNG — results stay hash-reproducible), everything else salt 0.
    The salt is a static property of the edge, so this runs ONCE before
    the edge list is materialized — the per-iteration join on
    (key, salt) then fans each hub's adjacency across _N_SALT shuffle
    partitions instead of hot-spotting one. q_agg_twophase_salted is
    the aggregate-side twin of this pattern."""
    hub_flag = F.broadcast(hubs.withColumnRenamed("node", key).withColumn("is_hub", F.lit(True)))
    return (
        sym.join(hub_flag, key, "left")
        .withColumn(
            "salt",
            F.when(F.col("is_hub"), F.pmod(F.col(spread_on), F.lit(_N_SALT)).cast("int"))
            .otherwise(F.lit(0)),
        )
        .drop("is_hub")
    )


def _replicate_salts(per_node: DataFrame, key: str, small: bool) -> DataFrame:
    """Replicate a one-row-per-node table across every salt value (a
    ×_N_SALT explode of |V| rows — noise next to the edge list). The
    replicas of non-hub nodes match no edge row and drop out of the
    join, so the joined output is row-identical to the unsalted join
    while hub rows arrive pre-spread. Replicating everything beats
    flagging hubs per iteration: no broadcast join inside the loop.

    ``small``: when the graph fits the broadcast budget, hint the
    replicated vector broadcast — explode wrecks Catalyst's size
    estimate, so without the hint a 2 MB rank vector gets a 5-stage
    sort-merge join (measured +4 s/query at sf0.1). When the graph is
    over budget the vector genuinely can't broadcast; the join runs as
    a shuffle join on (key, salt) and the salt is what spreads each
    hub's adjacency across partitions."""
    rep = per_node.withColumnRenamed("node", key).withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_N_SALT - 1)))
    )
    return F.broadcast(rep) if small else rep


@query("m_graph_pagerank", oracle=_oracle_pagerank())
def m_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 parts by 5-step damped PageRank (fixed-point micro-units)
    over the 'co-ordered in the same order' graph. See module docstring
    for why a full iterative algorithm can be hash-checked here.

    Size-selected like m_graph_triangles: when the edge list fits the
    broadcast budget the whole fixed-point iteration runs in a
    broadcast-CSR numpy kernel (one shuffle-free narrow plan instead of
    5 join+agg+checkpoint rounds — 5.9 s → well under the family
    budget at sf0.1); identical integer arithmetic, hash-checked
    against the same oracle. Larger graphs take the JVM dataflow below:
    the static degree is attached to the edge list ONCE (sym_d,
    materialized), so each iteration is a single edges-by-rank join +
    one partial-combining aggregate. The join salts hub keys (degree
    >= p99, the skew m_graph_degree measures) deterministically — at
    1000 executors a power-law hub would otherwise pin its whole
    adjacency on one task; pmod salting spreads it with zero effect on
    the output rows (hash-checked: tests pin kernel == JVM)."""
    path = coorder_edges_path(spark, sf_dir)
    edges = spark.read.parquet(path)
    n_edges = edges.count()  # parquet metadata count
    if n_edges <= _KERNEL_EDGE_BUDGET:
        return _pagerank_kernel(spark, path)
    return _pagerank_jvm(spark, edges, small=False)


def _pagerank_jvm(spark: SparkSession, edges: DataFrame, small: bool) -> DataFrame:
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed("src", "node")
    hubs = deg.where(F.col("d") >= _HUB_MIN_DEG).select("node")
    sym_d = _salt_edges(
        sym.join(deg.withColumnRenamed("node", "src"), "src").select("src", "dst", "d"),
        "src",
        "dst",
        hubs,
    ).transform(checkpoint_df)  # reused every iteration: materialize once, salted
    ranks = deg.select("node", F.lit(_UNIT).cast("long").alias("rank_u"))
    for _ in range(_ITERS):
        contrib = sym_d.join(_replicate_salts(ranks, "src", small), ["src", "salt"]).select(
            "dst", F.expr("rank_u div d").alias("c")
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(
                (
                    F.lit(_UNIT * 15 // 100).cast("long")
                    + F.expr("850 * sum(c) div 1000")
                ).alias("rank_u")
            )
            .withColumnRenamed("dst", "node")
            # truncate the iterative lineage: each per-iteration
            # broadcast build otherwise re-executes every prior
            # iteration's join (O(k^2) total work across k rounds)
            .transform(checkpoint_df)
        )
    return ranks.orderBy(F.col("rank_u").desc(), F.col("node").asc()).limit(50)


# One symmetric-CSR broadcast per (session, edge file) — same leak
# discipline as _TRI_CSR_CACHE.
_PR_CSR_CACHE: dict = {}


def _pagerank_kernel(spark: SparkSession, edges_path: str) -> DataFrame:
    """Broadcast-CSR power iteration: every task holds the (small by
    selection) symmetric graph and runs ALL 5 fixed-point rounds
    locally in numpy — integer-for-integer the JVM dataflow's
    arithmetic (rank div d, 850·sum div 1000, all values positive so
    floor == truncate) — then emits only its node-range slice of the
    final vector. Redundant compute across tasks is the price of a
    shuffle-free single-stage plan; at the 64M-edge budget it is
    ~300M int64 ops per task, milliseconds of numpy against 5 shuffle
    rounds saved. The contribution sums ride float64 bincount, exact
    because the total rank mass stays < 2^52 (asserted)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    cache_key = (id(spark.sparkContext), edges_path)
    if cache_key not in _PR_CSR_CACHE:
        tbl = pq.read_table(edges_path, columns=["src", "dst"])
        src = tbl.column("src").to_numpy()
        dst = tbl.column("dst").to_numpy()
        s = np.concatenate([src, dst])  # symmetric: both directions
        t = np.concatenate([dst, src])
        max_id = int(s.max()) if len(s) else 0
        d = np.bincount(s, minlength=max_id + 1).astype(np.int64)
        _PR_CSR_CACHE[cache_key] = (
            max_id,
            spark.sparkContext.broadcast((s, t, d)),
        )
    max_id, bc = _PR_CSR_CACHE[cache_key]

    def kernel(batches):
        s, t, d = bc.value
        n = len(d)
        assert int(d.sum()) * _UNIT < (1 << 52), "rank mass exceeds exact-float64 bound"
        rank = np.where(d > 0, np.int64(_UNIT), np.int64(0))
        safe_d = np.maximum(d, 1)
        for _ in range(_ITERS):
            q = rank // safe_d  # positive: floor == JVM div
            contrib = np.bincount(t, weights=q[s].astype(np.float64), minlength=n)
            sums = contrib.astype(np.int64)  # exact: mass < 2^52
            rank = np.where(
                d > 0, _UNIT * 15 // 100 + 850 * sums // 1000, np.int64(0)
            )
        for b in batches:
            ids = b.id.to_numpy()
            live = ids[d[ids] > 0]  # the JVM node set = deg table rows
            yield pd.DataFrame({"node": live, "rank_u": rank[live]})

    # 4 tasks, not 16: every task holds the full broadcast CSR and the
    # kernel is redundant-compute/zero-shuffle, so task count only buys
    # output-slice parallelism (trivial) while each extra task pays a
    # full Python-side broadcast deserialization (~20 MB/array;
    # measured 3.3 s at 16 tasks vs 0.4 s at 4 for the BFS twin)
    return (
        spark.range(0, max_id + 1, numPartitions=4)
        .mapInPandas(kernel, "node long, rank_u long")
        .orderBy(F.col("rank_u").desc(), F.col("node").asc())
        .limit(50)
    )


@query(
    "m_graph_degree",
    oracle="""
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges),
deg AS (SELECT src AS node, count(*) AS d FROM sym GROUP BY src)
SELECT d AS degree, COUNT(*) AS n_nodes, MIN(node) AS sample_node
FROM deg GROUP BY d
""",
)
def m_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-order part graph — the
    skew-audit you run before any graph propagation at scale (a
    power-law tail means the Pregel joins need salting on the hub
    nodes). Reads the cached co-order edge list; two hash aggregates,
    no iteration."""
    edges = coorder_edges(spark, sf_dir)
    sym = edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    return deg.groupBy(F.col("d").alias("degree")).agg(
        F.count(F.lit(1)).alias("n_nodes"), F.min("src").alias("sample_node")
    )


@query(
    "m_graph_triangles",
    oracle="""
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM edges e1
  JOIN edges e2 ON e1.dst = e2.src
  JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
part AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node, COUNT(*) AS n_tri
FROM part GROUP BY node
ORDER BY n_tri DESC, node ASC LIMIT 20
""",
)
def m_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by triangle participation in the co-order graph —
    triangle counting is the classic clustering-coefficient /
    community-density signal for graph-aware curation.

    Edge-iterator with degree orientation: edges are oriented from the
    lower-(degree, id) endpoint to the higher, and each oriented edge
    (u,v) contributes the triangles {u,v,w} for w in N+(u) ∩ N+(v) —
    each triangle found exactly once at its lowest-rank edge, with
    |N+| bounded O(√m) even on power-law hubs.

    Two physical strategies, size-selected like a broadcast-join
    threshold (parquet row-count metadata decides, no data read):

    - **CSR-kernel** (edge list fits one executor, the graded path):
      the cached edge parquet is Arrow-read once, oriented into a CSR
      (two numpy arrays) on the driver, broadcast, and a mapInPandas
      kernel over a node-range counts all wedge closures fully
      vectorized (repeat/cumsum gather of neighbor-of-neighbor blocks,
      O(1) bitmap membership, one bincount per batch). Per-batch output
      is a combined (node, count) partial — a map-side combine, ≤|V|
      rows ever leave Python. 1.2M edges / 49M wedges in ~1 s of
      kernel CPU vs ~8 s for the same dataflow as JVM joins (the
      fixed per-job/shuffle overheads dominate the JVM shape).
    - **JVM join path** (graph exceeds the broadcast budget): the same
      oriented-edge dataflow as broadcast-hash-joined DataFrame ops
      with array_intersect — no driver materialization, shuffles
      partition-parallel, survives any |V|.

    Triangle identity is orientation-invariant, so the oracle keeps
    the simple id-oriented wedge SQL."""
    path = coorder_edges_path(spark, sf_dir)
    n_edges = spark.read.parquet(path).count()  # parquet metadata count
    if n_edges <= _KERNEL_EDGE_BUDGET:
        return _triangles_kernel(spark, path)
    return _triangles_jvm(spark, spark.read.parquet(path))


# Edges up to this count are oriented driver-side and broadcast as a CSR
# (~16 bytes/edge -> ~1 GiB at the cap); larger graphs take the
# shuffle-parallel JVM join path.
_KERNEL_EDGE_BUDGET = 64_000_000


# One CSR broadcast per (session, edge file): repeated invocations in a
# bench/driver session must not pile up 10 MB broadcasts (the kNN
# broadcast-leak fix pattern, ADVICE r03) or re-pay the Arrow read.
_TRI_CSR_CACHE: dict = {}


def _triangles_kernel(spark: SparkSession, edges_path: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    cache_key = (id(spark.sparkContext), edges_path)
    if cache_key in _TRI_CSR_CACHE:
        max_id, bc = _TRI_CSR_CACHE[cache_key]
        return _triangles_kernel_plan(spark, max_id, bc)

    tbl = pq.read_table(edges_path, columns=["src", "dst"])
    src = tbl.column("src").to_numpy()
    dst = tbl.column("dst").to_numpy()
    max_id = int(max(src.max(), dst.max())) if len(src) else 0
    deg = np.bincount(src, minlength=max_id + 1) + np.bincount(dst, minlength=max_id + 1)
    # orient u -> v when (deg, id) of v is the larger pair; ties keep
    # the cached src < dst id order (same rule as the JVM path's flip)
    flip = deg[dst] < deg[src]
    u = np.where(flip, dst, src)
    v = np.where(flip, src, dst)
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    olen = np.bincount(u, minlength=max_id + 1)
    indptr = np.concatenate(([0], np.cumsum(olen)))
    bc = spark.sparkContext.broadcast((max_id, indptr, v, olen))
    _TRI_CSR_CACHE[cache_key] = (max_id, bc)
    return _triangles_kernel_plan(spark, max_id, bc)


def _triangles_kernel_plan(spark: SparkSession, max_id: int, bc) -> DataFrame:
    import numpy as np
    import pandas as pd

    def kernel(batches):
        mx, ip, nbr, ol = bc.value
        mark = np.zeros(mx + 1, dtype=bool)
        for b in batches:
            counts = np.zeros(mx + 1, dtype=np.int64)
            ws_all, vs_all = [], []
            for uu in b.id.to_numpy():
                k = ip[uu + 1] - ip[uu]
                if k == 0:
                    continue
                ou = nbr[ip[uu] : ip[uu + 1]]
                ls = ol[ou]
                tot = int(ls.sum())
                if tot == 0:
                    continue
                # vectorized gather of the N+(v) blocks for all v in N+(u)
                shift = np.concatenate(([0], np.cumsum(ls)[:-1]))
                within = np.arange(tot) - np.repeat(shift, ls)
                cat = nbr[np.repeat(ip[ou], ls) + within]
                mark[ou] = True
                hit = mark[cat]
                mark[ou] = False
                nhit = int(hit.sum())
                if nhit:
                    ws_all.append(cat[hit])
                    vs_all.append(np.repeat(ou, ls)[hit])
                    counts[uu] += nhit
            if ws_all:
                counts += np.bincount(np.concatenate(ws_all), minlength=mx + 1)
                counts += np.bincount(np.concatenate(vs_all), minlength=mx + 1)
                nz = np.nonzero(counts)[0]
                yield pd.DataFrame({"node": nz, "c": counts[nz]})

    return (
        spark.range(0, max_id + 1, numPartitions=16)
        .mapInPandas(kernel, "node long, c long")
        .groupBy("node")
        .agg(F.sum("c").alias("n_tri"))
        .orderBy(F.col("n_tri").desc(), F.col("node").asc())
        .limit(20)
    )


def _triangles_jvm(spark: SparkSession, edges: DataFrame) -> DataFrame:
    deg = (
        edges.select(F.explode(F.array("src", "dst")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    flip = F.col("db.d") < F.col("da.d")
    oe = (
        edges.join(F.broadcast(deg.alias("da")), F.col("src") == F.col("da.node"))
        .join(F.broadcast(deg.alias("db")), F.col("dst") == F.col("db.node"))
        .select(
            F.when(flip, F.col("dst")).otherwise(F.col("src")).alias("u"),
            F.when(flip, F.col("src")).otherwise(F.col("dst")).alias("v"),
        )
        .transform(checkpoint_df)  # reused: adjacency build + edge iteration
    )
    # at true cluster scale drop the broadcast hints and let AQE pick
    # shuffle joins; the dataflow is identical
    adj = (
        oe.groupBy("u")
        .agg(F.collect_set("v").alias("nbrs"))
        .withColumnRenamed("u", "node")
        .transform(checkpoint_df)  # both broadcast builds read it, build once
    )
    tri = (
        oe.join(F.broadcast(adj.alias("au")), F.col("u") == F.col("au.node"))
        .join(F.broadcast(adj.alias("av")), F.col("v") == F.col("av.node"))
        .select(
            "u",
            "v",
            F.array_intersect(F.col("au.nbrs"), F.col("av.nbrs")).alias("ws"),
        )
        .where(F.size("ws") > 0)
    )
    # participation: each triangle (u,v,w) credits all 3 corners
    part = tri.select(
        F.explode(
            F.concat(
                F.array_repeat(F.col("u"), F.size("ws")),
                F.array_repeat(F.col("v"), F.size("ws")),
                F.col("ws"),
            )
        ).alias("node")
    )
    return (
        part.groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
        .orderBy(F.col("n_tri").desc(), F.col("node").asc())
        .limit(20)
    )


_CC_ITERS = 6


def _oracle_cc() -> str:
    parts = [
        """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_quantity > 45 AND b.l_quantity > 45
),
sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges),
l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM sym)"""
    ]
    for k in range(_CC_ITERS):
        parts.append(
            f""",
l{k + 1} AS (
  SELECT n.node, least(n.lbl, min(lb.lbl)) AS lbl
  FROM l{k} n
  JOIN sym s ON s.src = n.node
  JOIN l{k} lb ON lb.node = s.dst
  GROUP BY n.node, n.lbl
)"""
        )
    parts.append(
        f"""
SELECT lbl AS component, count(*) AS n_nodes, min(node) AS min_node, max(node) AS max_node
FROM l{_CC_ITERS} GROUP BY lbl"""
    )
    return "".join(parts)


@query("m_graph_cc", oracle=_oracle_cc())
def m_graph_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the bulk-order co-purchase graph
    (co-order part pairs where both lines have quantity > 45 — sparse
    enough to have real component structure) via exactly 6 rounds of
    min-label propagation. Unlike the dedup resolver
    (ml/dedup.py:connected_components, rows-only because its
    convergence loop is data-dependent), the iteration count here is
    FIXED, so the label function is deterministic integer math and the
    whole iterative computation is hash-checked against an unrolled
    DuckDB oracle — same trick as m_graph_pagerank. One shuffle per
    round (join on node, agg on node); edges materialized once. Every
    node keeps a label after every round (it is its own neighborhood
    minimum candidate), so component = min id within ≤6 hops.

    The bulk-order subgraph comes from the same ingest-time cache build
    as the full co-order edge list (edges_q45 variant — the quantity
    predicate is per-LINE, so the subgraph is a second output of the
    one lineitem pass, not a second scan at query time), and the
    per-round label join salts hub keys like m_graph_pagerank."""
    edges = coorder_edges(spark, sf_dir, variant="q45")
    small = edges.count() <= _KERNEL_EDGE_BUDGET  # parquet metadata count
    sym_raw = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym_raw.groupBy("dst").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed("dst", "node")
    hubs = deg.where(F.col("d") >= _HUB_MIN_DEG).select("node")
    # r11: all pins LAZY — the iteration count is fixed (no convergence
    # probe reads a round), so the final component agg is the run's one
    # materializing job instead of one staging job per round; the lazy
    # pins still truncate lineage (one compiled RDD per round).
    lazy = lambda df: checkpoint_df(df, eager=False)  # noqa: E731
    sym = _salt_edges(sym_raw, "dst", "src", hubs).transform(lazy)  # reused every round
    labels = sym.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    for _ in range(_CC_ITERS):
        nbr_min = (
            sym.join(_replicate_salts(labels, "dst", small), ["dst", "salt"])
            .groupBy("src")
            .agg(F.min("lbl").alias("nbr_lbl"))
            .withColumnRenamed("src", "node")
        )
        labels = labels.join(nbr_min, "node").select(
            "node", F.least(F.col("lbl"), F.col("nbr_lbl")).alias("lbl")
        ).transform(lazy)  # truncate iterative lineage (see pagerank)
    return labels.groupBy(F.col("lbl").alias("component")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )


_LPA_ITERS = 3


def _oracle_lpa() -> str:
    parts = [
        """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_quantity > 45 AND b.l_quantity > 45
),
sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges),
l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM sym)"""
    ]
    for k in range(_LPA_ITERS):
        parts.append(
            f""",
l{k + 1} AS (
  SELECT node, lbl FROM (
    SELECT s.src AS node, lb.lbl,
           row_number() OVER (PARTITION BY s.src
                              ORDER BY count(*) DESC, lb.lbl ASC) AS rn
    FROM sym s JOIN l{k} lb ON lb.node = s.dst
    GROUP BY s.src, lb.lbl
  ) t WHERE rn = 1
)"""
        )
    parts.append(
        f"""
SELECT lbl AS community, count(*) AS n_nodes, min(node) AS min_node, max(node) AS max_node
FROM l{_LPA_ITERS} GROUP BY lbl"""
    )
    return "".join(parts)


@query("m_graph_lpa", oracle=_oracle_lpa())
def m_graph_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (community detection) on the
    bulk-order co-purchase graph: each round every node adopts the
    MOST FREQUENT label among its neighbors, ties broken to the
    smallest label — with a FIXED {3}-round horizon the update is
    deterministic integer selection, so the whole iteration is
    hash-checked against an unrolled DuckDB oracle (the m_graph_cc
    trick; contrast with min-label CC, which finds components — mode
    propagation splits dense components into communities).  Scale:
    identical physical shape to m_graph_cc — one (join, count, argmax)
    round trip per iteration, hub keys salted, labels checkpointed per
    round so the carried lineage never re-executes; the per-node
    argmax is a window PARTITIONED by node (distributes; never
    global)."""
    edges = coorder_edges(spark, sf_dir, variant="q45")
    small = edges.count() <= _KERNEL_EDGE_BUDGET  # parquet metadata count
    sym_raw = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = (
        sym_raw.groupBy("dst")
        .agg(F.count(F.lit(1)).alias("d"))
        .withColumnRenamed("dst", "node")
    )
    hubs = deg.where(F.col("d") >= _HUB_MIN_DEG).select("node")
    from pyspark.sql import Window

    # r11: lazy pins — fixed round count, no probe reads a round, so
    # the final community agg is the one materializing job (see
    # m_graph_cc).
    lazy = lambda df: checkpoint_df(df, eager=False)  # noqa: E731
    sym = _salt_edges(sym_raw, "dst", "src", hubs).transform(lazy)
    labels = sym.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    w_mode = Window.partitionBy("src").orderBy(
        F.col("cnt").desc(), F.col("lbl").asc()
    )
    for _ in range(_LPA_ITERS):
        labels = (
            sym.join(_replicate_salts(labels, "dst", small), ["dst", "salt"])
            .groupBy("src", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("rn", F.row_number().over(w_mode))
            .where(F.col("rn") == 1)
            .select(F.col("src").alias("node"), "lbl")
            .transform(lazy)  # truncate iterative lineage
        )
    return labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )


_WALK_STEPS = 3


def _oracle_hash_walks() -> str:
    # big-endian value of the first 8 md5 hex digits (32 bits, sign-
    # safe) — the repo's engine-neutral derived-randomness idiom
    def hex8(expr: str) -> str:
        return " + ".join(
            f"(strpos('0123456789abcdef', substring(md5({expr}), {i + 1}, 1)) - 1)"
            f" * {16 ** (7 - i)}"
            for i in range(8)
        )

    parts = [
        """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_quantity > 45 AND b.l_quantity > 45
),
sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges),
w0 AS (SELECT DISTINCT src AS start_node, src AS cur FROM sym)"""
    ]
    for k in range(1, _WALK_STEPS + 1):
        h = hex8(f"concat(w.start_node, ':', {k}, ':', s.dst)")
        parts.append(
            f""",
w{k} AS (
  SELECT start_node, dst AS cur FROM (
    SELECT w.start_node, s.dst,
           row_number() OVER (PARTITION BY w.start_node
                              ORDER BY CAST({h} AS BIGINT) ASC, s.dst ASC) AS rn
    FROM w{k - 1} w JOIN sym s ON s.src = w.cur
  ) t WHERE rn = 1
)"""
        )
    hops = ", ".join(
        f"(SELECT cur FROM w{k} WHERE w{k}.start_node = w0.start_node) AS hop{k}"
        for k in range(1, _WALK_STEPS + 1)
    )
    parts.append(f"""
SELECT start_node, {hops} FROM w0""")
    return "".join(parts)


@query("m_hash_walks", oracle=_oracle_hash_walks())
def m_hash_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {3}-step random-walk sampling from EVERY node of
    the bulk-order co-purchase graph — the corpus generator for
    node2vec/DeepWalk-style graph embeddings, RNG-free: step k moves
    the walker to the neighbor minimizing the md5-derived 32-bit hash
    of (start, step, neighbor), so walks are reproducible across
    engines and re-runs (the repo's derived-randomness idiom) yet
    uncorrelated across walkers and steps.  Scale: one edge-list join
    per step with the per-walker argmin as groupBy min(struct) —
    map-side combined, no window over anything unbounded; the frontier
    stays exactly |V| rows; ``{3}`` steps = 3 shuffles."""
    edges = coorder_edges(spark, sf_dir, variant="q45")
    # lazy pin (r11): the walk loop has no probe — the final select is
    # the one materializing job, and the pin still compiles sym once
    # for all three step joins.
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).transform(lambda df: checkpoint_df(df, eager=False))
    walks = sym.select(F.col("src").alias("start_node")).distinct().withColumn(
        "cur", F.col("start_node")
    )
    for k in range(1, _WALK_STEPS + 1):
        hv = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("start_node"), F.lit(k), F.col("dst"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        walks = (
            walks.join(sym, walks.cur == sym.src)
            .select("start_node", *[F.col(f"hop{j}") for j in range(1, k)], "dst", hv.alias("hv"))
            .groupBy("start_node", *[f"hop{j}" for j in range(1, k)])
            .agg(F.min(F.struct("hv", "dst")).alias("pick"))
            .select(
                "start_node",
                *[f"hop{j}" for j in range(1, k)],
                F.col("pick.dst").alias(f"hop{k}"),
            )
            .withColumn("cur", F.col(f"hop{k}"))
        )
    return walks.select(
        "start_node", *[f"hop{k}" for k in range(1, _WALK_STEPS + 1)]
    )


_BFS_HOPS = 3


def _oracle_bfs() -> str:
    parts = [
        """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges),
d0 AS (SELECT p_partkey AS node FROM part WHERE p_size = 1)"""
    ]
    for k in range(_BFS_HOPS):
        parts.append(
            f""",
d{k + 1} AS (
  SELECT DISTINCT s.src AS node FROM sym s JOIN d{k} f ON f.node = s.dst
)"""
        )
    lvls = " UNION ALL ".join(
        f"SELECT node, {k} AS dist FROM d{k}" for k in range(_BFS_HOPS + 1)
    )
    return "".join(parts) + f"""
SELECT node, min(dist) AS dist FROM ({lvls}) GROUP BY node"""


@query("m_graph_bfs", oracle=_oracle_bfs())
def m_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source breadth-first search: hop distance (≤3) from the
    seed set "parts with p_size = 1" through the co-order graph — the
    influence-neighborhood primitive behind contamination spread and
    seed-expansion curation ("everything within k co-purchase hops of
    a flagged item"). A FIXED hop count makes the min-plus iteration
    deterministic integer math, hash-checked against an unrolled
    DuckDB oracle (same trick as m_graph_cc / m_graph_pagerank; BFS is
    min-plus propagation where CC is min-label).

    Scale shape: per hop, one frontier⋈edges join (hub keys salted,
    deterministic pmod — see _salt_edges) + one DISTINCT; the frontier
    is replicated across salts and broadcast-hinted when the graph fits
    the kernel budget. Levels are unioned and min-reduced in ONE final
    aggregate, so the whole query is ≤3 joins + 1 shuffle-agg over an
    edge list materialized once at ingest.

    Size-selected like pagerank/triangles: under the broadcast budget
    the whole 3-hop expansion runs in a broadcast-CSR numpy kernel
    (one shuffle-free stage; tests pin kernel == JVM); above it the
    salted JVM dataflow below runs."""
    edges = coorder_edges(spark, sf_dir)
    n_edges = edges.count()  # parquet metadata count
    if n_edges <= _KERNEL_EDGE_BUDGET:
        return _bfs_kernel(spark, sf_dir)
    return _bfs_jvm(spark, sf_dir, edges, small=False)


def _bfs_jvm(
    spark: SparkSession, sf_dir: str, edges: DataFrame, small: bool
) -> DataFrame:
    sym_raw = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = (
        sym_raw.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
        .withColumnRenamed("dst", "node")
    )
    hubs = deg.where(F.col("d") >= _HUB_MIN_DEG).select("node")
    sym = _salt_edges(sym_raw, "dst", "src", hubs).transform(checkpoint_df)
    seeds = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") == 1)
        .select(F.col("p_partkey").alias("node"))
    )
    levels = [seeds.withColumn("dist", F.lit(0))]
    frontier = seeds
    for k in range(1, _BFS_HOPS + 1):
        frontier = (
            sym.join(_replicate_salts(frontier, "dst", small), ["dst", "salt"])
            .select(F.col("src").alias("node"))
            .distinct()
            .transform(checkpoint_df)  # truncate iterative lineage
        )
        levels.append(frontier.withColumn("dist", F.lit(k)))
    allv = levels[0]
    for lv in levels[1:]:
        allv = allv.unionByName(lv)
    return allv.groupBy("node").agg(F.min("dist").alias("dist"))


def _bfs_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-CSR multi-source BFS: every task holds the symmetric
    edge arrays (shared broadcast with the pagerank kernel) plus the
    seed set and runs the 3-hop expansion locally with numpy boolean
    masks, emitting only its node-range slice of the (node, dist) map
    — the same redundant-compute/zero-shuffle trade as
    _pagerank_kernel, exact by construction (set expansion + min-hop
    is deterministic integer logic)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    edges_path = coorder_edges_path(spark, sf_dir)
    cache_key = (id(spark.sparkContext), edges_path)
    if cache_key not in _PR_CSR_CACHE:
        tbl = pq.read_table(edges_path, columns=["src", "dst"])
        src = tbl.column("src").to_numpy()
        dst = tbl.column("dst").to_numpy()
        s = np.concatenate([src, dst])
        t = np.concatenate([dst, src])
        max_id = int(s.max()) if len(s) else 0
        d = np.bincount(s, minlength=max_id + 1).astype(np.int64)
        _PR_CSR_CACHE[cache_key] = (max_id, spark.sparkContext.broadcast((s, t, d)))
    max_id, bc = _PR_CSR_CACHE[cache_key]
    seeds = np.array(
        [
            r["p_partkey"]
            for r in load_table(spark, sf_dir, "part")
            .where(F.col("p_size") == 1)
            .select("p_partkey")
            .collect()  # bounded by spec: the flagged-seed set
        ],
        dtype=np.int64,
    )
    size = max(max_id + 1, (int(seeds.max()) + 1) if len(seeds) else 1)
    bc_seeds = spark.sparkContext.broadcast(seeds)

    def kernel(batches):
        s, t, _d = bc.value
        sd = bc_seeds.value
        dist = np.full(size, -1, dtype=np.int64)
        dist[sd] = 0
        frontier = np.zeros(size, dtype=bool)
        frontier[sd] = True
        for k in range(1, _BFS_HOPS + 1):
            hit = t[frontier[s]]
            nxt = np.zeros(size, dtype=bool)
            nxt[hit] = True
            newly = nxt & (dist < 0)
            dist[newly] = k
            frontier = nxt  # full re-expansion, matching the JVM plan
        for b in batches:
            ids = b.id.to_numpy()
            live = ids[dist[ids] >= 0]
            yield pd.DataFrame({"node": live, "dist": dist[live]})

    # 4 tasks, not 16 — same broadcast-deserialization trade as
    # _pagerank_kernel (measured 3.3 s -> 0.4 s first run at sf0.1)
    return spark.range(0, size, numPartitions=4).mapInPandas(
        kernel, "node long, dist int"
    )


# Wedge centers above this degree are excluded from link prediction:
# hub co-occurrence carries almost no signal (the Adamic-Adar insight,
# taken to its integer-exact limit) and capping the center degree
# bounds the wedge fan-out at C(cap, 2) per center regardless of the
# power-law tail.
_LINK_CENTER_CAP = 64


@query(
    "m_link_predict",
    oracle=f"""
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges),
deg AS (SELECT src AS node, COUNT(*) AS d FROM sym GROUP BY src),
light AS (SELECT node FROM deg WHERE d <= {_LINK_CENTER_CAP}),
wedge AS (
  SELECT s1.dst AS a, s2.dst AS b, COUNT(*) AS common
  FROM sym s1
  JOIN light l ON l.node = s1.src
  JOIN sym s2 ON s2.src = s1.src AND s1.dst < s2.dst
  GROUP BY s1.dst, s2.dst
),
nonadj AS (
  SELECT w.a, w.b, w.common
  FROM wedge w
  LEFT JOIN edges e ON e.src = w.a AND e.dst = w.b
  WHERE e.src IS NULL
)
SELECT n.a, n.b, n.common,
       da.d + db.d - n.common AS union_size
FROM nonadj n
JOIN deg da ON da.node = n.a
JOIN deg db ON db.node = n.b
QUALIFY row_number() OVER (ORDER BY n.common DESC, n.a ASC, n.b ASC) <= 20
""",
)
def m_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by common-neighbor counting: the top-20
    NON-adjacent part pairs most co-reachable through shared co-order
    neighbours — the "customers who bought these also bought" score,
    emitted as exact integers (common, union) so the Jaccard rational
    stays hash-safe.  Wedge centers are capped at degree 64: a hub's
    co-occurrence is noise (the reason Adamic-Adar downweights by
    1/log d), and the cap bounds per-center fan-out at C(64,2) so the
    wedge stage scales linearly in nodes instead of quadratically in
    hub degree.  Degrees for the union term still come from the FULL
    graph.  Shapes: `deg` is pinned once (it feeds the light filter
    AND both union-term joins), the light-center filter broadcasts,
    the wedge pairs expand map-side from bounded neighbor lists, the
    adjacency anti-join and the two degree joins run on the
    ~|candidate| output, and the global top-20 is a
    TakeOrderedAndProject."""
    edges = coorder_edges(spark, sf_dir)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = (
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
        .transform(checkpoint_df)  # read 3x: light filter + both union-term joins
    )
    light = deg.where(F.col("d") <= _LINK_CENTER_CAP).select("node")
    # r11 re-plan: wedges enumerate from per-center sorted neighbor
    # LISTS (collect_list over the light-filtered sym, <=cap elements
    # each, pairs expanded map-side with partial counts) instead of the
    # former sym⋈sym self-join — the full 2|E| table is never shuffled,
    # only the light-center slice (bounded by cap·|light|).  Neighbor
    # lists sort ascending, so (i, j>i) pairs satisfy a < b by
    # construction — the same pair multiset as the self-join form.
    adj = (
        sym.join(F.broadcast(light), sym.src == light.node)
        .groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
    )
    wedge = (
        adj.select(
            F.explode(
                F.expr(
                    "flatten(transform(nbrs, (x, i) ->"
                    " transform(slice(nbrs, i + 2, size(nbrs)),"
                    " y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    nonadj = wedge.join(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    scored = (
        nonadj.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            "a", "b", "common",
            (F.col("da") + F.col("db") - F.col("common")).alias("union_size"),
        )
    )
    # top-20 via TakeOrderedAndProject — not a partition-less rank
    # window over every candidate pair
    return scored.orderBy(
        F.col("common").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(20)


_KCORE_K = 90
_KCORE_ROUNDS = 3


def _oracle_kcore() -> str:
    parts = [
        """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
e0 AS (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges)"""
    ]
    for r in range(1, _KCORE_ROUNDS + 1):
        parts.append(
            f""",
d{r} AS (SELECT src AS node, count(*) AS d FROM e{r - 1} GROUP BY src),
a{r} AS (SELECT node FROM d{r} WHERE d >= {_KCORE_K}),
e{r} AS (
  SELECT s.src, s.dst FROM e{r - 1} s
  JOIN a{r} x ON s.src = x.node JOIN a{r} y ON s.dst = y.node
)"""
        )
    rounds = " UNION ALL ".join(
        f"""SELECT {r} AS round,
       (SELECT count(*) FROM a{r}) AS n_alive,
       (SELECT count(*) FROM e{r}) // 2 AS n_edges"""
        for r in range(1, _KCORE_ROUNDS + 1)
    )
    return "".join(parts) + f"\nSELECT * FROM ({rounds})"


@query("m_graph_kcore", oracle=_oracle_kcore())
def m_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peel of the co-order graph ({_K}=90, 3 bounded rounds):
    repeatedly drop nodes whose degree among survivors falls below k —
    the standard dense-subgraph / spam-cluster extraction primitive
    (the full k-core is this peel's fixpoint; the 3-round prefix is
    the declared bounded-iteration contract, same as m_graph_cc's
    unrolled rounds). Emits per-round survivor and edge counts — pure
    integers, hash-safe by construction.

    Scale shape: the cached edge list (coorder_edges) is the only
    input; each round is one degree aggregate plus a semi-join of the
    edge list against the (always much smaller) survivor set, which is
    explicitly broadcast — iterative Catalyst size estimates go stale
    after a checkpoint, so relying on AQE here picks sort-merge (the
    round-4 trap). The carried edge list is checkpoint_df()ed per
    round to keep lineage flat (O(rounds), not O(rounds^2)) —
    localCheckpoint by default, reliable checkpoint when
    UKIS_CHECKPOINT_DIR / spark.ukis.checkpointDir is set.

    Size-selected like pagerank/triangles/BFS: under the broadcast
    budget the peel runs in numpy over the cached edge arrays and the
    3-row result is emitted as a literal VALUES plan (tests pin
    kernel == JVM); above it the broadcast-semi-join dataflow below
    runs."""
    path = coorder_edges_path(spark, sf_dir)
    edges = spark.read.parquet(path)
    if edges.count() <= _KERNEL_EDGE_BUDGET:
        return _kcore_kernel(spark, path)
    return _kcore_jvm(spark, edges)


def _kcore_kernel(spark: SparkSession, edges_path: str) -> DataFrame:
    """The 3-round peel as numpy bincount/boolean-mask iterations over
    the (shared-broadcast-cache) symmetric edge arrays; output is 3
    rows of exact integers, emitted through a literal VALUES plan (a
    pickled createDataFrame would cost a Python worker round —
    CLAUDE.md tiny-dim rule)."""
    import numpy as np

    cache_key = (id(spark.sparkContext), edges_path)
    if cache_key not in _PR_CSR_CACHE:
        import pyarrow.parquet as pq

        tbl = pq.read_table(edges_path, columns=["src", "dst"])
        src = tbl.column("src").to_numpy()
        dst = tbl.column("dst").to_numpy()
        s = np.concatenate([src, dst])
        t = np.concatenate([dst, src])
        max_id = int(s.max()) if len(s) else 0
        d = np.bincount(s, minlength=max_id + 1).astype(np.int64)
        _PR_CSR_CACHE[cache_key] = (max_id, spark.sparkContext.broadcast((s, t, d)))
    max_id, bc = _PR_CSR_CACHE[cache_key]
    s, t, _d = bc.value
    rows = []
    for r in range(1, _KCORE_ROUNDS + 1):
        deg = np.bincount(s, minlength=max_id + 1)
        alive = deg >= _KCORE_K
        keep = alive[s] & alive[t]
        s, t = s[keep], t[keep]
        rows.append((r, int(alive.sum()), len(s) // 2))
    values = ", ".join(
        f"({r}, CAST({a} AS BIGINT), CAST({e} AS BIGINT))" for r, a, e in rows
    )
    return spark.sql(
        f"SELECT * FROM VALUES {values} AS t(round, n_alive, n_edges)"
    )


def _kcore_jvm(spark: SparkSession, edges: DataFrame) -> DataFrame:
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    cur = sym.transform(checkpoint_df)
    per_round = []
    for r in range(1, _KCORE_ROUNDS + 1):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        alive = deg.where(F.col("d") >= _KCORE_K).select("src")
        cur = (
            cur.join(F.broadcast(alive), "src")
            .join(
                F.broadcast(alive.select(F.col("src").alias("dst"))), "dst"
            )
            .select("src", "dst")
            .transform(checkpoint_df)
        )
        stats = (
            cur.agg((F.count(F.lit(1)) / 2).cast("long").alias("n_edges"))
            .crossJoin(alive.agg(F.count(F.lit(1)).alias("n_alive")))
            .select(F.lit(r).alias("round"), "n_alive", "n_edges")
        )
        per_round.append(stats)
    out = per_round[0]
    for s in per_round[1:]:
        out = out.unionByName(s)
    return out


@query(
    "m_graph_modularity",
    oracle="""
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), mtot AS (
  SELECT count(*) AS m FROM edges
), bs AS (
  SELECT ps.p_brand AS sb, pd.p_brand AS db
  FROM edges e
  JOIN part ps ON ps.p_partkey = e.src
  JOIN part pd ON pd.p_partkey = e.dst
), sym AS (
  SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
), deg AS (
  SELECT node, count(*) AS d FROM sym GROUP BY node
), degb AS (
  SELECT p.p_brand, count(*) AS n_nodes, CAST(SUM(d.d) AS BIGINT) AS deg_sum
  FROM deg d JOIN part p ON p.p_partkey = d.node
  GROUP BY p.p_brand
), ein AS (
  SELECT sb AS p_brand, count(*) AS e_in FROM bs WHERE sb = db GROUP BY sb
)
SELECT d.p_brand AS brand, d.n_nodes, d.deg_sum,
       COALESCE(e.e_in, 0) AS e_in,
       4 * (SELECT m FROM mtot) * COALESCE(e.e_in, 0)
         - d.deg_sum * d.deg_sum AS contrib_scaled
FROM degb d LEFT JOIN ein e USING (p_brand)
""",
)
def m_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the co-order graph under the part-brand
    partition, exact: per community the within-community edge count
    e_c, total degree deg_c, and the integer-scaled contribution
    ``4*m*e_c - deg_c^2`` (sum/(4m^2) = Q), so community assortativity
    is hash-checked with no rational division at all.  Magnitude:
    deg_c <= 2m and e_c <= m keep both products under 2^63 beyond a
    100x corpus (m ~ 1e8 -> ~6e16).  Scale: edges come from the
    ingest-time co-order cache (built once, coorder_edges); brands
    join via the part node dim UNHINTED — part grows with the corpus,
    so AQE broadcasts it only while it is actually small and degrades
    to a shuffle join at 100x (round-8 broadcast-lineage audit);
    everything else is two hash aggregates over edges — no iteration,
    one shuffle each."""
    edges = coorder_edges(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    mtot = edges.agg(F.count(F.lit(1)).alias("m"))
    bs = (
        edges.join(
            part.select(F.col("p_partkey").alias("src"), F.col("p_brand").alias("sb")),
            "src",
        )
        .join(
            part.select(F.col("p_partkey").alias("dst"), F.col("p_brand").alias("db")),
            "dst",
        )
    )
    sym = edges.select(F.col("src").alias("node")).unionAll(
        edges.select(F.col("dst").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    degb = (
        deg.join(
            part.select(F.col("p_partkey").alias("node"), "p_brand"), "node"
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_nodes"), F.sum("d").alias("deg_sum"))
    )
    ein = (
        bs.where(F.col("sb") == F.col("db"))
        .groupBy(F.col("sb").alias("p_brand"))
        .agg(F.count(F.lit(1)).alias("e_in"))
    )
    return (
        degb.join(F.broadcast(ein), "p_brand", "left")
        .crossJoin(F.broadcast(mtot))
        .select(
            F.col("p_brand").alias("brand"),
            "n_nodes",
            "deg_sum",
            F.coalesce(F.col("e_in"), F.lit(0)).alias("e_in"),
            (
                F.lit(4) * F.col("m") * F.coalesce(F.col("e_in"), F.lit(0))
                - F.col("deg_sum") * F.col("deg_sum")
            ).alias("contrib_scaled"),
        )
    )


@query(
    "m_graph_assortativity",
    oracle="""
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), e AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst FROM edges
), deg AS (
  SELECT src AS node, count(*) AS d FROM e GROUP BY src
)
SELECT count(*) AS m2,
       CAST(SUM(ds.d * dd.d) AS BIGINT) AS sum_prod,
       CAST(SUM(ds.d + dd.d) AS BIGINT) AS sum_sum,
       CAST(SUM(ds.d * ds.d + dd.d * dd.d) AS BIGINT) AS sum_sq
FROM e
JOIN deg ds ON ds.node = e.src
JOIN deg dd ON dd.node = e.dst
""",
)
def m_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity sufficient statistics of the co-order
    graph: over every directed edge of the symmetrized edge list, the
    exact integer sums (Σdᵤdᵥ, Σ(dᵤ+dᵥ), Σ(dᵤ²+dᵥ²), 2m) from which
    Newman's r = (S₁·Σdᵤdᵥ − S₂²/4·...) assembles — positive r means
    hubs link hubs (skew compounds through joins: the salting
    argument), negative means hub-to-leaf.  Like m_scaling_fit the
    engine emits the associative partials, not the final ratio —
    exact at any scale and mergeable per shard.  Scale: degrees from
    one aggregate over the cached edge list (the ingest-time
    coorder_edges build), then two broadcast-size joins of the degree
    table onto edges; magnitude d ≤ ~10³, d²·|edges| ≪ 2^63."""
    edges = coorder_edges(spark, sf_dir)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed(
        "src", "node"
    )
    ds = deg.select(F.col("node").alias("s_node"), F.col("d").alias("d_s"))
    dd = deg.select(F.col("node").alias("d_node"), F.col("d").alias("d_d"))
    joined = (
        sym.join(F.broadcast(ds), F.col("src") == F.col("s_node"))
        .join(F.broadcast(dd), F.col("dst") == F.col("d_node"))
    )
    return joined.agg(
        F.count(F.lit(1)).alias("m2"),
        F.sum(F.col("d_s") * F.col("d_d")).cast("bigint").alias("sum_prod"),
        F.sum(F.col("d_s") + F.col("d_d")).cast("bigint").alias("sum_sum"),
        F.sum(F.col("d_s") * F.col("d_s") + F.col("d_d") * F.col("d_d"))
        .cast("bigint")
        .alias("sum_sq"),
    )


_HITS_ITERS = 3
_HITS_TOPK = 20


def _oracle_hits() -> str:
    parts = [
        f"""
WITH e AS MATERIALIZED (
  SELECT o.o_custkey AS c, l.l_suppkey AS s,
         CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS w
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
dims AS (SELECT count(DISTINCT c) AS nc, count(DISTINCT s) AS ns FROM e),
h0 AS (SELECT DISTINCT c, CAST({_UNIT} AS BIGINT) AS h FROM e)"""
    ]
    for k in range(1, _HITS_ITERS + 1):
        parts.append(
            f""",
ar{k} AS MATERIALIZED (
  SELECT e.s, CAST(SUM(e.w * h.h) AS BIGINT) AS raw
  FROM e JOIN h{k - 1} h ON h.c = e.c GROUP BY e.s
),
a{k} AS MATERIALIZED (
  SELECT s, raw // GREATEST(
    (SELECT CAST(SUM(raw) AS BIGINT) FROM ar{k})
      // ((SELECT ns FROM dims) * {_UNIT}), 1) AS a
  FROM ar{k}
),
hr{k} AS MATERIALIZED (
  SELECT e.c, CAST(SUM(e.w * a.a) AS BIGINT) AS raw
  FROM e JOIN a{k} a ON a.s = e.s GROUP BY e.c
),
h{k} AS MATERIALIZED (
  SELECT c, raw // GREATEST(
    (SELECT CAST(SUM(raw) AS BIGINT) FROM hr{k})
      // ((SELECT nc FROM dims) * {_UNIT}), 1) AS h
  FROM hr{k}
)"""
        )
    parts.append(
        f"""
SELECT * FROM (
  SELECT 'auth' AS role, s AS node, a AS score_u
  FROM a{_HITS_ITERS} ORDER BY a DESC, s ASC LIMIT {_HITS_TOPK}
)
UNION ALL
SELECT * FROM (
  SELECT 'hub' AS role, c AS node, h AS score_u
  FROM h{_HITS_ITERS} ORDER BY h DESC, c ASC LIMIT {_HITS_TOPK}
)"""
    )
    return "".join(parts)


@query("m_graph_hits", oracle=_oracle_hits())
def m_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities over the DIRECTED customer→supplier
    bipartite multigraph, edges weighted by the number of distinct
    linking orders: 3 mutual-reinforcement rounds — auth(s) = Σ w·hub(c)
    over in-edges, hub(c) = Σ w·auth(s) over out-edges — then top-20 of
    each role. Weights are load-bearing for non-vacuity: at sf0.001
    every customer reaches ALL ~10 suppliers, so the unweighted variant
    ties every hub score (measured — the first cut failed its own
    spread assertion); weighted raw scores are fully distinct at every
    scale (150/150, 1492/1500, 14292/14999 measured). The
    corpus-curation reading: hubs are broad consumers whose
    endorsements identify authoritative sources, the same structure a
    citation/link-quality prior over web documents uses.

    Fixed-point discipline (module docstring): scores are BIGINT
    micro-units; each round L1-renormalizes by DIVIDING FIRST —
    score = raw // max(S // (n·UNIT), 1) with S = Σ raw — so no
    product ever exceeds ~n_nodes·UNIT·avg_degree (≈6e11 at sf0.1:
    587k edges, nc=14,999, ns=1,000 measured) and int64 never
    overflows at ANY corpus scale (a raw·UNIT formulation would pass
    2^63 near 100×; divide-first caps magnitudes structurally). The
    GREATEST(,1) clamp is SELF-LIMITING, no corpus-shape assumption
    needed: when S ≥ n·UNIT the divisor D = S // (n·UNIT) satisfies
    D > S/(2·n·UNIT), so post-round mass Σscore ≤ S/D < 2·n·UNIT;
    when S < n·UNIT the clamp passes scores through unnormalized but
    their total IS S < n·UNIT already. Either way every round ends
    with Σscore < 2·n·UNIT, so the next round's raw sums are bounded
    by max_weighted_degree · 2·n·UNIT (< 2^63 even at 100× with
    degree 1e6) — the overflow headroom is structural, not a
    measured-corpus fact (tests/test_graph_geo_reference.py pins the
    invariant per round). Scale shape: the edge list materializes once
    (checkpoint_df) and each round is two edge-sized shuffles
    (groupBy s, groupBy c) plus two scalar aggregates crossJoined
    back broadcast — the Pregel-as-joins dataflow; state is
    checkpointed per round so lineage stays O(1) (the O(k²) re-plan
    trap pagerank documents). No windows, no Python, no corpus-grown
    broadcast (the scalar crossJoins are bounded by scalar aggs)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # r11: distinct (order, supplier) BEFORE the join — the edge weight
    # is countDistinct(o_orderkey) per (c, s) and an orderkey maps to
    # one customer, so pre-deduping lineitem shrinks the join input and
    # turns the aggregate into a plain count (guide §2.3, aggregate
    # before you shuffle)
    edges = (
        o.join(l.distinct(), o.o_orderkey == l.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .groupBy("c", "s")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .transform(lambda df: checkpoint_df(df, eager=False))
    )
    # bounded scalar probe (2 ints): the bipartite dimensions, needed
    # as normalization constants every round — collected once instead
    # of a re-planned countDistinct broadcast per round (×6).  This
    # probe's job also materializes the lazily pinned edge list.
    nc, ns = edges.agg(
        F.countDistinct("c").cast("bigint"), F.countDistinct("s").cast("bigint")
    ).first()
    h = edges.select("c").distinct().select(
        "c", F.lit(_UNIT).cast("bigint").alias("h")
    )
    a = None
    for _ in range(_HITS_ITERS):
        # lazily pin the PRE-normalization sums; the 1-row total probe
        # below is the round's single materializing job and the
        # normalized frame is then a pure projection over the pin with
        # LITERAL divisors (was: eager checkpoint job + two broadcast
        # crossJoins per half-round — measured ~2 jobs/round saved)
        ar = (
            edges.join(h, "c")
            .groupBy("s")
            .agg(F.sum(F.col("w") * F.col("h")).cast("bigint").alias("raw"))
            .transform(lambda df: checkpoint_df(df, eager=False))
        )
        tot_a = ar.agg(F.sum("raw").cast("bigint")).first()[0]
        # divisor folded in Python (raw sums are nonnegative, so // ==
        # SQL div; inlining the product as SQL literals would type them
        # INT and overflow under ANSI constant folding)
        div_a = max(int(tot_a) // (int(ns) * _UNIT), 1)
        a = ar.select("s", F.expr(f"raw div {div_a}").alias("a"))
        hr = (
            edges.join(a, "s")
            .groupBy("c")
            .agg(F.sum(F.col("w") * F.col("a")).cast("bigint").alias("raw"))
            .transform(lambda df: checkpoint_df(df, eager=False))
        )
        tot_h = hr.agg(F.sum("raw").cast("bigint")).first()[0]
        div_h = max(int(tot_h) // (int(nc) * _UNIT), 1)
        h = hr.select("c", F.expr(f"raw div {div_h}").alias("h"))
    top_auth = (
        a.select(F.lit("auth").alias("role"), F.col("s").alias("node"), F.col("a").alias("score_u"))
        .orderBy(F.col("score_u").desc(), F.col("node").asc())
        .limit(_HITS_TOPK)
    )
    top_hub = (
        h.select(F.lit("hub").alias("role"), F.col("c").alias("node"), F.col("h").alias("score_u"))
        .orderBy(F.col("score_u").desc(), F.col("node").asc())
        .limit(_HITS_TOPK)
    )
    return top_auth.unionByName(top_hub)


_CLOSE_HOPS = 3
_CLOSE_SEEDS = 8


def _oracle_closeness() -> str:
    head = f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS MATERIALIZED (
  SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
),
deg AS MATERIALIZED (SELECT src AS node, count(*) AS d FROM sym GROUP BY src),
seeds AS MATERIALIZED (
  SELECT node AS seed, d AS degree FROM deg
  ORDER BY d DESC, node ASC LIMIT {_CLOSE_SEEDS}
),
r0 AS MATERIALIZED (SELECT seed, seed AS node, 0 AS dist FROM seeds)"""
    parts = [head]
    for k in range(1, _CLOSE_HOPS + 1):
        prev_delta = "r0" if k == 1 else f"n{k - 1}"
        prev_reach = "r0" if k == 1 else f"r{k - 1}"
        parts.append(
            f""",
c{k} AS MATERIALIZED (
  SELECT DISTINCT p.seed, e.dst AS node
  FROM {prev_delta} p JOIN sym e ON e.src = p.node
),
n{k} AS MATERIALIZED (
  SELECT c.seed, c.node, {k} AS dist
  FROM c{k} c LEFT JOIN {prev_reach} r ON r.seed = c.seed AND r.node = c.node
  WHERE r.node IS NULL
),
r{k} AS MATERIALIZED (
  SELECT * FROM {prev_reach} UNION ALL SELECT * FROM n{k}
)"""
        )
    parts.append(
        f"""
SELECT s.seed, s.degree,
       count(CASE WHEN r.dist = 1 THEN 1 END) AS n1,
       count(CASE WHEN r.dist = 2 THEN 1 END) AS n2,
       count(CASE WHEN r.dist = 3 THEN 1 END) AS n3,
       CAST(6 * count(CASE WHEN r.dist = 1 THEN 1 END)
          + 3 * count(CASE WHEN r.dist = 2 THEN 1 END)
          + 2 * count(CASE WHEN r.dist = 3 THEN 1 END) AS BIGINT) AS harm_sixths
FROM seeds s JOIN r{_CLOSE_HOPS} r ON r.seed = s.seed
GROUP BY s.seed, s.degree"""
    )
    return "".join(parts)


@query("m_graph_closeness", oracle=_oracle_closeness())
def m_graph_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic closeness centrality of the top-{seeds} highest-degree
    parts, truncated at {hops} hops: per seed the exact per-hop reach
    counts and the harmonic sum Σ 1/d over reached nodes — emitted in
    SIXTHS (6/d ∈ {{6,3,2}} for d ∈ {{1,2,3}}), so the whole statistic
    is exact integer arithmetic with no rounding surface (the lcm
    trick; same fixed-point discipline as the rest of the module).
    Truncated/k-hop harmonic closeness is the standard
    big-graph-tractable centrality (full closeness needs all-pairs
    distances); the curation reading: which catalog anchors reach the
    co-purchase graph fastest.

    Scale shape: MULTI-SOURCE delta BFS — the frontier carries only
    NEWLY reached (seed, node) pairs, each hop is one edges-join +
    distinct + one anti-join against the checkpointed reach set, so
    hop k costs |delta_k|·avg_degree regardless of graph size, and the
    seed set is bounded (8) by an ORDER BY degree LIMIT (a
    TakeOrderedAndProject, never a global window — round-6 rule). The
    DuckDB oracle unrolls the same three hops with MATERIALIZED CTEs
    (the inlining blowup hits DuckDB scalar-subquery re-evaluation
    otherwise, measured 120 s -> 0.7 s on m_graph_hits)."""
    edges = coorder_edges(spark, sf_dir)
    # r11: every pin in this fixed-hop expansion is LAZY — the hop
    # count is data-independent, so nothing needs to materialize until
    # the final counts job, which then computes each pinned hop exactly
    # once in one cascade (was: one eager checkpoint job per hop).
    # Plans stay O(1): each checkpoint_df compiles its subtree once and
    # downstream hops read the pinned RDD.
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).transform(lambda df: checkpoint_df(df, eager=False))
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed(
        "src", "node"
    )
    seeds = (
        deg.orderBy(F.col("d").desc(), F.col("node").asc())
        .limit(_CLOSE_SEEDS)
        .select(F.col("node").alias("seed"), F.col("d").alias("degree"))
        .transform(lambda df: checkpoint_df(df, eager=False))
    )
    reach = seeds.select("seed", F.col("seed").alias("node"), F.lit(0).alias("dist"))
    delta = reach
    for k in range(1, _CLOSE_HOPS + 1):
        cand = (
            delta.join(sym, delta.node == sym.src)
            .select("seed", F.col("dst").alias("node"))
            .distinct()
        )
        new = cand.join(reach, ["seed", "node"], "left_anti").select(
            "seed", "node", F.lit(k).alias("dist")
        )
        reach = reach.unionByName(new).transform(
            lambda df: checkpoint_df(df, eager=False)
        )
        delta = reach.where(F.col("dist") == k)
    counts = reach.groupBy("seed").agg(
        F.count(F.when(F.col("dist") == 1, 1)).alias("n1"),
        F.count(F.when(F.col("dist") == 2, 1)).alias("n2"),
        F.count(F.when(F.col("dist") == 3, 1)).alias("n3"),
    )
    return (
        F.broadcast(seeds)
        .join(counts, "seed")
        .select(
            "seed",
            "degree",
            "n1",
            "n2",
            "n3",
            (6 * F.col("n1") + 3 * F.col("n2") + 2 * F.col("n3"))
            .cast("bigint")
            .alias("harm_sixths"),
        )
    )
