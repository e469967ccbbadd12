"""Bounded-error and planted-structure tests for the approximate /
rows-only operators (SURVEY.md §5 item 3)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ukis_kafka_spark import api
from ukis_kafka_spark.sources import load_table

from .conftest import SF_SMOKE


def test_approx_count_distinct_bound(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in api.queries()["q_agg_approx_cd"](spark, SF_SMOKE).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / exact[k]
        assert rel_err <= 0.15, f"{k}: approx {approx[k]} vs exact {exact[k]}"


@pytest.fixture(scope="module")
def planted_docs(spark, tmp_path_factory):
    """A corpus with known near-duplicates: pairs (i, i+1000) differ by
    one token; unrelated docs share almost nothing."""
    base = tmp_path_factory.mktemp("planted")
    rows = []
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    # 100 distinct tokens per doc: a 1-token edit moves each simhash bit
    # vote by at most 2 out of ~100 — expected Hamming stays small
    for i in range(40):
        toks = [vocab[(i * 7 + j * 3) % len(vocab)] + str(i * 211 + j) for j in range(100)]
        text = " ".join(toks)
        rows.append((i, text))
        near = toks.copy()
        near[50] = "CHANGED"
        rows.append((i + 1000, " ".join(near)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.withColumn("lang", F.lit("en")).withColumn("source", F.lit("s0")).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    path = str(base / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    # the ml queries expect a directory with documents.parquet inside
    return str(base)


def test_minhash_finds_planted_pairs(spark, planted_docs):
    rows = api.queries()["m_near_dedup"](spark, planted_docs).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    planted = {(i, i + 1000) for i in range(40)}
    found = planted & pairs
    # planted pairs share ~97/100 shingles → Jaccard ≈ 0.94 → LSH finds
    # nearly all of them with 12 hashes × 4 bands
    assert len(found) >= 30, f"only {len(found)}/40 planted pairs found"
    # the exact-Jaccard verify stage must hold for every emitted pair
    for r in rows:
        assert r["jaccard"] >= 0.6, f"pair {(r['id_a'], r['id_b'])} below verify threshold"


def test_simhash_finds_planted_pairs(spark, planted_docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in api.queries()["m_simhash"](spark, planted_docs).collect()
    }
    planted = {(i, i + 1000) for i in range(40)}
    assert len(planted & pairs) >= 25, f"only {len(planted & pairs)}/40 planted pairs found"


def test_lsh_ann_recall(spark):
    truth = {
        (r["id_a"], r["id_b"])
        for r in api.queries()["m_cosine_topk"](spark, SF_SMOKE).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]) for r in api.queries()["m_ann_lsh"](spark, SF_SMOKE).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.5, f"LSH recall {recall:.2f} of brute-force top-20"


def test_map_ops_semantics(spark):
    import json

    rows = api.queries()["q_map_ops"](spark, SF_SMOKE).limit(50).collect()
    assert rows
    for r in rows:
        attrs = json.loads(r["attrs_json"])
        assert r["type_from_map"] == attrs["type"]
        assert r["attr_keys"] == "type,user"
        assert r["n_keys"] == 2 == len(attrs)


def test_multimodal_stub_raises_on_real_formats():
    from ukis_kafka_spark.ml.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...", "png")
    feats = decode_image(b"\x01\x02\x03", "raw")
    assert feats["n_bytes"] == 3 and feats["mean_pixel"] == 2.0


def test_ivf_ann_recall(spark):
    truth = {
        (r["id_a"], r["id_b"])
        for r in api.queries()["m_cosine_topk"](spark, SF_SMOKE).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]) for r in api.queries()["m_ann_ivf"](spark, SF_SMOKE).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.5, f"IVF recall {recall:.2f} of brute-force top-20"


def test_connected_components_on_planted_clusters(spark):
    from ukis_kafka_spark.ml.dedup import connected_components

    # two triangles + one chain + an isolated pair
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (20, 21)],
        "id_a long, id_b long",
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_pointer_jump_cc_on_planted_chain(spark):
    """The adversarial topology from VERDICT r8 item 5: a 64-node
    chain.  The fixed-4-round min-label unroll (the m_dedup_clusters
    ORACLE's shape, correct on diameter-1 band cliques) must FAIL
    here, plain propagation would need 63 rounds, and the
    pointer-jumping variant must converge to the true single component
    in O(log n) rounds."""
    from ukis_kafka_spark.ml.dedup import connected_components_jump

    n = 64
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    labels, rounds = connected_components_jump(chain)
    comp = {r["node"]: r["component"] for r in labels.collect()}
    assert comp == {i: 0 for i in range(n)}
    assert rounds <= 9, f"pointer jumping took {rounds} rounds on a 64-chain"

    # the fixed-4-round unrolled min-label (re-derived in plain python,
    # exactly the oracle's l0..l4 semantics) mislabels the chain tail —
    # the evidence that bounded-round CC does not survive long chains
    lbl = {i: i for i in range(n)}
    for _ in range(4):
        nbr = {
            i: min(
                [lbl[i]]
                + ([lbl[i - 1]] if i > 0 else [])
                + ([lbl[i + 1]] if i < n - 1 else [])
            )
            for i in range(n)
        }
        lbl = nbr
    assert lbl[n - 1] != 0, "4 fixed rounds unexpectedly solved a 64-chain"


def test_pointer_jump_cc_mixed_topologies(spark):
    """Ring, star, and two chains sharing no nodes — pointer jumping
    must land the same min-reachable labels the plain loop does."""
    from ukis_kafka_spark.ml.dedup import (
        connected_components,
        connected_components_jump,
    )

    edges = [(i, (i + 1) % 12) for i in range(12)]          # ring: min 0
    edges += [(100, 100 + k) for k in range(1, 6)]          # star: min 100
    edges += [(200 + i, 201 + i) for i in range(10)]        # chain: min 200
    edges += [(300 + i, 301 + i) for i in range(7)]         # chain: min 300
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    jump, _ = connected_components_jump(df)
    plain = connected_components(df, max_iter=30)
    got = {r["node"]: r["component"] for r in jump.collect()}
    want = {r["node"]: r["component"] for r in plain.collect()}
    assert got == want
    assert set(got.values()) == {0, 100, 200, 300}


def test_dedup_clusters_planted(spark, planted_docs):
    rows = api.queries()["m_dedup_clusters"](spark, planted_docs).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    # each planted pair (i, i+1000) must share a cluster with survivor i
    hits = 0
    for i in range(40):
        if i in by_doc and (i + 1000) in by_doc:
            a, b = by_doc[i], by_doc[i + 1000]
            if a["cluster_id"] == b["cluster_id"]:
                hits += 1
                assert a["is_survivor"] and not b["is_survivor"]
    assert hits >= 30


def test_approx_quantile_bound(spark):
    rows = api.queries()["q_agg_approx_quantile"](spark, SF_SMOKE).collect()
    exact = {
        r["l_returnflag"]: (r["p50"], r["p90"])
        for r in api.queries()["q_agg_percentile"](spark, SF_SMOKE)
        .selectExpr("l_returnflag", "median_price AS p50", "p90_price AS p90")
        .collect()
    }
    assert rows
    for r in rows:
        a50, a90 = r["approx_p50"], r["approx_p90"]
        e50, e90 = exact[r["l_returnflag"]]
        assert abs(a50 - e50) / e50 < 0.05
        assert abs(a90 - e90) / e90 < 0.05


def test_triangle_strategies_agree(spark):
    """m_graph_triangles size-selects between the broadcast CSR kernel
    and the shuffle-parallel JVM join path; both must produce the
    identical top-20 (the oracle only ever sees whichever one the
    budget picked, so the agreement is pinned here)."""
    from ukis_kafka_spark.ml.graph import (
        _triangles_jvm,
        _triangles_kernel,
        coorder_edges,
        coorder_edges_path,
    )

    kern = _triangles_kernel(spark, coorder_edges_path(spark, SF_SMOKE)).collect()
    jvm = _triangles_jvm(spark, coorder_edges(spark, SF_SMOKE)).collect()
    assert [(r.node, r.n_tri) for r in kern] == [(r.node, r.n_tri) for r in jvm]
    assert len(kern) == 20


def _bruteforce_top20(spark):
    return {
        (r["id_a"], r["id_b"])
        for r in api.queries()["m_cosine_topk"](spark, SF_SMOKE).collect()
    }


def test_lsh_recall_curve(spark):
    """The recall/cost knob of the LSH path: more tables -> more
    candidate volume -> recall must not decrease, and the documented
    operating point (8 tables) must clear its floor. (Curve documented
    here rather than a fixed single setting so a tuning regression
    shows up as a failing step, not a silent recall drop.)"""
    from ukis_kafka_spark.ml.similarity import ann_lsh_pairs
    from ukis_kafka_spark.sources import load_table

    truth = _bruteforce_top20(spark)
    e = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    recalls = {}
    for n_tables in (2, 8, 16):
        approx = {
            (r["id_a"], r["id_b"])
            for r in ann_lsh_pairs(e, n_tables=n_tables, n_bits=4).collect()
        }
        recalls[n_tables] = len(truth & approx) / len(truth)
    assert recalls[8] >= 0.5, f"operating point below floor: {recalls}"
    assert recalls[16] >= recalls[2] - 0.10, f"curve inverted: {recalls}"


def test_ivf_recall_curve(spark):
    """The recall/cost knob of the IVF path: more probed lists ->
    higher recall. Probing ALL lists makes candidate generation
    exhaustive for pairs sharing any list — recall at n_probes=16 must
    dominate the single-probe setting and the documented operating
    point (4 probes) must clear its floor."""
    from ukis_kafka_spark.ml.similarity import ann_ivf_pairs
    from ukis_kafka_spark.sources import load_table

    truth = _bruteforce_top20(spark)
    e = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    recalls = {}
    for n_probes in (1, 4, 16):
        approx = {
            (r["id_a"], r["id_b"])
            for r in ann_ivf_pairs(e, n_lists=16, n_probes=n_probes).collect()
        }
        recalls[n_probes] = len(truth & approx) / len(truth)
    assert recalls[4] >= 0.5, f"operating point below floor: {recalls}"
    assert recalls[16] >= recalls[1], f"curve inverted: {recalls}"
    assert recalls[16] >= 0.9, f"full probe should be near-exhaustive: {recalls}"


def test_ann_pq_recall_vs_exact(spark):
    """ADC over 2-bit PQ codes is an approximation; pin its recall@5
    against exact fixed-point L2 top-5 so codebook regressions surface
    (16-codeword sub-spaces + ADC-top-50 exact rerank: measured 0.80
    at sf0.001, 0.74 at sf0.01 — bound leaves margin)."""
    import numpy as np

    from ukis_kafka_spark.sources import load_table as _lt

    got = api.queries()["m_ann_pq"](spark, SF_SMOKE).collect()
    approx = {}
    for r in got:
        approx.setdefault(r.qid, set()).add(r.nn_id)
    emb = _lt(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in emb])
    V = np.floor(np.array([r.embedding for r in emb], dtype=np.float64) * 1e6)
    hits = tot = 0
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    for qi, qid in enumerate(ids):
        if qid not in approx:
            continue
        d = ((V - V[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf
        exact = set(ids[np.lexsort((ids, d))[:5]])
        hits += len(exact & approx[qid])
        tot += 5
    assert tot == len(approx) * 5
    assert hits / tot >= 0.6, f"PQ recall@5 collapsed: {hits}/{tot}"


def test_span_corruption_reconstructs(spark):
    """Invariant: interleaving each input's sentinel positions with the
    target's spans must reconstruct the original document exactly —
    the property that makes the (input, target) pair trainable."""
    out = {
        r.doc_id: r
        for r in api.queries()["m_span_corruption"](spark, SF_SMOKE).collect()
    }
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    }
    assert set(out) == set(docs)
    for doc_id, row in out.items():
        # parse target: "<Xk> tok tok <Xk+1> tok ..." → span k -> tokens
        spans = {}
        cur = None
        for tok in row.target_text.split(" "):
            if tok.startswith("<X") and tok.endswith(">"):
                cur = tok
                spans[cur] = []
            else:
                spans[cur].append(tok)
        rebuilt = []
        for tok in row.input_text.split(" "):
            if tok.startswith("<X") and tok.endswith(">"):
                rebuilt.extend(spans[tok])
            else:
                rebuilt.append(tok)
        assert " ".join(rebuilt) == docs[doc_id], f"doc {doc_id} failed to reconstruct"


def test_gaps_islands_partition_stream(spark):
    """Invariant: islands partition each user's event stream — per-user
    island lengths sum to the user's event count, and islands never
    overlap (starts/ends strictly ordered)."""
    import collections

    islands = api.queries()["q_gaps_islands"](spark, SF_SMOKE).collect()
    events = (
        load_table(spark, SF_SMOKE, "events").groupBy("user_id").count().collect()
    )
    per_user_events = {r.user_id: r["count"] for r in events}
    got = collections.defaultdict(int)
    by_user = collections.defaultdict(list)
    for r in islands:
        got[r.user_id] += r.island_len
        by_user[r.user_id].append((r.island_start, r.island_end))
    assert dict(got) == per_user_events
    for user, spans in by_user.items():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 < s2, f"user {user}: overlapping islands"


def test_hll_registers_recover_cardinality(spark):
    """The explicit HLL register bank must reproduce the standard HLL
    estimate within its published error envelope (~1.04/sqrt(64) =
    13% relative error at m=64; allow 3 sigma) — proving the registers
    are a REAL sketch state, not decorative hashes."""
    import math

    rows = api.queries()["m_hll_registers"](spark, SF_SMOKE).collect()
    regs = {r.bucket: r.register for r in rows}
    m = 64
    # unobserved buckets carry register 0
    full = [regs.get(b, 0) for b in range(m)]
    alpha = 0.709  # alpha_64
    raw = alpha * m * m / sum(2.0 ** -r for r in full)
    n_zero = sum(1 for r in full if r == 0)
    est = m * math.log(m / n_zero) if (raw < 2.5 * m and n_zero) else raw
    exact = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert abs(est - exact) / exact < 3 * 1.04 / math.sqrt(m)


def test_countmin_estimate_dominates_truth(spark):
    """CMS property: every estimate >= the true count (min of
    over-counting rows), and at least one of the 10 heavy hitters is
    estimated exactly or near-exactly (width 64 vs ~150 keys leaves
    some collision-free rows at smoke scale)."""
    rows = api.queries()["m_countmin"](spark, SF_SMOKE).collect()
    assert len(rows) == 10
    assert all(r.cms_estimate >= r.true_count for r in rows)
    slack = min(r.cms_estimate - r.true_count for r in rows)
    assert slack < 200, "all estimates wildly inflated - hashing broken?"


def test_pagerank_strategies_agree(spark):
    """m_graph_pagerank size-selects between the broadcast-CSR numpy
    kernel and the salted JVM join loop; the full rank vectors (not
    just the top-50) must be identical — the kernel re-implements the
    JVM's fixed-point integer arithmetic exactly."""
    from ukis_kafka_spark.ml.graph import (
        _pagerank_jvm,
        _pagerank_kernel,
        coorder_edges_path,
    )

    path = coorder_edges_path(spark, SF_SMOKE)
    k = {
        (r["node"], r["rank_u"])
        for r in _pagerank_kernel(spark, path).limit(10**9).collect()
    }
    j = {
        (r["node"], r["rank_u"])
        for r in _pagerank_jvm(spark, spark.read.parquet(path), small=True).limit(10**9).collect()
    }
    assert k == j and len(k) == 50  # both paths emit the same top-50


def test_bfs_strategies_agree(spark):
    """m_graph_bfs size-selects between the broadcast-CSR kernel and
    the salted JVM join loop; the full (node, dist) maps must match."""
    from ukis_kafka_spark.ml.graph import _bfs_jvm, _bfs_kernel, coorder_edges

    k = {(r["node"], r["dist"]) for r in _bfs_kernel(spark, SF_SMOKE).collect()}
    j = {
        (r["node"], r["dist"])
        for r in _bfs_jvm(spark, SF_SMOKE, coorder_edges(spark, SF_SMOKE), small=True).collect()
    }
    assert k == j and len(k) > 0


def test_kcore_strategies_agree(spark):
    """m_graph_kcore's numpy peel must emit the identical 3 audit rows
    as the broadcast-semi-join JVM dataflow."""
    from ukis_kafka_spark.ml.graph import (
        _kcore_jvm,
        _kcore_kernel,
        coorder_edges,
        coorder_edges_path,
    )

    k = sorted(
        map(tuple, _kcore_kernel(spark, coorder_edges_path(spark, SF_SMOKE)).collect())
    )
    j = sorted(map(tuple, _kcore_jvm(spark, coorder_edges(spark, SF_SMOKE)).collect()))
    assert k == j and len(k) == 3


def test_matryoshka_recall_reference(spark):
    """m_matryoshka_recall re-derived with numpy: quantize to the 1e4
    integer grid, exact int64 distances full vs 16-dim prefix, top-5
    overlap and the true-NN's truncated rank — must match exactly.
    Also pins the audit's own informativeness: truncation must not be
    a perfect proxy (some query loses a hit) nor useless (some query
    keeps one)."""
    import numpy as np
    import pandas as pd

    from ukis_kafka_spark.ml.similarity import _MAT_TRUNC_D, _RECALL_K, _RECALL_NQ

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    V = np.floor(np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 10_000).astype(np.int64)
    ids = emb["vec_id"].to_numpy()
    order = np.argsort(ids)
    V, ids = V[order], ids[order]
    exp = {}
    for qpos in np.where(ids < _RECALL_NQ)[0]:
        qid = int(ids[qpos])
        diff = V - V[qpos]
        d2f = (diff * diff).sum(axis=1)
        d2t = (diff[:, :_MAT_TRUNC_D] * diff[:, :_MAT_TRUNC_D]).sum(axis=1)
        mask = ids != qid
        cand = ids[mask]

        def rank(d2):
            key = sorted(zip(d2[mask], cand))
            return {int(nid): r + 1 for r, (_, nid) in enumerate(key)}

        rf, rt = rank(d2f), rank(d2t)
        truth = {n for n, r in rf.items() if r <= _RECALL_K}
        approx = {n for n, r in rt.items() if r <= _RECALL_K}
        nn = min(rf, key=lambda n: rf[n])
        exp[qid] = (len(truth & approx), rt[nn], len(truth & approx) * 1_000_000 // _RECALL_K)
    got = {
        r.qid: (r.n_hits, r.nn_trunc_rank, r.recall_ppm)
        for r in api.queries()["m_matryoshka_recall"](spark, SF_SMOKE).collect()
    }
    assert got == exp
    hits = [h for h, _, _ in exp.values()]
    assert min(hits) < _RECALL_K, "truncation never loses a hit — vacuous audit"
    assert max(hits) > 0, "truncation never keeps a hit — vacuous audit"


def test_embed_norm_audit_reference(spark):
    """Per-label squared-norm audit recomputed with pandas + Decimal
    (6 dp component squares, exact decimal sums, integer div)."""
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    per = {}
    for lab, vec in zip(emb.label.astype(int), emb.embedding):
        sq = Decimal(0)
        neg = 0
        for v in vec:
            x = float(v)
            sq += Decimal(repr(x * x)).quantize(
                Decimal("1e-6"), ROUND_HALF_UP
            )
            neg += x < 0
        micro = int(sq * 1_000_000)
        n, tneg, mn, mx, tot = per.get(lab, (0, 0, None, None, 0))
        per[lab] = (
            n + 1,
            tneg + neg,
            micro if mn is None else min(mn, micro),
            micro if mx is None else max(mx, micro),
            tot + micro,
        )
    want = {
        lab: (n, tneg, mn, mx, tot // n)
        for lab, (n, tneg, mn, mx, tot) in per.items()
    }
    got = {
        int(r["label"]): (
            int(r["n_vecs"]),
            int(r["neg_components"]),
            int(r["sqnorm_micro_min"]),
            int(r["sqnorm_micro_max"]),
            int(r["sqnorm_micro_avg"]),
        )
        for r in api.queries()["m_embed_norm_audit"](spark, SF_SMOKE).collect()
    }
    assert got == want
    # non-vacuity: norms spread within labels (min < max everywhere)
    assert all(mn < mx for _, _, mn, mx, _ in want.values())


def test_zip_source_kernel_is_strict(spark):
    """A corrupted member payload (CRC drift) must raise, not resync."""
    import io
    import zipfile

    import pandas as pd

    from ukis_kafka_spark.sources.jsonl import _zip_decode_batches

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("web/en/doc_00000001.txt", b"hello corpus")
    raw = bytearray(buf.getvalue())
    # flip one payload byte ('hello' is stored uncompressed-ish small;
    # flip inside the file data region after the 30-byte local header
    # + filename)
    raw[30 + len("web/en/doc_00000001.txt") + 2] ^= 0xFF
    pdf = pd.DataFrame({"content": [bytes(raw)]})
    with pytest.raises(Exception):
        list(_zip_decode_batches(iter([pdf])))
    # the intact archive decodes cleanly
    good = pd.DataFrame({"content": [buf.getvalue()]})
    out = list(_zip_decode_batches(iter([good])))[0]
    assert list(out.doc_id) == [1] and list(out.n_bytes) == [12]


def test_xml_source_kernel_is_strict(spark):
    """A wrong root element must raise; entity-escaped text must
    round-trip through the real parser."""
    import pandas as pd

    from ukis_kafka_spark.sources.jsonl import _xml_decode_batches

    bad = pd.DataFrame({"content": [b"<notcorpus></notcorpus>"]})
    with pytest.raises(ValueError):
        list(_xml_decode_batches(iter([bad])))
    xml = (
        b'<corpus><doc id="7" source="web" lang="en">'
        b"<text>a &amp;&lt;b&gt; c</text></doc></corpus>"
    )
    out = list(_xml_decode_batches(iter([pd.DataFrame({"content": [xml]})])))[0]
    assert list(out.doc_id) == [7]
    assert list(out.n_chars) == [len("a &<b> c")]
    assert list(out.n_toks) == [3]  # 'a', '&<b>', 'c' on single-space split


def test_pointer_jump_cc_randomized_against_union_find(spark):
    """30 seeded-random graphs (mixed density, including near-trees
    whose diameters exceed the old fixed-round regime) in disjoint id
    spaces, resolved in ONE Spark run and compared against a plain
    python union-find — the property check for the new primitive."""
    import random

    from ukis_kafka_spark.ml.dedup import connected_components_jump

    rng = random.Random(9)
    edges = []
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for g in range(30):
        base = g * 10_000
        n = rng.randint(2, 60)
        nodes = [base + i for i in range(n)]
        for x in nodes:
            parent[x] = x
        # near-tree density: long chains and sparse extras
        m = rng.randint(n - 1, n + 3)
        for _ in range(m):
            a, b = rng.sample(nodes, 2)
            edges.append((a, b))
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    labels, rounds = connected_components_jump(df)
    got = {r["node"]: r["component"] for r in labels.collect()}
    touched = {v for e in edges for v in e}
    want = {x: find(x) for x in touched}
    assert got == want
    assert rounds <= 12
