"""End-to-end LLM training-data pipeline on this engine: the chain a
data team runs between "raw crawl" and "tokens on GPUs", composed
entirely from registry operators (each one individually
oracle-hash-checked; see SURVEY.md §2.3).

    python examples/llm_data_pipeline.py [sf_dir]

Stages:
1. profile  — corpus card + Zipf health + language mix
2. dedup    — MinHash pairs → clusters → survivorship → APPLY
3. curate   — quality-weighted sampling + benchmark decontamination
4. mix      — temperature-scaled lang weights + epoch-cap waterfill
5. pretrain — span-corruption pairs + fixed-context packing
6. eval     — k-fold + purged temporal splits, kNN + matryoshka audits
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from ukis_kafka_spark import api  # noqa: E402
from ukis_kafka_spark.plans import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("llm-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    q = api.queries()

    def run(name: str):
        return q[name](spark, sf_dir)

    print(f"== 1. profile ({sf_dir})")
    card = run("m_corpus_stats").collect()[0]
    print(f"   docs={card.n_docs} tokens={card.total_tokens} "
          f"exact_dups={card.n_exact_dups} langs={card.n_langs}")
    zipf = run("m_zipf_stats").collect()[0]
    print(f"   types={zipf.n_types} hapax={zipf.n_hapax} "
          f"top-decile share={zipf.top_decile_ppm / 10000:.1f}%")

    print("== 2. dedup")
    applied = {r.lang: r for r in run("m_apply_dedup").collect()}
    kept = sum(r.n_docs_out for r in applied.values())
    total = sum(r.n_docs_in for r in applied.values())
    print(f"   near-dup resolution keeps {kept}/{total} docs")
    surv = run("m_dedup_survivorship").collect()
    dropped = sum(r.dropped_chars for r in surv)
    print(f"   survivorship over {len(surv)} clusters: richest-record "
          f"policy drops {dropped} chars of near-dup mass")

    print("== 3. curate")
    qs = {r.lang: r for r in run("m_quality_sample").collect()}
    print("   quality-weighted keep rates: "
          + ", ".join(f"{lang}={r.n_kept}/{r.n_docs}" for lang, r in sorted(qs.items())))
    decon = run("m_decontaminate").count()
    print(f"   decontamination: {decon} clean docs")

    print("== 4. mix")
    # m_temperature_mix was re-keyed source -> lang in round 6 (sources
    # are round-robin uniform in this corpus; langs are the skewed key)
    for r in sorted(run("m_temperature_mix").collect(), key=lambda r: r.lang):
        print(f"   {r.lang}: n={r.n_docs} share={r.share_ppm / 10000:.2f}%")
    for r in sorted(run("m_epoch_cap_mix").collect(), key=lambda r: r.lang):
        tag = "CAPPED" if r.capped else "uncapped"
        print(f"   epoch-cap: {r.lang} alloc={r.alloc_docs} "
              f"({r.epochs_ppm / 10000:.2f}% epochs, {tag})")

    print("== 5. pretrain transforms")
    span = run("m_span_corruption")
    n_pairs = span.count()
    n_masked = span.agg({"n_masked": "sum"}).collect()[0][0]
    print(f"   span-corruption pairs: {n_pairs} (masked tokens: {n_masked})")
    packs = run("m_seq_pack").count()
    print(f"   packed context windows: {packs}")

    print("== 6. eval readiness")
    folds = run("m_crossval_folds").groupBy("fold").sum("n").collect()
    print(f"   folds: {sorted((r[0], r[1]) for r in folds)}")
    acc = run("m_knn_eval").collect()
    n_t = sum(r.n_test for r in acc)
    n_c = sum(r.n_correct for r in acc)
    print(f"   kNN label audit: {n_c}/{n_t} consistent")
    emb = run("m_train_val_embargo").collect()[0]
    print(f"   purged temporal split: {emb.n_train} train / {emb.n_val} val, "
          f"{emb.n_embargoed} embargoed, {emb.n_users_both} users on both sides")
    bo = run("m_backoff_lm").collect()
    n_pos = sum(r.n_scored for r in bo)
    n_bk = sum(r.n_bigram_backoffs + r.n_unigram_floors for r in bo)
    avg = sum(r.avg_microbits for r in bo) / (1e6 * len(bo))
    print(f"   held-out stupid-backoff LM: {len(bo)} val docs, "
          f"{n_bk}/{n_pos} positions backed off, ~{avg:.2f} bits/token")
    mat = run("m_matryoshka_recall").collect()
    hits = sum(r.n_hits for r in mat)
    print(f"   matryoshka audit: 16/64-dim prefix keeps {hits}/{5 * len(mat)} "
          f"of exact top-5 neighbors")

    print("== 7. round-8 additions: smoothing family, schedules, routing")
    kn = run("m_kneser_ney_lm").collect()
    jm = run("m_jm_interp_lm").collect()
    kn_avg = sum(r.avg_microbits for r in kn) / (1e6 * len(kn))
    jm_avg = sum(r.avg_microbits for r in jm) / (1e6 * len(jm))
    print(f"   held-out bits/token — Kneser-Ney {kn_avg:.2f} vs "
          f"Jelinek-Mercer {jm_avg:.2f} ({len(kn)} val docs)")
    lr = sorted(run("m_lr_schedule").collect(), key=lambda r: r.step)
    peak = max(r.lr_u for r in lr)
    print(f"   LR schedule: {len(lr)} checkpoints over {lr[-1].step} steps, "
          f"peak {peak / 1e6:.2f}, final {lr[-1].lr_u / 1e6:.3f}")
    moe = sorted(run("m_moe_balance").collect(), key=lambda r: r.expert)
    loads = "/".join(str(r.load_ppm // 1000) for r in moe)
    aux = sum(r.loss_contrib_micro for r in moe) / 1e6
    print(f"   MoE hash-router loads (permille): {loads}, aux loss {aux:.3f}")
    jsd = run("m_jsd_matrix").collect()
    worst = max(jsd, key=lambda r: r.jsd2x_ubits)
    print(f"   most divergent lang pair: {worst.lang_a}/{worst.lang_b} "
          f"(JSD {worst.jsd2x_ubits / 2e6:.4f} bits)")
    wil = sorted(run("m_wilson_bounds").collect(), key=lambda r: r.lang)
    w0 = wil[0]
    print(f"   length-gate pass rate ({w0.lang}): "
          f"{w0.p_hat_ppm / 1e4:.1f}% in [{w0.wilson_lo_ppm / 1e4:.1f}, "
          f"{w0.wilson_hi_ppm / 1e4:.1f}] (Wilson z=2)")
    print("done.")


if __name__ == "__main__":
    main()
