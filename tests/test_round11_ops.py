"""Independent re-derivation tests for the round-11 additions
(facility-location coreset, grad-accum plan + streaming twin, bigram
Gini, Delta-log snapshot reader, UCB allocation, AMS F2 sketch).

The oracle gate proves *engine parity*; these tests prove the shared
formulation against plain Python / numpy re-implementations of the
algorithm definitions (the both-engines-wrong-the-same-way guard)."""

from __future__ import annotations

import collections
import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE
from ukis_kafka_spark import api


def _rows(spark, name, sf=SF_SMOKE):
    return api.queries()[name](spark, sf).collect()


def _docs(spark):
    from ukis_kafka_spark.sources import load_table

    return load_table(spark, SF_SMOKE, "documents").collect()


def _events(spark):
    from ukis_kafka_spark.sources import load_table

    return load_table(spark, SF_SMOKE, "events").collect()


def _emb(spark):
    from ukis_kafka_spark.sources import load_table

    return load_table(spark, SF_SMOKE, "embeddings").collect()


def test_facility_select_matches_numpy_greedy(spark):
    """Full greedy re-run in numpy from the raw embeddings: candidate
    seeding, micro-cosine quantization, 6 greedy argmax rounds and the
    running coverage total must all reproduce."""
    from ukis_kafka_spark.ml.similarity import (
        _FAC_CANDS,
        _FAC_K,
        _IVF_HASH_A,
        _IVF_HASH_P,
    )

    rows = _emb(spark)
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    M = np.floor(
        np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows]) * 10000
    ).astype(np.int64)
    order = np.lexsort((ids, (ids * _IVF_HASH_A) % _IVF_HASH_P))[:_FAC_CANDS]
    cand_ids = ids[order]
    C = M[order]
    mn = np.sqrt((M * M).sum(axis=1).astype(np.float64))
    cn = np.sqrt((C * C).sum(axis=1).astype(np.float64))
    uc = np.floor((M @ C.T).astype(np.float64) / np.outer(mn, cn) * 1e6).astype(
        np.int64
    )
    best = np.zeros(len(ids), dtype=np.int64)
    picked: list[int] = []
    expect = []
    covered = 0
    for r in range(1, _FAC_K + 1):
        gains = np.maximum(uc - best[:, None], 0).sum(axis=0)
        pick = max(
            (i for i in range(_FAC_CANDS) if i not in picked),
            key=lambda i: (gains[i], -cand_ids[i]),
        )
        picked.append(pick)
        covered += int(gains[pick])
        expect.append((r, int(cand_ids[pick]), int(gains[pick]), covered))
        best = np.maximum(best, uc[:, pick])
    got = sorted(
        (r.round, r.picked, r.gain, r.covered)
        for r in _rows(spark, "m_facility_select")
    )
    assert got == expect
    # greedy sanity: gains non-increasing, coverage strictly growing
    gains_seq = [g for _, _, g, _ in expect]
    assert gains_seq == sorted(gains_seq, reverse=True)
    assert all(g > 0 for g in gains_seq)
    assert len({p for _, p, _, _ in expect}) == _FAC_K


def test_grad_accum_plan_matches_pandas(spark):
    from ukis_kafka_spark.ml.chunking import _ACCUM_TOKENS

    docs = sorted(_docs(spark), key=lambda r: r.doc_id)
    steps = collections.defaultdict(lambda: [0, 0, None, None])
    cum = 0
    for r in docs:
        n = len(r.text.split(" "))
        s = cum // _ACCUM_TOKENS
        st = steps[s]
        st[0] += 1
        st[1] += n
        st[2] = r.doc_id if st[2] is None else st[2]
        st[3] = r.doc_id
        cum += n
    got = {r.step_id: r for r in _rows(spark, "m_grad_accum_plan")}
    assert set(got) == set(steps)
    for s, (nd, tok, first, last) in steps.items():
        r = got[s]
        assert (r.n_docs, r.step_tokens, r.first_doc, r.last_doc) == (
            nd,
            tok,
            first,
            last,
        )
        assert r.fill_ppm == tok * 1_000_000 // _ACCUM_TOKENS
    # the boundary rule must actually fire: some step exceeds budget
    assert any(r.fill_ppm > 1_000_000 for r in got.values())
    assert any(r.fill_ppm < 1_000_000 for r in got.values())


def test_ngram_gini_matches_python(spark):
    freqs = collections.defaultdict(collections.Counter)
    for r in _docs(spark):
        tk = r.text.split(" ")
        for a, b in zip(tk, tk[1:]):
            freqs[r.lang][a + " " + b] += 1
    got = {r.lang: r for r in _rows(spark, "m_ngram_gini")}
    assert set(got) == set(freqs)
    n_types_seen = set()
    for lang, c in freqs.items():
        items = sorted(c.items(), key=lambda kv: (kv[1], kv[0]))
        n = len(items)
        tot = sum(c.values())
        num = 2 * sum(i * f for i, (_, f) in enumerate(items, start=1)) - (
            n + 1
        ) * tot
        r = got[lang]
        assert (r.n_types, r.ngram_total) == (n, tot)
        assert r.gini_ppm == num * 1_000_000 // (n * tot)
        n_types_seen.add(n)
    # the bigram re-scope's point: type counts genuinely vary by lang
    assert len(n_types_seen) > 1


def test_delta_log_versions_match_residue_filter(spark):
    live_residues = {0: {0, 1}, 1: {0, 2}, 2: {0, 2, 3}}
    expect = collections.defaultdict(lambda: [0, 0, 0])
    for r in _docs(spark):
        for v, residues in live_residues.items():
            if r.doc_id % 4 in residues:
                st = expect[(v, r.lang)]
                st[0] += 1
                st[1] += r.doc_id
                st[2] += len(r.text.split(" "))
    got = {(r.version, r.lang): r for r in _rows(spark, "src_delta_log")}
    assert set(got) == set(expect)
    for k, (nd, idm, tok) in expect.items():
        assert (got[k].n_docs, got[k].id_mass, got[k].tok_mass) == (nd, idm, tok)
    # the remove action must be visible: version 1 swapped slice B
    # (doc_id%4==1) for C (%4==2) — same SIZE, different id mass, so
    # the count is blind to the remove but the mass is not
    v0 = sum(r.id_mass for r in got.values() if r.version == 0)
    v1 = sum(r.id_mass for r in got.values() if r.version == 1)
    assert v1 != v0


def test_bandit_ucb_matches_numpy(spark):
    stats = collections.defaultdict(lambda: [0, 0])
    for r in _docs(spark):
        st = stats[r.lang]
        st[0] += 1
        st[1] += len(r.text.split(" ")) >= 60
    scores = {
        lang: w / n + 2.0 / math.sqrt(n) for lang, (n, w) in stats.items()
    }
    best = max(scores, key=lambda l: scores[l])
    got = {r.lang: r for r in _rows(spark, "m_bandit_ucb")}
    assert set(got) == set(stats)
    for lang, (n, w) in stats.items():
        r = got[lang]
        assert (r.n_docs, r.n_pass) == (n, w)
        assert r.ucb_score == scores[lang]  # bit-exact: IEEE-only ops
        assert r.is_next == (1 if lang == best else 0)
    assert sum(r.is_next for r in got.values()) == 1
    # partial firing at smoke scale too
    assert all(0 < w < n for n, w in stats.values())


def test_ams_f2_matches_python_md5(spark):
    from ukis_kafka_spark.ml.sketch import _AMS_ROWS

    freqs = collections.defaultdict(collections.Counter)
    for r in _docs(spark):
        for t in r.text.split(" "):
            freqs[r.lang][t] += 1
    got = {(r.lang, r.r): r for r in _rows(spark, "m_ams_f2")}
    assert len(got) == len(freqs) * _AMS_ROWS
    for lang, c in freqs.items():
        exact = sum(f * f for f in c.values())
        for rr in range(_AMS_ROWS):
            s = 0
            for tok, f in c.items():
                h = hashlib.md5(f"{tok}:{rr}".encode()).hexdigest()[0]
                s += f if h in "13579bdf" else -f
            row = got[(lang, rr)]
            assert (row.s_signed, row.f2_exact) == (s, exact)
            assert row.f2_est == s * s
            assert row.err_ppm == abs(s * s - exact) // max(exact // 1_000_000, 1)
    # the estimator is actually informative at smoke scale: the median
    # estimate lands within 2x of exact for every lang
    for lang, c in freqs.items():
        exact = sum(f * f for f in c.values())
        ests = sorted(got[(lang, rr)].f2_est for rr in range(_AMS_ROWS))
        med = (ests[_AMS_ROWS // 2 - 1] + ests[_AMS_ROWS // 2]) // 2
        assert 0 < med < 4 * exact


def test_grad_accum_stream_matches_batch_rederivation(spark):
    """The streaming kernel's closed/open-step accounting re-derived
    in pandas over the same events, ordered by event_id per user —
    chunking must not matter (the monotone-max finalization rule), so
    the batch re-derivation IS the expected final table."""
    from ukis_kafka_spark.streaming.jobs import _SGA_BUDGET

    per_user = collections.defaultdict(list)
    for r in _events(spark):
        per_user[r.user_id].append((r.event_id, int(math.floor(r.value))))
    expect = {}
    for uid, evs in per_user.items():
        evs.sort()
        cum = 0
        for _, v in evs:
            s = cum // _SGA_BUDGET
            k = (uid, s)
            n, m = expect.get(k, (0, 0))
            expect[k] = (n + 1, m + v)
            cum += v
    got = {(r.user_id, r.step_id): (r.n_events, r.step_mass)
           for r in _rows(spark, "s_grad_accum_stream")}
    assert got == expect
    # >= 3 steps per user at smoke scale (measured corpus fact)
    per_user_steps = collections.Counter(uid for uid, _ in expect)
    assert min(per_user_steps.values()) >= 3
