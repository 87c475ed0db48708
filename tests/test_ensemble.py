"""Ensemble fusion vs a literal transcription of ensemble_marco.py."""

from itertools import chain

import numpy as np
import pytest

from mevi_tpu.eval import ensemble as E
from mevi_tpu.eval.metrics import evaluate_scores


def reference_combine(gts, ance_preds, ance_scores, coarse_clusters,
                      mapping, alpha, beta, gamma,
                      fine_preds=None, fine_scores=None):
    # literal port of ensemble_marco.py:176-238 (test oracle only)
    num_clusters = None
    cluster_rankings_gt = {}
    for q, apreds in ance_preds.items():
        cr = {}
        for i, clus in enumerate(coarse_clusters[q]):
            cr[tuple(clus)] = i
        num_clusters = len(cr)
        cluster_rankings_gt[q] = [
            cr.get(mapping[p] if p != -1 else -1, len(cr)) for p in apreds]
    cluster_rankings_fine = {}
    if fine_preds is not None:
        for q, apreds in fine_preds.items():
            cr = {}
            for i, clus in enumerate(coarse_clusters[q]):
                cr[tuple(clus)] = i
            cluster_rankings_fine[q] = [
                cr.get(mapping[p] if p != -1 else -1, len(cr))
                for p in apreds]
    scores = {q: {} for q in gts}
    for q, apreds in ance_preds.items():
        ascores = ance_scores[q]
        cluster_ranking = cluster_rankings_gt[q]
        if fine_preds is not None:
            apreds = apreds + fine_preds[q]
            ascores = ascores + fine_scores[q]
            cluster_ranking = chain(cluster_ranking,
                                    cluster_rankings_fine[q])
        for p, s, crank in zip(apreds, ascores, cluster_ranking):
            scores[q][p] = s + alpha / (beta * crank + 1)
            if crank == num_clusters:
                scores[q][p] *= (1 - gamma * alpha)
    return scores


@pytest.fixture()
def problem(rng):
    kary, M, nb, ndoc = 4, 2, 3, 60
    mapping = {i: tuple(rng.integers(0, kary, M).tolist())
               for i in range(ndoc)}
    queries = [f"q{i}" for i in range(8)]
    gts = {q: rng.choice(ndoc, 2, replace=False).tolist() for q in queries}
    ance_preds = {q: rng.choice(ndoc, 10, replace=False).tolist()
                  for q in queries}
    ance_scores = {q: sorted(rng.normal(size=10).tolist(), reverse=True)
                   for q in queries}
    coarse = {q: [rng.integers(0, kary, M).tolist() for _ in range(nb)]
              for q in queries}
    fine_preds = {q: rng.choice(ndoc, 5, replace=False).tolist()
                  for q in queries}
    fine_scores = {q: sorted(rng.normal(size=5).tolist(), reverse=True)
                   for q in queries}
    return (gts, ance_preds, ance_scores, coarse, mapping, fine_preds,
            fine_scores)


def test_fusion_matches_reference(problem):
    (gts, ance_preds, ance_scores, coarse, mapping, fine_preds,
     fine_scores) = problem
    a, b, g = 0.6, 0.03, 0.02
    cranks, nclus = E.cluster_rankings(ance_preds, coarse, mapping)
    cranks_f, _ = E.cluster_rankings(fine_preds, coarse, mapping)
    ours = E.fuse_scores(ance_preds, ance_scores, cranks, nclus, a, b, g,
                         fine_preds, fine_scores, cranks_f)
    ref = reference_combine(gts, ance_preds, ance_scores, coarse, mapping,
                            a, b, g, fine_preds, fine_scores)
    assert set(ours) == set(ref)
    for q in ours:
        assert set(ours[q]) == set(ref[q])
        for p in ours[q]:
            assert ours[q][p] == pytest.approx(ref[q][p])


def test_run_ensemble_grid(problem):
    (gts, ance_preds, ance_scores, coarse, mapping, fine_preds,
     fine_scores) = problem
    res = E.run_ensemble(gts, ance_preds, ance_scores, coarse, mapping,
                         fine_preds, fine_scores,
                         alphas=(0.6, 0.3), recall_ks=(1, 10))
    assert len(res) == 2
    for metrics in res.values():
        assert 0 <= metrics["recall"][10] <= 1


def test_answer_index_roundtrip():
    idx = E.AnswerIndex.from_answer_sets([[0, 3], [], [1]])
    assert idx.doc_answers_query(0, 3)
    assert not idx.doc_answers_query(1, 0)
    assert idx.first_hit_rank(1, [0, 1, 2]) == 2
    assert idx.first_hit_rank(9, [0, 1, 2]) is None


def test_nq_hit_metrics():
    idx = E.AnswerIndex.from_answer_sets([[0], [1], [1]])
    m = E.nq_hit_metrics(idx, [0, 1], [[2, 0], [1, 2]], (1, 2))
    # q0: first hit rank 1; q1: rank 0
    assert m["hitrate"][1] == pytest.approx(0.5)
    assert m["hitrate"][2] == pytest.approx(1.0)
    assert m["mrr"][2] == pytest.approx((0.5 + 1.0) / 2)


def test_first_hit_ranks_query_index_beyond_array_max():
    """A probe query index larger than any index stored in the answer
    array must NOT alias into the next doc's composite-key range
    (advisor round-3 medium finding)."""
    idx = E.AnswerIndex.from_answer_sets([[0], [1]])
    got = idx.first_hit_ranks(np.asarray([4]), np.asarray([[0, 1]]))
    assert got[0] == -1
    # and the scalar path that delegates here
    assert idx.first_hit_rank(4, [0, 1]) is None
    # keys rebuild on stride growth without breaking true hits
    assert idx.first_hit_ranks(np.asarray([1]),
                               np.asarray([[0, 1]]))[0] == 1


def test_first_hit_ranks_batched_matches_scalar(rng):
    """Vectorized searchsorted first-hit == the per-rank python walk."""
    n_docs, n_q = 50, 30
    doc_answers = [sorted(set(rng.integers(0, n_q,
                                           rng.integers(0, 5)).tolist()))
                   for _ in range(n_docs)]
    idx = E.AnswerIndex.from_answer_sets(doc_answers)
    B, P = 16, 12
    ranked = rng.integers(-1, n_docs, size=(B, P)).astype(np.int64)
    qinds = rng.integers(0, n_q, size=B)
    got = idx.first_hit_ranks(qinds, ranked)
    for b in range(B):
        want = None
        for j, d in enumerate(ranked[b]):
            if d >= 0 and int(qinds[b]) in doc_answers[int(d)]:
                want = j
                break
        assert got[b] == (-1 if want is None else want), b


def test_rrf_fuse_ranks_consensus_docs_first():
    from mevi_tpu.eval.ensemble import rrf_fuse
    a = {"q": [1, 2, 3]}
    b = {"q": [2, 9, 1]}
    fused = rrf_fuse([a, b], k=10)["q"]
    order = sorted(fused, key=lambda d: -fused[d])
    # doc 2 (ranks 2,1) and doc 1 (ranks 1,3) beat single-leg docs
    assert order[0] in (1, 2) and order[1] in (1, 2)
    assert set(order[:2]) == {1, 2}
    assert fused[2] == 1.0 / 12 + 1.0 / 11
    # missing query in one leg: still fused from the other
    c = rrf_fuse([{"q2": [5]}, {}], k=10)
    assert c["q2"] == {5: 1.0 / 11}
