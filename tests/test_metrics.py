"""Metric math vs a literal transcription of the reference formulas
(``MEVI/evaluate.py:7-24``)."""

import numpy as np
import pytest

from mevi_tpu.eval import metrics as M


def ref_get_metric(v, recalls, mrrs, hitrates):
    # literal port of evaluate.py:7-24 used only as a test oracle
    v_valid = [vv for vv in v if vv is not None]
    min_valid = min(v_valid) if len(v_valid) > 0 else None
    for recnum in recalls:
        if len(v_valid) > 0:
            cur_recall = sum([vv < recnum for vv in v_valid]) / len(v)
            cur_mrr = 1 / (min_valid + 1) if min_valid < recnum else 0
            cur_hit = (min_valid < recnum)
        else:
            cur_recall = 0
            cur_mrr = 0
            cur_hit = 0
        recalls[recnum] += cur_recall
        mrrs[recnum] += cur_mrr
        hitrates[recnum] += cur_hit
    return v_valid, min_valid


def ref_evaluate(gts, ranks, recall_num):
    recalls = {r: 0 for r in recall_num}
    mrrs = {m: 0 for m in recall_num}
    hitrates = {h: 0 for h in recall_num}
    for q in gts:
        preds = ranks[q]
        gt = gts[q]
        vs = [preds.index(g) if g in preds else None for g in gt]
        ref_get_metric(vs, recalls, mrrs, hitrates)
    n = len(gts)
    for k in recalls:
        recalls[k] /= n
        mrrs[k] /= n
        hitrates[k] /= n
    return recalls, mrrs, hitrates


def random_case(rng, nq=40, pool=50, max_gt=4, vocab=200):
    gts, preds = {}, {}
    for i in range(nq):
        q = f"q{i}"
        n_gt = rng.integers(1, max_gt + 1)
        gts[q] = rng.choice(vocab, size=n_gt, replace=False).tolist()
        preds[q] = rng.choice(vocab, size=pool, replace=False).tolist()
    return gts, preds


def test_evaluate_ranks_matches_reference(rng):
    gts, preds = random_case(rng)
    ks = (1, 5, 10, 20, 50)
    ours = M.evaluate_ranks(gts, preds, ks)
    ref_r, ref_m, ref_h = ref_evaluate(gts, preds, ks)
    for k in ks:
        assert ours["recall"][k] == pytest.approx(ref_r[k])
        assert ours["mrr"][k] == pytest.approx(ref_m[k])
        assert ours["hitrate"][k] == pytest.approx(ref_h[k])


def test_rank_matrix_path_matches_dict_path(rng):
    gts, preds = random_case(rng, nq=25)
    ks = (1, 5, 10, 50)
    ours = M.evaluate_ranks(gts, preds, ks)

    max_gt = max(len(g) for g in gts.values())
    qs = list(gts)
    gt_ids = np.full((len(qs), max_gt), -1, np.int64)
    pred_ids = np.stack([np.array(preds[q]) for q in qs])
    counts = np.array([len(gts[q]) for q in qs])
    for i, q in enumerate(qs):
        gt_ids[i, :len(gts[q])] = gts[q]
    ranks = M.ranks_of_gts(pred_ids, gt_ids)
    vec = M.metrics_from_rank_matrix(ranks, counts, ks)
    for k in ks:
        for name in ("recall", "mrr", "hitrate"):
            assert vec[name][k] == pytest.approx(ours[name][k])


def test_evaluate_scores_sorts_descending():
    gts = {"q": [7]}
    scores = {"q": {3: 0.2, 7: 0.9, 5: 0.5}}
    out = M.evaluate_scores(gts, scores, (1, 2))
    assert out["recall"][1] == 1.0
    assert out["mrr"][1] == 1.0


def test_empty_hits_counts_zero():
    gts = {"q": [1, 2]}
    preds = {"q": [5, 6, 7]}
    out = M.evaluate_ranks(gts, preds, (5,))
    assert out["recall"][5] == 0.0
    assert out["mrr"][5] == 0.0
    assert out["hitrate"][5] == 0.0


def test_multi_gt_partial_recall():
    # 2 of 3 gts inside top-5: recall@5 = 2/3 regardless of pool size
    gts = {"q": [1, 2, 3]}
    preds = {"q": [1, 9, 2, 8, 7, 3]}
    out = M.evaluate_ranks(gts, preds, (5, 10))
    assert out["recall"][5] == pytest.approx(2 / 3)
    assert out["recall"][10] == pytest.approx(1.0)
    assert out["mrr"][5] == pytest.approx(1.0)
