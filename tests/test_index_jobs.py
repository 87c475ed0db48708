"""Corpus-wide generation jobs (SURVEY C11, ``main_models.py:2981-3371``)
and the twin-tower training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mevi_tpu.config import MEVIConfig, RQConfig
from mevi_tpu.index import build as B
from mevi_tpu.ops import rq as rq_ops


@pytest.fixture(scope="module")
def small_cfg():
    cfg = MEVIConfig(rq=RQConfig(subvector_num=2, subvector_bits=2,
                                 emb_size=16))
    cfg.encoder.d_model = 16
    return cfg.finalize()


@pytest.fixture(scope="module")
def fitted(small_cfg):
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(300, 16)).astype(np.float32)
    cbs, _ = rq_ops.rq_train(jnp.asarray(emb), levels=2, kary=4, iters=6,
                             key=jax.random.PRNGKey(0))
    return emb, np.asarray(cbs)


def test_assign_with_codebooks_matches_direct(small_cfg, fitted):
    emb, cbs = fitted
    codes = B.assign_with_codebooks(small_cfg, emb, cbs, batch=128)
    direct = np.asarray(rq_ops.assign(jnp.asarray(emb), jnp.asarray(cbs),
                                      "rq", "l2"))
    np.testing.assert_array_equal(codes, direct)


def test_doc_topk_codes_top1_is_assignment(small_cfg, fitted):
    emb, cbs = fitted
    topk = B.doc_topk_codes(small_cfg, emb, cbs, topk=3, batch=128)
    assert topk.shape == (300, 3, 2)
    direct = np.asarray(rq_ops.assign(jnp.asarray(emb), jnp.asarray(cbs),
                                      "rq", "l2"))
    # beam top-1 recovers the greedy assignment for most docs (beam
    # search is near-exact at kary=4, 2 levels)
    agree = (topk[:, 0, :] == direct).all(-1).mean()
    assert agree > 0.9, agree


def test_doc_topic_proba_in_unit_interval(small_cfg, fitted):
    emb, cbs = fitted
    codes = B.assign_with_codebooks(small_cfg, emb, cbs)
    proba = B.doc_topic_proba(small_cfg, emb, cbs, codes, batch=128)
    assert proba.shape == (300,)
    assert (proba > 0).all() and (proba <= 1.0 + 1e-6).all()
    # the assigned code maximizes each level's softmax, so its product
    # probability beats a random code's for almost every doc
    rng = np.random.default_rng(1)
    rand = rng.integers(0, 4, size=codes.shape).astype(codes.dtype)
    p_rand = B.doc_topic_proba(small_cfg, emb, cbs, rand, batch=128)
    assert (proba >= p_rand - 1e-6).mean() > 0.95


def test_topic_model_scores_formula():
    q, d, s = 0.5, 0.8, 2.0
    out = B.topic_model_scores(q, d, s, topic_score_ratio=0.25)
    assert np.isclose(out, 0.5 * (0.25 * 0.8 + 0.75 * 2.0))


def test_reconstruct_leaf_centroids(small_cfg, fitted):
    emb, cbs = fitted
    # cluster index 0 -> codes (0, 0): reconstruction = sum of level-0
    # and level-1 centroid 0
    rec = B.reconstruct_leaf_centroids(small_cfg, cbs, np.array([0]))
    np.testing.assert_allclose(rec[0], cbs[0, 0] + cbs[1, 0], rtol=1e-5)


def test_twin_train_step_learns(rng):
    import optax
    from mevi_tpu.models.bert import BertDims, BertEncoderModel
    from mevi_tpu.train.trainer import (TrainState, init_state,
                                        make_twin_train_step)
    dims = BertDims(vocab_size=64, d_model=16, num_layers=1, num_heads=2,
                    d_ff=32, dropout_rate=0.0)
    tower = BertEncoderModel(dims)
    b, n_neg, L = 4, 1, 6
    qids = jnp.asarray(rng.integers(1, 64, (b, L)), jnp.int32)
    dids = jnp.asarray(rng.integers(1, 64, (b * (1 + n_neg), L)),
                       jnp.int32)
    params = tower.init(jax.random.PRNGKey(0), qids[:1],
                        jnp.ones((1, L), jnp.int32))["params"]
    opt = optax.adam(1e-3)
    state = init_state(params, opt)
    step = make_twin_train_step(tower, opt, family="bert")
    batch = {"query_ids": qids, "query_mask": jnp.ones_like(qids),
             "doc_ids": dids, "doc_mask": jnp.ones_like(dids)}
    losses = []
    for _ in range(30):
        state, m = step(state, batch)
        losses.append(float(m["co_loss"]))
    assert losses[-1] < losses[0]


def test_bucket_reference_oracles_agree(rng):
    """v2 (bounds) and fused (cidx) XLA oracles produce identical
    scores/rows for the same buckets."""
    import jax.numpy as jnp
    from mevi_tpu.ops.bucket import (bucket_scores_fused_reference,
                                     bucket_scores_v2_reference,
                                     pack_offsets_2d)
    N, D, CAP, G = 512, 16, 32, 8
    semb = jnp.asarray(rng.normal(size=(N + CAP + 8, D))
                       .astype(np.float32))
    bounds = np.sort(rng.integers(0, N, 15))
    offsets = np.concatenate([[0], bounds, [N]]).astype(np.int64)
    ci = rng.integers(0, len(offsets) - 1, G)
    off2d = jnp.asarray(pack_offsets_2d(offsets))
    s1, r1 = bucket_scores_fused_reference(
        semb, off2d, jnp.asarray(ci.astype(np.int32)),
        semb[:G], CAP)
    s2, r2 = bucket_scores_v2_reference(
        semb, jnp.asarray(offsets[ci].astype(np.int32)),
        jnp.asarray(offsets[ci + 1].astype(np.int32)), semb[:G], CAP)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)


def test_pack_offsets_2d_covers_kernel_window():
    """The fused kernel DMAs a 2*ALIGN-row window aligned down from any
    cluster's offsets row; the packer must pad so the window stays in
    bounds even for the LAST cluster id (a dense cluster-id space put
    max-cidx in the final block and read past the buffer)."""
    from mevi_tpu.ops.bucket import ALIGN, pack_offsets_2d
    for ncl in (1, 127, 128, 27_651, 128 * 2 * ALIGN - 1):
        offsets = np.arange(ncl + 1, dtype=np.int64)
        off2d = pack_offsets_2d(offsets)
        rows = off2d.shape[0]
        assert rows % (2 * ALIGN) == 0
        max_ci = ncl - 1
        arow = ((max_ci // 128) // ALIGN) * ALIGN
        assert arow + 2 * ALIGN <= rows, (ncl, rows)
        # padding value must be the terminal offset (empty buckets)
        assert off2d.reshape(-1)[ncl + 1:].max(initial=offsets[-1]) \
            == offsets[-1]


def test_bucket_v3_kernel_interpret_matches_oracle(rng):
    """The REAL v3 Pallas kernel body (serving default on TPU) against
    the XLA oracle, via the Pallas interpreter — covers the in-kernel
    align-down + validity-mask logic that the oracle tests skip."""
    import jax.numpy as jnp
    from mevi_tpu.ops.bucket import (ALIGN, ROWS, bucket_scores_v3,
                                     bucket_scores_v2_reference)
    N, D, CAP, G = 4096, 32, 64, ROWS * 3
    semb = jnp.asarray(rng.normal(size=(N + CAP + ALIGN, D))
                       .astype(np.float32))
    bounds = np.sort(rng.choice(N - 1, size=63, replace=False)) + 1
    offsets = np.concatenate([[0], bounds, [N]]).astype(np.int64)
    ci = rng.integers(0, len(offsets) - 1, G)
    st = jnp.asarray(offsets[ci].astype(np.int32))
    en = jnp.asarray(offsets[ci + 1].astype(np.int32))
    q = jnp.asarray(rng.normal(size=(G, D)).astype(np.float32))
    s_k, r_k = bucket_scores_v3(semb, st, en, q, CAP, interpret=True)
    s_o, r_o = bucket_scores_v2_reference(semb, st, en, q, CAP)
    np.testing.assert_array_equal(np.asarray(r_k), np.asarray(r_o))
    valid = np.asarray(r_k) >= 0
    np.testing.assert_allclose(np.asarray(s_k)[valid],
                               np.asarray(s_o)[valid], rtol=1e-5,
                               atol=1e-4)

def test_build_rq_index_center_last_shift_roundtrip():
    """cfg.rq.center_last: build returns the conditioning table and
    assign_with_codebooks(prefix_shift=...) reproduces the codes."""
    import dataclasses as dc
    cfg = MEVIConfig(rq=RQConfig(subvector_num=3, subvector_bits=2,
                                 emb_size=16, center_levels=True))
    cfg.encoder.d_model = 16
    cfg = cfg.finalize()
    rng = np.random.default_rng(7)
    emb = rng.normal(size=(300, 16)).astype(np.float32)
    art = B.build_rq_index(cfg, emb, iters=4)
    assert art.prefix_shift is not None
    K, M = cfg.rq.kary, cfg.rq.subvector_num
    assert [t.shape for t in art.prefix_shift] == \
        [(K ** i, cfg.rq.emb_size) for i in range(1, M)]
    re2 = B.assign_with_codebooks(cfg, emb, art.codebooks,
                                  prefix_shift=art.prefix_shift)
    np.testing.assert_array_equal(re2, art.codes)
