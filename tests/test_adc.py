"""ADC code-matrix scan vs reconstruction-score oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mevi_tpu.ops import adc, rq


def test_build_adc_codes():
    codes = np.array([[0, 2], [1, 0]], np.int32)
    oh = adc.build_adc_codes(codes, kary=3)
    assert oh.shape == (2, 6)
    assert oh[0].tolist() == [1, 0, 0, 0, 0, 1]
    assert oh[1].tolist() == [0, 1, 0, 1, 0, 0]


def test_adc_scores_equal_reconstruction_ip(rng):
    n, d, M, K = 300, 32, 4, 8
    emb = rng.normal(size=(n, d)).astype(np.float32)
    cbs, codes = rq.rq_train(jnp.asarray(emb), M, K, iters=6,
                             key=jax.random.PRNGKey(0))
    codes_h = np.asarray(codes)
    oh = adc.build_adc_codes(codes_h, K)
    q = rng.normal(size=(5, d)).astype(np.float32)

    scores, ids = adc.adc_search(jnp.asarray(q), cbs, jnp.asarray(oh),
                                 k=10, chunk=64)
    # oracle: ip between q and the RQ reconstruction
    rec = np.asarray(rq.reconstruct(codes, cbs, "rq"))
    ref = q @ rec.T
    ref_ids = np.argsort(-ref, axis=1, kind="stable")[:, :10]
    ref_scores = np.take_along_axis(ref, ref_ids, 1)
    np.testing.assert_allclose(np.asarray(scores), ref_scores,
                               rtol=2e-2, atol=1e-2)
    # ids can swap on near-ties under bf16; demand >=80% agreement
    agree = np.mean([
        len(set(a) & set(b)) / 10
        for a, b in zip(np.asarray(ids), ref_ids)])
    assert agree >= 0.8, agree


def test_adc_recall_against_exact(rng):
    """ADC top-100 should recover most of the exact-IP top-10 when the
    quantizer fits the data (clustered embeddings)."""
    n, d, M, K = 2000, 16, 2, 16
    centers = rng.normal(size=(40, d)).astype(np.float32) * 3
    emb = (centers[rng.integers(0, 40, n)]
           + 0.3 * rng.normal(size=(n, d)).astype(np.float32))
    cbs, codes = rq.rq_train(jnp.asarray(emb), M, K, iters=10,
                             key=jax.random.PRNGKey(1))
    oh = adc.build_adc_codes(np.asarray(codes), K)
    q = emb[:8] + 0.1 * rng.normal(size=(8, d)).astype(np.float32)

    _, adc_ids = adc.adc_search(jnp.asarray(q), cbs, jnp.asarray(oh),
                                k=100, chunk=512)
    exact = q @ emb.T
    exact_top10 = np.argsort(-exact, 1)[:, :10]
    recall = np.mean([
        len(set(np.asarray(adc_ids)[i]) & set(exact_top10[i])) / 10
        for i in range(8)])
    assert recall > 0.6, recall


def test_fill_onehot_matrix_matches_host(rng):
    codes = rng.integers(0, 5, size=(37, 3)).astype(np.int32)
    dev = adc.fill_onehot_matrix(codes, kary=5, chunk=8)
    host = adc.build_adc_codes(codes, kary=5)
    got = np.asarray(dev)
    assert got.shape[0] == 40 and got.shape[1] == 15   # padded to chunk
    np.testing.assert_array_equal(got[:37], host)
    assert (got[37:] == 0).all()                       # pad rows: no code


def test_fill_onehot_matrix_searchable(rng):
    n, d, M, K = 200, 16, 2, 4
    emb = rng.normal(size=(n, d)).astype(np.float32)
    cbs, codes = rq.rq_train(jnp.asarray(emb), M, K, iters=4,
                             key=jax.random.PRNGKey(2))
    oh = adc.fill_onehot_matrix(np.asarray(codes), K, chunk=64)
    q = rng.normal(size=(3, d)).astype(np.float32)
    s1, i1 = adc.adc_search(jnp.asarray(q), cbs, oh, k=8, chunk=64)
    s2, i2 = adc.adc_search(jnp.asarray(q), cbs,
                            jnp.asarray(adc.build_adc_codes(
                                np.asarray(codes), K)), k=8, chunk=64)
    # same top-k scores; ids may tie-swap within equal scores
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
