"""RQ assignment / reconstruction / beam search vs numpy oracles that
literally transcribe the reference semantics (``MEVI/pq.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mevi_tpu.ops import rq


def np_scores(a, b, dist_mode):
    # pq.py:124-131
    if dist_mode == "ip":
        return (a * b).sum(-1)
    return -((a - b) ** 2).sum(-1)


def np_rq_assign(emb, codebooks, dist_mode="l2"):
    # literal port of get_rq_document_cluster (pq.py:281-305)
    emb = emb.copy().astype(np.float64)
    M = codebooks.shape[0]
    codes = np.zeros((emb.shape[0], M), np.int32)
    for j in range(M):
        cb = codebooks[j].astype(np.float64)
        s = np_scores(emb[:, None, :], cb[None, :, :], dist_mode)
        idx = s.argmax(-1)
        codes[:, j] = idx
        emb -= cb[idx]
    return codes


def np_rq_beam(emb, codebooks, B, dist_mode="l2"):
    # literal port of pq.beam_search (pq.py:613-713), rq + 'prod'
    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    n = emb.shape[0]
    M, K, d = codebooks.shape
    cb = codebooks.astype(np.float64)
    temp = emb.astype(np.float64)[:, None, :]     # (n, beams, d)
    scores = np.ones((n, 1))
    codes = np.zeros((n, 1, 0), np.int32)
    for i in range(M):
        s = np_scores(temp[:, :, None, :], cb[i][None, None, :, :],
                      dist_mode)                  # (n, nb, K)
        p = softmax(s)
        p = scores[:, :, None] * p
        flat = p.reshape(n, -1)
        nb = scores.shape[1]
        if B < flat.shape[1]:
            top = np.argsort(-flat, axis=1, kind="stable")[:, :B]
            prev = top // K
            code = top % K
            scores = np.take_along_axis(flat, top, 1)
            codes = np.concatenate(
                [np.take_along_axis(codes, prev[:, :, None], 1),
                 code[:, :, None].astype(np.int32)], axis=2)
            if i != M - 1:
                temp = (np.take_along_axis(temp, prev[:, :, None], 1)
                        - cb[i][code])
        else:
            scores = flat
            codes = np.concatenate(
                [np.repeat(codes, K, axis=1),
                 np.tile(np.arange(K, dtype=np.int32),
                         nb)[None, :, None].repeat(n, 0)], axis=2)
            if i != M - 1:
                temp = np.repeat(temp, K, axis=1) - cb[i][
                    np.tile(np.arange(K), nb)][None]
    return codes, scores


@pytest.fixture()
def setup(rng):
    emb = rng.normal(size=(200, 16)).astype(np.float32)
    codebooks = rng.normal(size=(3, 8, 16)).astype(np.float32)
    return emb, codebooks


@pytest.mark.parametrize("dist_mode", ["l2", "ip"])
def test_rq_assign_matches_reference(setup, dist_mode):
    emb, codebooks = setup
    codes = np.array(rq.assign(jnp.array(emb), jnp.array(codebooks),
                               "rq", dist_mode))
    ref = np_rq_assign(emb, codebooks, dist_mode)
    assert (codes == ref).all()


def test_pq_assign_matches_reference(rng):
    emb = rng.normal(size=(100, 16)).astype(np.float32)
    codebooks = rng.normal(size=(4, 8, 4)).astype(np.float32)  # 4 subvecs of d=4
    codes = np.array(rq.assign(jnp.array(emb), jnp.array(codebooks),
                               "pq", "l2"))
    for j in range(4):
        sub = emb[:, j * 4:(j + 1) * 4]
        ref = ((sub[:, None] - codebooks[j][None]) ** 2).sum(-1).argmin(1)
        assert (codes[:, j] == ref).all()


def test_reconstruct_rq(setup):
    emb, codebooks = setup
    codes = rq.assign(jnp.array(emb), jnp.array(codebooks), "rq", "l2")
    rec = np.array(rq.reconstruct(codes, jnp.array(codebooks), "rq"))
    codes = np.array(codes)
    ref = sum(codebooks[j][codes[:, j]] for j in range(3))
    np.testing.assert_allclose(rec, ref, rtol=1e-5)


def test_rq_train_reduces_mse(rng):
    emb = rng.normal(size=(1000, 16)).astype(np.float32)
    cbs, codes = rq.rq_train(jnp.array(emb), levels=3, kary=16, iters=10,
                             key=jax.random.PRNGKey(0), chunk=256)
    mse = float(rq.reconstruction_mse(jnp.array(emb), codes, cbs))
    var = float(emb.var())
    # 3 levels x 16 centroids must explain a decent chunk of variance
    assert mse < 0.8 * var, (mse, var)
    # codes produced during training match fresh assignment
    fresh = np.array(rq.assign(jnp.array(emb), cbs, "rq", "l2"))
    assert (np.array(codes) == fresh).all()


@pytest.mark.parametrize("B", [2, 5])
def test_beam_search_matches_reference(setup, B):
    emb, codebooks = setup
    emb = emb[:20]
    codes, scores = rq.beam_search(jnp.array(emb), jnp.array(codebooks),
                                   num_beams=B)
    ref_codes, ref_scores = np_rq_beam(emb, codebooks, B)
    np.testing.assert_allclose(np.array(scores), ref_scores, rtol=1e-4)
    assert (np.array(codes) == ref_codes).all()


def test_beam_top1_equals_assign(setup):
    emb, codebooks = setup
    codes, _ = rq.beam_search(jnp.array(emb), jnp.array(codebooks),
                              num_beams=1)
    greedy = rq.assign(jnp.array(emb), jnp.array(codebooks), "rq", "l2")
    assert (np.array(codes)[:, 0, :] == np.array(greedy)).all()


def test_ema_update_moves_codebook(rng):
    codebooks = jnp.array(rng.normal(size=(2, 4, 8)).astype(np.float32))
    state = rq.ema_init(codebooks)
    vecs = jnp.array(rng.normal(size=(64, 8)).astype(np.float32))
    codes = rq.assign(vecs, codebooks, "rq", "l2")
    state2, new_cb = rq.ema_update(state, codebooks, vecs, codes,
                                   jax.random.PRNGKey(0))
    assert np.isfinite(np.array(new_cb)).all()
    assert not np.allclose(np.array(new_cb), np.array(codebooks))
    # sizes accumulated
    assert float(jnp.sum(state2.cluster_size)) > 0


def test_align_codebooks_identity_permutation(rng):
    old = rng.normal(size=(2, 6, 8))
    perm = rng.permutation(6)
    new = old[:, perm, :]
    aligned = rq.align_codebooks(old, new)
    np.testing.assert_allclose(aligned, old, rtol=1e-6)


def test_opq_beats_pq_on_rotated_data(rng):
    """OPQ recovers a rotation that plain PQ cannot: data lives in
    correlated coordinates; after the learned rotation the per-subvector
    quantizers fit far better."""
    n, d, M, K = 2000, 16, 4, 8
    # independent low-variance subspaces, then a random rotation mixes them
    z = rng.normal(size=(n, d)).astype(np.float32)
    z[:, d // 2:] *= 0.05          # second half nearly deterministic
    q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    x = (z @ q.T).astype(np.float32)

    cbs_pq, codes_pq = rq.rq_train(jnp.asarray(x), M, K, iters=8,
                                   key=jax.random.PRNGKey(0),
                                   pq_type="pq")
    rec_pq = np.asarray(rq.reconstruct(codes_pq, cbs_pq, "pq"))
    mse_pq = ((x - rec_pq) ** 2).mean()

    R, cbs, codes = rq.opq_train(jnp.asarray(x), M, K, iters=8,
                                 inner_iters=8,
                                 key=jax.random.PRNGKey(0))
    rec_rot = np.asarray(rq.reconstruct(jnp.asarray(codes),
                                        jnp.asarray(cbs), "pq"))
    # back to original space: x_hat = rec_rot @ R (inverse of x @ R.T)
    rec = rec_rot @ R
    mse_opq = ((x - rec) ** 2).mean()
    assert mse_opq < mse_pq * 0.9, (mse_opq, mse_pq)
    # rotation is orthogonal
    np.testing.assert_allclose(R @ R.T, np.eye(16), atol=1e-4)
    # codes match fresh assignment of rotated vectors
    fresh = np.asarray(rq.assign(jnp.asarray(x @ R.T), jnp.asarray(cbs),
                                 "pq", "l2"))
    assert (fresh == codes).all()


def test_rq_train_center_levels_spreads_degenerate_leaves(rng):
    """Data with per-prefix interaction offsets that dominate the
    shared within-prefix signal: plain k-means makes the last level
    constant per prefix (observed on the 1M synth corpus: 78% of
    prefixes collapsed to one leaf); center_levels (hierarchical
    by-residual conditioning) must subdivide."""
    n, d, K = 4096, 16, 4
    a = rng.normal(size=(K, d)).astype(np.float32) * 10.0   # level 1
    b = rng.normal(size=(K, d)).astype(np.float32) * 3.0    # level 2
    c = rng.normal(size=(K, K, d)).astype(np.float32) * 1.0  # interaction
    s = rng.normal(size=(K, d)).astype(np.float32) * 0.5    # shared signal
    i = rng.integers(0, K, n)
    j = rng.integers(0, K, n)
    z = rng.integers(0, K, n)
    x = jnp.asarray(a[i] + b[j] + c[i, j] + s[z]
                    + 0.02 * rng.normal(size=(n, d)).astype(np.float32))

    def leaf_stats(codes):
        codes = np.asarray(codes)
        pref = codes[:, 0].astype(np.int64) * K + codes[:, 1]
        leaf = pref * K + codes[:, 2]
        order = np.argsort(pref, kind="stable")
        bnd = np.flatnonzero(np.diff(pref[order])) + 1
        groups = np.split(codes[order, 2], bnd)
        nd = np.array([len(np.unique(g)) for g in groups
                       if len(g) >= 16])
        return len(np.unique(leaf)), float((nd == 1).mean())

    _, codes_p = rq.rq_train(x, 3, K, iters=10,
                             key=jax.random.PRNGKey(0))
    _, codes_c, shifts = rq.rq_train(x, 3, K, iters=10,
                                     key=jax.random.PRNGKey(0),
                                     center_levels=True)
    assert [t.shape for t in shifts] == [(K, d), (K * K, d)]
    leaves_p, degen_p = leaf_stats(codes_p)
    leaves_c, degen_c = leaf_stats(codes_c)
    assert degen_p > 0.5, f"fixture not degenerate (degen={degen_p})"
    assert leaves_c > leaves_p * 2, (leaves_p, leaves_c)
    assert degen_c < 0.2, degen_c


def test_rq_train_center_levels_assign_consistent(rng):
    """Codes from center_levels training must equal
    assign(prefix_shift=...) with the returned tables (serving
    re-assigns unseen docs that way), and reconstruction with the
    shifts must beat reconstruction without them."""
    n, d, K, M = 512, 8, 4, 3
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    cbs, codes, shifts = rq.rq_train(x, M, K, iters=6,
                                     key=jax.random.PRNGKey(3),
                                     center_levels=True)
    re = rq.assign(x, cbs, "rq", "l2", prefix_shift=shifts)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(re))
    rec_s = rq.reconstruct(codes, cbs, "rq", prefix_shift=shifts)
    rec_p = rq.reconstruct(codes, cbs, "rq")
    err_s = float(jnp.mean(jnp.sum((x - rec_s) ** 2, -1)))
    err_p = float(jnp.mean(jnp.sum((x - rec_p) ** 2, -1)))
    assert err_s <= err_p + 1e-6


def test_beam_top1_equals_assign_conditioned(rng):
    """Codebook beam with prefix_shift must reduce to the conditioned
    assignment at num_beams=1 (the coarse stand-in stays faithful for
    center_levels quantizers)."""
    n, d, K, M = 256, 12, 4, 3
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    cbs, codes, shifts = rq.rq_train(x, M, K, iters=6,
                                     key=jax.random.PRNGKey(5),
                                     center_levels=True)
    bcodes, _ = rq.beam_search(x, cbs, num_beams=1,
                               prefix_shift=shifts)
    np.testing.assert_array_equal(np.asarray(bcodes)[:, 0, :],
                                  np.asarray(codes))
