"""k-means kernels vs numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from mevi_tpu.ops.kmeans import (kmeans_assign, kmeans_fit,
                                 kmeans_plusplus_init, kmeans_stats)


def test_assign_matches_numpy(rng):
    x = rng.normal(size=(500, 16)).astype(np.float32)
    c = rng.normal(size=(8, 16)).astype(np.float32)
    a = np.array(kmeans_assign(jnp.array(x), jnp.array(c), "l2", chunk=128))
    ref = np.argmin(((x[:, None] - c[None]) ** 2).sum(-1), axis=1)
    assert (a == ref).all()


def test_assign_ip_mode(rng):
    x = rng.normal(size=(300, 8)).astype(np.float32)
    c = rng.normal(size=(5, 8)).astype(np.float32)
    a = np.array(kmeans_assign(jnp.array(x), jnp.array(c), "ip", chunk=64))
    ref = np.argmax(x @ c.T, axis=1)
    assert (a == ref).all()


def test_stats_matches_numpy(rng):
    x = rng.normal(size=(257, 16)).astype(np.float32)
    a = rng.integers(0, 6, size=257).astype(np.int32)
    sums, counts = kmeans_stats(jnp.array(x), jnp.array(a), 6, chunk=64)
    sums, counts = np.array(sums), np.array(counts)
    for k in range(6):
        np.testing.assert_allclose(sums[k], x[a == k].sum(0), rtol=1e-4,
                                   atol=1e-5)
        assert counts[k] == (a == k).sum()


def test_kmeans_fit_recovers_separated_clusters(rng):
    # 4 well-separated blobs: lloyd must find them (inertia ~ intra var)
    centers = np.array([[10, 0], [-10, 0], [0, 10], [0, -10]], np.float32)
    x = np.concatenate([
        centers[i] + 0.1 * rng.normal(size=(100, 2)).astype(np.float32)
        for i in range(4)])
    cb, assign = kmeans_fit(jnp.array(x), 4, iters=10,
                            key=jax.random.PRNGKey(0), chunk=128)
    cb = np.array(cb)
    # every true center has a learned centroid within 0.2
    d = np.abs(cb[None, :, :] - centers[:, None, :]).sum(-1).min(1)
    assert (d < 0.5).all(), d
    # assignment is consistent: same-blob rows share a label
    a = np.array(assign).reshape(4, 100)
    assert all(len(np.unique(row)) == 1 for row in a)


def test_kmeans_quality_close_to_sklearn(rng):
    from sklearn.cluster import KMeans
    x = rng.normal(size=(2000, 8)).astype(np.float32)
    cb, a = kmeans_fit(jnp.array(x), 16, iters=25,
                       key=jax.random.PRNGKey(1), chunk=512)
    ours = ((x - np.array(cb)[np.array(a)]) ** 2).sum()
    sk = KMeans(n_clusters=16, n_init=1, max_iter=25,
                random_state=0).fit(x)
    theirs = sk.inertia_
    assert ours <= theirs * 1.1, (ours, theirs)


def test_plusplus_init_spreads(rng):
    centers = np.array([[20, 0], [-20, 0], [0, 20]], np.float32)
    x = np.concatenate([
        centers[i] + 0.1 * rng.normal(size=(50, 2)).astype(np.float32)
        for i in range(3)])
    init = np.array(kmeans_plusplus_init(jnp.array(x), 3,
                                         jax.random.PRNGKey(0)))
    d = np.abs(init[None] - centers[:, None]).sum(-1).min(1)
    assert (d < 1.0).all(), init
