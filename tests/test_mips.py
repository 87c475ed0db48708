"""Exact MIPS top-k vs numpy brute force, single-shard and 4-way sharded."""

import jax.numpy as jnp
import numpy as np
import pytest

from mevi_tpu.ops.mips import mips_topk, sharded_mips_topk
from mevi_tpu.parallel.mesh import make_mesh, shard_rows


def brute(Q, D, k, mode="ip"):
    if mode == "ip":
        s = Q @ D.T
    else:
        s = -((Q[:, None, :] - D[None, :, :]) ** 2).sum(-1)
    ids = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, ids, 1), ids


@pytest.mark.parametrize("nd,chunk", [(1000, 128), (256, 256), (130, 64)])
def test_mips_topk_exact(rng, nd, chunk):
    Q = rng.normal(size=(4, 64)).astype(np.float32)
    D = rng.normal(size=(nd, 64)).astype(np.float32)
    s, i = mips_topk(jnp.array(Q), jnp.array(D), k=10, chunk=chunk)
    rs, ri = brute(Q, D, 10)
    np.testing.assert_allclose(np.array(s), rs, rtol=1e-5)
    assert (np.array(i) == ri).all()


def test_mips_topk_l2(rng):
    Q = rng.normal(size=(3, 32)).astype(np.float32)
    D = rng.normal(size=(500, 32)).astype(np.float32)
    s, i = mips_topk(jnp.array(Q), jnp.array(D), k=7, chunk=128,
                     dist_mode="l2")
    _, ri = brute(Q, D, 7, "l2")
    assert (np.array(i) == ri).all()


def test_sharded_matches_single(rng, mesh8):
    Q = rng.normal(size=(8, 64)).astype(np.float32)
    D = rng.normal(size=(1000, 64)).astype(np.float32)
    Ds = shard_rows(D, mesh8)  # pads to 1000 -> 1000 (250/shard)
    s, i = sharded_mips_topk(jnp.array(Q), Ds, k=10, mesh=mesh8, chunk=64)
    rs, ri = brute(Q, D, 10)
    np.testing.assert_allclose(np.array(s), rs, rtol=1e-5)
    assert (np.array(i) == ri).all()


def test_sharded_with_padding(rng, mesh8):
    # 998 docs do not divide 4 shards; shard_rows pads with zero rows whose
    # scores only matter if fewer than k real docs exist.
    Q = rng.normal(size=(2, 32)).astype(np.float32)
    D = rng.normal(size=(998, 32)).astype(np.float32) + 1.0
    Ds = shard_rows(D, mesh8)
    s, i = sharded_mips_topk(jnp.array(Q), Ds, k=5, mesh=mesh8, chunk=128)
    rs, ri = brute(Q, D, 5)
    np.testing.assert_allclose(np.array(s), rs, rtol=1e-5)
    assert (np.array(i) == ri).all()
