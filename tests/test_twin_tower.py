"""Twin-tower loss semantics + tower representation shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mevi_tpu.models import twin_tower as tt
from mevi_tpu.models.t5 import T5Dims


def test_similarity_matmul(rng):
    q = rng.normal(size=(3, 8)).astype(np.float32)
    p = rng.normal(size=(6, 8)).astype(np.float32)
    s = np.array(tt.similarity(jnp.array(q), jnp.array(p)))
    np.testing.assert_allclose(s, q @ p.T, rtol=1e-5)
    sb = np.array(tt.similarity(jnp.array(q), jnp.array(p[:3]), bmm=True))
    np.testing.assert_allclose(sb, (q * p[:3]).sum(-1), rtol=1e-5)


def test_contrastive_loss_targets(rng):
    # 2 queries, group of 3 passages each (pos at slots 0 and 3)
    q = rng.normal(size=(2, 8)).astype(np.float32)
    p = rng.normal(size=(6, 8)).astype(np.float32)
    loss, scores = tt.contrastive_loss(jnp.array(q), jnp.array(p))
    s = q @ p.T
    ref = -np.mean([
        s[0, 0] - np.log(np.exp(s[0]).sum()),
        s[1, 3] - np.log(np.exp(s[1]).sum()),
    ])
    np.testing.assert_allclose(float(loss), ref, rtol=1e-5)


def test_contrastive_loss_perfect_separation():
    q = jnp.eye(2, 8) * 20
    p = jnp.concatenate([jnp.eye(2, 8) * 20], axis=0)
    loss, _ = tt.contrastive_loss(q, p)
    assert float(loss) < 1e-3


def test_grouped_loss_matches_flat_when_groups_disjoint(rng):
    q = rng.normal(size=(2, 4)).astype(np.float32)
    groups = rng.normal(size=(2, 3, 4)).astype(np.float32)
    loss = float(tt.grouped_contrastive_loss(jnp.array(q),
                                             jnp.array(groups)))
    s = np.einsum("qd,qgd->qg", q, groups)
    ref = -np.mean(s[:, 0] - np.log(np.exp(s).sum(-1)))
    np.testing.assert_allclose(loss, ref, rtol=1e-5)


def test_cross_device_gather(mesh8):
    from jax.sharding import PartitionSpec as P
    from mevi_tpu.parallel.mesh import DATA_AXIS

    q = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    p = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4) + 1

    def local(q, p):
        loss, scores = tt.contrastive_loss(q, p, axis_name=DATA_AXIS)
        return loss, scores

    fn = jax.shard_map(local, mesh=mesh8,
                       in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
                       out_specs=(P(), P(None, None)), check_vma=False)
    loss, scores = fn(q, p)
    ref_loss, ref_scores = tt.contrastive_loss(q, p)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(np.array(scores), np.array(ref_scores),
                               rtol=1e-5)


def test_t5_tower_rep_is_decoder_token0(rng):
    dims = T5Dims(vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_heads=4,
                  num_layers=1, num_decoder_layers=1, dropout_rate=0.0)
    tower = tt.make_tower("t5", dims)
    ids = jnp.array(rng.integers(1, 60, size=(2, 5)).astype(np.int32))
    mask = jnp.ones_like(ids)
    params = tower.module.init(jax.random.PRNGKey(0), ids, mask)["params"]
    rep = tower.rep(params, ids, mask)
    assert rep.shape == (2, 16)
    # equals running the full model and slicing token 0
    _, dec = tower.module.apply({"params": params}, ids, mask)
    np.testing.assert_allclose(np.array(rep), np.array(dec[:, 0, :]),
                               rtol=1e-6)
