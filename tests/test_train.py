"""Loss math + end-to-end train-step smoke tests (loss must go down)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mevi_tpu.config import TrainConfig
from mevi_tpu.models.nci import NCIDims, NCIT5
from mevi_tpu.models.t5 import T5Dims
from mevi_tpu.train import losses as L
from mevi_tpu.train import trainer as T

KARY, M = 4, 2
L_OUT = M + 2


def small_model():
    t5 = T5Dims(vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_heads=4,
                num_layers=1, num_decoder_layers=1, dropout_rate=0.0)
    dims = NCIDims(t5=t5, kary=KARY, max_output_length=L_OUT,
                   adaptor_layer_num=1, adaptor_num_heads=4,
                   adaptor_d_ff=32)
    return NCIT5(dims)


def test_nci_ce_loss_matches_numpy(rng):
    logits = rng.normal(size=(2, 4, 5)).astype(np.float32)
    labels = np.array([[1, 2, 4, -100], [0, 0, 4, -100]], np.int32)
    ours = float(L.nci_ce_loss(jnp.array(logits), jnp.array(labels)))
    tot, n = 0.0, 0
    for b in range(2):
        for t in range(4):
            if labels[b, t] < 0:
                continue
            z = logits[b, t]
            tot += -(z[labels[b, t]] - np.log(np.exp(z).sum()))
            n += 1
    assert ours == pytest.approx(tot / n, rel=1e-5)


def test_pq_distill_ce_gradient_direction(rng):
    nci = jnp.array(rng.normal(size=(3, M, KARY)).astype(np.float32))
    pq = jnp.array(rng.normal(size=(3, M, KARY)).astype(np.float32))

    def f(pq):
        return L.pq_distill_loss(nci, pq, "ce")
    g = jax.grad(f)(pq)
    assert np.isfinite(np.array(g)).all()
    # moving pq toward nci reduces the loss
    l0 = float(f(pq))
    l1 = float(f(pq - 0.1 * g))
    assert l1 < l0


@pytest.mark.parametrize("kind", ["kl", "mse", "dot", "cosine"])
def test_pq_distill_variants_finite(rng, kind):
    nci = jnp.array(rng.normal(size=(2, M, KARY)).astype(np.float32))
    pq = jnp.array(rng.normal(size=(2, M, KARY)).astype(np.float32))
    v = float(L.pq_distill_loss(nci, pq, kind))
    assert np.isfinite(v)


def test_pq_distill_sample_negatives(rng):
    nci = jnp.array(rng.normal(size=(2, M, KARY)).astype(np.float32))
    pq = jnp.array(rng.normal(size=(6, M, KARY)).astype(np.float32))
    v = float(L.pq_distill_loss(nci, pq, "ce", negative="sample"))
    assert np.isfinite(v)


def test_rq_reconstruction_loss_matches_reference(rng):
    emb = rng.normal(size=(5, 8)).astype(np.float32)
    cbs = rng.normal(size=(3, 4, 8)).astype(np.float32)
    codes = rng.integers(0, 4, size=(5, 3)).astype(np.int32)
    ours = float(L.rq_reconstruction_loss(jnp.array(emb), jnp.array(codes),
                                          jnp.array(cbs)))
    # reference (pq.py:754-763): successive residuals stacked then mse
    diffs = []
    cur = emb.copy()
    for i in range(3):
        cur = cur - cbs[i][codes[:, i]]
        diffs.append(cur.copy())
    ref = np.mean(np.stack(diffs, 1) ** 2)
    assert ours == pytest.approx(ref, rel=1e-5)


def test_rdrop_losses_finite(rng):
    a = jnp.array(rng.normal(size=(2, 3, 5)).astype(np.float32))
    b = jnp.array(rng.normal(size=(2, 3, 5)).astype(np.float32))
    assert np.isfinite(float(L.rdrop_kl(a, b)))
    assert np.isfinite(float(L.rdrop_l2(a, b)))
    h1 = jnp.array(rng.normal(size=(2, 3, 8)).astype(np.float32))
    h2 = jnp.array(rng.normal(size=(2, 3, 8)).astype(np.float32))
    assert np.isfinite(float(L.rdrop_contrast(h1, h2)))
    # identical logits -> zero divergence
    assert float(L.rdrop_kl(a, a)) == pytest.approx(0.0, abs=1e-6)


def test_nci_train_step_learns(rng):
    model = small_model()
    ids = jnp.array(rng.integers(2, 60, size=(8, 6)).astype(np.int32))
    mask = jnp.ones_like(ids)
    codes = jnp.array(rng.integers(0, KARY, size=(8, M)).astype(np.int32))
    dec_in = jnp.zeros((8, L_OUT), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, dec_in)["params"]

    cfg = TrainConfig(learning_rate=5e-3, decoder_learning_rate=5e-3,
                      warmup_steps=0)
    opt = T.make_optimizer(cfg, params, total_steps=1000)
    state = T.init_state(params, opt)
    step = T.make_nci_train_step(model, opt, donate=False)

    batch = {"query_ids": ids, "query_mask": mask, "codes": codes}
    losses = []
    for i in range(20):
        state, metrics = step(state, batch, None)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]


def test_param_labels_split():
    model = small_model()
    ids = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids),
                        jnp.zeros((1, L_OUT), jnp.int32))["params"]
    labels = T.nci_param_labels(params)
    assert labels["shared"]["embedding"] == "encoder"
    assert labels["decode_embeddings"]["embedding"] == "decoder"
    assert labels["adaptor_kernel"] == "decoder"
    flat = jax.tree_util.tree_leaves(labels)
    assert set(flat) <= {"encoder", "decoder"}


def test_schedule_shape():
    s = T.linear_warmup_decay(1.0, 10, 110)
    assert float(s(0)) == 0.0
    assert float(s(10)) == pytest.approx(1.0)
    assert float(s(60)) == pytest.approx(0.5)
    assert float(s(110)) == pytest.approx(0.0)


def test_train_chunk_matches_per_step(rng):
    """K scanned steps == K individual steps (same params trajectory)."""
    model = small_model()
    B, K, QLEN = 4, 3, 6
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, QLEN), jnp.int32),
                        jnp.ones((1, QLEN), jnp.int32),
                        jnp.zeros((1, L_OUT), jnp.int32))["params"]
    cfg = TrainConfig(learning_rate=1e-3, warmup_steps=2,
                      train_batch_size=B)
    opt = T.make_optimizer(cfg, params, total_steps=K)
    qids = rng.integers(0, 64, size=(K, B, QLEN)).astype(np.int32)
    qmask = np.ones((K, B, QLEN), np.int32)
    codes = rng.integers(0, KARY, size=(K, B, M)).astype(np.int32)

    step = T.make_nci_train_step(model, opt, donate=False)
    s1 = T.init_state(params, opt)
    for i in range(K):
        s1, m1 = step(s1, {"query_ids": jnp.asarray(qids[i]),
                           "query_mask": jnp.asarray(qmask[i]),
                           "codes": jnp.asarray(codes[i])}, None)

    chunk = T.make_nci_train_chunk(model, opt)
    s2 = T.init_state(params, opt)
    s2, m2 = chunk(s2, {"query_ids": jnp.asarray(qids),
                        "query_mask": jnp.asarray(qmask),
                        "codes": jnp.asarray(codes)}, None)
    assert int(s2.step) == int(s1.step) == K
    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-5)
    a, b = jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-6)
