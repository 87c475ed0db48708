"""Joint NCI + codebook + twin training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mevi_tpu.config import TrainConfig
from mevi_tpu.models.bert import BertDims, BertEncoderModel
from mevi_tpu.models.nci import NCIDims, NCIT5
from mevi_tpu.models.t5 import T5Dims
from mevi_tpu.train import joint as J
from mevi_tpu.train import trainer as T

KARY, M = 4, 2


@pytest.fixture(scope="module")
def setup(rng=np.random.default_rng(0)):
    t5 = T5Dims(vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_heads=4,
                num_layers=1, num_decoder_layers=1, dropout_rate=0.0)
    nci = NCIT5(NCIDims(t5=t5, kary=KARY, max_output_length=M + 2,
                        adaptor_layer_num=1, adaptor_num_heads=4,
                        adaptor_d_ff=32))
    bdims = BertDims(vocab_size=64, d_model=16, num_layers=1, num_heads=4,
                     d_ff=32, max_position_embeddings=32,
                     dropout_rate=0.0)
    tower = BertEncoderModel(bdims)

    def tower_rep(tparams, ids, mask):
        return tower.apply({"params": tparams}, ids, mask,
                           method=BertEncoderModel.cls_rep)

    b, Lq, Ld, n_neg = 8, 6, 8, 3
    batch = {
        "query_ids": jnp.asarray(rng.integers(1, 60, (b, Lq)), jnp.int32),
        "query_mask": jnp.ones((b, Lq), jnp.int32),
        "pos_doc_ids": jnp.asarray(rng.integers(1, 60, (b, Ld)),
                                   jnp.int32),
        "pos_doc_mask": jnp.ones((b, Ld), jnp.int32),
        "neg_doc_ids": jnp.asarray(rng.integers(1, 60, (b, n_neg, Ld)),
                                   jnp.int32),
        "neg_doc_mask": jnp.ones((b, n_neg, Ld), jnp.int32),
    }
    nci_params = nci.init(jax.random.PRNGKey(0), batch["query_ids"],
                          batch["query_mask"],
                          jnp.zeros((b, M + 2), jnp.int32))["params"]
    tparams = tower.init(jax.random.PRNGKey(1), batch["pos_doc_ids"],
                         batch["pos_doc_mask"])["params"]
    codebooks = jnp.asarray(
        rng.normal(size=(M, KARY, 16)).astype(np.float32))
    params = {"nci": nci_params, "tower": tparams, "codebooks": codebooks}
    return nci, tower_rep, params, batch


def test_joint_labels(setup):
    nci, tower_rep, params, batch = setup
    labels = J.joint_param_labels(params)
    assert labels["codebooks"] == "docenc"
    flat = set(jax.tree_util.tree_leaves(labels))
    assert flat == {"encoder", "decoder", "docenc"}


@pytest.mark.parametrize("pq_loss", ["label", "ce", "mse"])
def test_joint_step_runs_and_learns(setup, pq_loss):
    nci, tower_rep, params, batch = setup
    cfg = J.JointStepConfig(pq_loss=pq_loss,
                            centroid_update_loss="reconstruct")
    tcfg = TrainConfig(learning_rate=1e-3, decoder_learning_rate=1e-3,
                       docenc_learning_rate=1e-3, warmup_steps=0)
    opt = T.make_optimizer(tcfg, params, total_steps=1000,
                           labels=J.joint_param_labels(params))
    state = T.init_state(params, opt)
    step = J.make_joint_train_step(nci, tower_rep, opt, cfg)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, None)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses


def test_frozen_codebook_with_set_to_zero(setup):
    nci, tower_rep, params, batch = setup
    # fixpq: route codebooks to the 'frozen' transform
    def labels_fn(p):
        base = J.joint_param_labels(p)
        base["codebooks"] = "frozen"
        return base
    tcfg = TrainConfig(warmup_steps=0)
    opt = T.make_optimizer(tcfg, params, total_steps=100,
                           labels=labels_fn(params))
    state = T.init_state(params, opt)
    step = J.make_joint_train_step(
        nci, tower_rep, opt, J.JointStepConfig(pq_loss="ce"))
    state2, _ = step(state, batch, None)
    np.testing.assert_array_equal(np.asarray(state2.params["codebooks"]),
                                  np.asarray(params["codebooks"]))


def test_joint_ema_step(setup):
    from mevi_tpu.ops import rq as rq_ops
    nci, tower_rep, params, batch = setup
    cfg = J.JointStepConfig(pq_loss="label")

    def labels_fn(p):
        base = J.joint_param_labels(p)
        base["codebooks"] = "frozen"
        return base
    tcfg = TrainConfig(warmup_steps=0)
    opt = T.make_optimizer(tcfg, params, total_steps=100,
                           labels=labels_fn(params))
    state = T.init_state(params, opt)
    ema = rq_ops.ema_init(params["codebooks"])
    step = J.make_joint_train_step_ema(nci, tower_rep, opt, cfg)
    state2, ema2, metrics = step(state, ema, batch,
                                 jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # EMA moved the codebooks even though grads are frozen
    assert not np.allclose(np.asarray(state2.params["codebooks"]),
                           np.asarray(params["codebooks"]))
    assert float(jnp.sum(ema2.cluster_size)) > 0


def test_precomputed_labels_pq_runtime_label_0(setup, rng):
    """runtime_label=False: the NCI CE target is the batch's
    precomputed codes, not the live assignment (``--pq_runtime_label
    0``)."""
    nci, tower_rep, params, batch = setup
    M = nci.dims.code_len
    b = batch["query_ids"].shape[0]
    fixed = jnp.asarray(rng.integers(0, nci.dims.kary, (b, M)),
                        jnp.int32)
    batch_fixed = dict(batch, codes=fixed)
    cfg_rt = J.JointStepConfig(pq_loss="label")
    cfg_fx = J.JointStepConfig(pq_loss="label", runtime_label=False)
    loss_rt, _ = J.joint_loss_fn(nci, tower_rep, params, batch_fixed,
                                 None, cfg_rt)
    loss_fx, _ = J.joint_loss_fn(nci, tower_rep, params, batch_fixed,
                                 None, cfg_fx)
    # random fixed codes are (almost surely) different targets than the
    # runtime assignment -> different CE
    assert not np.isclose(float(loss_rt), float(loss_fx))
    # and with runtime_label=True the 'codes' key is ignored
    loss_rt2, _ = J.joint_loss_fn(nci, tower_rep, params, batch, None,
                                  cfg_rt)
    np.testing.assert_allclose(float(loss_rt), float(loss_rt2), rtol=1e-6)
