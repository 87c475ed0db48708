"""Training orchestration loop: alt stages, regeneration, checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mevi_tpu.config import (EncoderConfig, InferConfig, MEVIConfig,
                             RQConfig, TrainConfig)
from mevi_tpu.models.nci import NCIDims, NCIT5
from mevi_tpu.models.t5 import T5Dims, T5Model
from mevi_tpu.train import trainer as T
from mevi_tpu.train.loop import LoopConfig, TrainLoop

KARY, M = 4, 2


@pytest.fixture()
def world(tmp_path, rng):
    cfg = MEVIConfig(
        rq=RQConfig(subvector_num=M, subvector_bits=2, emb_size=16),
        encoder=EncoderConfig(d_model=16),
        train=TrainConfig(train_batch_size=8, eval_batch_size=8,
                          encode_batch_size=16, learning_rate=5e-3,
                          decoder_learning_rate=5e-3, warmup_steps=0),
        infer=InferConfig(num_return_sequences=3, recall_num=(1, 5),
                          max_cluster_docs=32))
    cfg.finalize()
    t5 = T5Dims(vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_heads=4,
                num_layers=1, num_decoder_layers=1, dropout_rate=0.0)
    nci = NCIT5(NCIDims(t5=t5, kary=KARY, max_output_length=M + 2,
                        adaptor_layer_num=1, adaptor_num_heads=4,
                        adaptor_d_ff=32))
    tower = T5Model(t5)
    n = 40
    doc_tokens = rng.integers(2, 60, (n, 8)).astype(np.int32)
    doc_masks = np.ones_like(doc_tokens)
    tparams = tower.init(jax.random.PRNGKey(1),
                         jnp.asarray(doc_tokens[:2]),
                         jnp.asarray(doc_masks[:2]),
                         jnp.zeros((2, 1), jnp.int32))["params"]

    @jax.jit
    def tower_rep(tp, ids, mask):
        return tower.apply({"params": tp}, ids, mask,
                           method=T5Model.first_token_rep)

    params = nci.init(jax.random.PRNGKey(0),
                      jnp.asarray(doc_tokens[:2]),
                      jnp.asarray(doc_masks[:2]),
                      jnp.zeros((2, M + 2), jnp.int32))["params"]
    opt = T.make_optimizer(cfg.train, params, total_steps=100)
    state = T.init_state(params, opt)
    step = T.make_nci_train_step(nci, opt, donate=False)
    return dict(cfg=cfg, nci=nci, tower_rep=tower_rep, tparams=tparams,
                doc_tokens=doc_tokens, doc_masks=doc_masks, state=state,
                step=step, rng=rng, tmp=tmp_path)


def test_loop_end_to_end(world):
    w = world
    cfg = w["cfg"]
    loop = LoopConfig(num_epochs=2, val_every=1, rq_iters=4,
                      monitor="recall5")
    # initial index from the frozen tower
    codes_holder = {}

    tl = TrainLoop(cfg, loop, w["nci"],
                   steps={"nci": lambda s, b, r: w["step"](s, b, None)},
                   state=w["state"],
                   dataset_fn=None,  # set below
                   tower_rep=w["tower_rep"],
                   doc_tokens=w["doc_tokens"], doc_masks=w["doc_masks"],
                   eval_inputs=None,
                   ckpt_dir=str(w["tmp"] / "ck"),
                   log_dir=str(w["tmp"] / "logs"))
    tl.regenerate_index(w["tparams"])
    assert tl.fine_index is not None and tl.doc_codes.shape == (40, M)

    # train on (doc tokens -> code) so recall improves
    qids = jnp.asarray(w["doc_tokens"])
    qmask = jnp.asarray(w["doc_masks"])
    codes = jnp.asarray(tl.doc_codes)

    def dataset_fn(epoch):
        for _ in range(15):
            yield {"query_ids": qids, "query_mask": qmask,
                   "codes": codes}
    tl.dataset_fn = dataset_fn
    tl.eval_inputs = dict(
        queries=[f"q{i}" for i in range(16)],
        query_ids=w["doc_tokens"][:16], query_mask=w["doc_masks"][:16],
        gt_docids=[[i] for i in range(16)])

    state = tl.run(query_rep_fn=lambda i, m: w["tower_rep"](
        w["tparams"], i, m))
    assert tl.ckpts.best_tag() is not None
    val = tl.validate(state.params, lambda i, m: w["tower_rep"](
        w["tparams"], i, m))
    assert val["recall5"] > 0.5, val


def test_alt_stage_schedule(world):
    w = world
    loop = LoopConfig(alt_epochs=(2, 3))
    tl = TrainLoop(w["cfg"], loop, w["nci"],
                   steps={"nci": None, "twin": None}, state=None,
                   dataset_fn=None, ckpt_dir=str(w["tmp"] / "c2"),
                   log_dir=str(w["tmp"] / "l2"))
    assert [tl.stage_for_epoch(e) for e in range(6)] == [
        "nci", "nci", "twin", "nci", "nci", "twin"]


def test_codebook_alignment_stability(world):
    """Refit + Hungarian alignment keeps most code labels stable."""
    w = world
    loop = LoopConfig(rq_iters=6, align_codebooks=True)
    tl = TrainLoop(w["cfg"], loop, w["nci"], steps={}, state=None,
                   dataset_fn=None, tower_rep=w["tower_rep"],
                   doc_tokens=w["doc_tokens"], doc_masks=w["doc_masks"],
                   ckpt_dir=str(w["tmp"] / "c3"),
                   log_dir=str(w["tmp"] / "l3"))
    tl.regenerate_index(w["tparams"])
    codes1 = tl.doc_codes.copy()
    tl.loop = LoopConfig(rq_iters=6, align_codebooks=True, seed=7)
    tl.regenerate_index(w["tparams"])
    codes2 = tl.doc_codes
    agree = (codes1 == codes2).mean()
    assert agree > 0.5, agree


def test_nq_answer_set_eval(world):
    """Evaluator.evaluate_nq over a trained-ish setup."""
    import jax.numpy as jnp
    from mevi_tpu.eval.ensemble import AnswerIndex
    from mevi_tpu.eval.run_eval import Evaluator
    from mevi_tpu.train.loop import LoopConfig, TrainLoop
    w = world
    loop = LoopConfig(rq_iters=4)
    tl = TrainLoop(w["cfg"], loop, w["nci"], steps={}, state=None,
                   dataset_fn=None, tower_rep=w["tower_rep"],
                   doc_tokens=w["doc_tokens"], doc_masks=w["doc_masks"],
                   ckpt_dir=str(w["tmp"] / "c4"),
                   log_dir=str(w["tmp"] / "l4"))
    tl.regenerate_index(w["tparams"])
    # each doc answers exactly query index i == doc id
    aidx = AnswerIndex.from_answer_sets([[i] for i in range(40)])
    ev = Evaluator(w["nci"], w["state"].params, w["cfg"].infer,
                   fine_index=tl.fine_index,
                   query_rep_fn=lambda i, m: w["tower_rep"](
                       w["tparams"], i, m),
                   doc_codes=tl.doc_codes)
    out = ev.evaluate_nq([f"q{i}" for i in range(8)],
                         w["doc_tokens"][:8], w["doc_masks"][:8],
                         list(range(8)), aidx, batch_size=8)
    assert out.fine is not None
    assert 0.0 <= out.fine["hitrate"][5] <= 1.0
    assert out.coarse is not None
