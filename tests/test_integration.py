"""End-to-end mini pipeline: embed corpus -> RQ index -> train NCI ->
coarse beam -> fine re-rank -> metrics -> result tsvs -> ensemble.

This is the framework-level smoke test the reference never had
(SURVEY.md §4): a tiny corpus where queries are their positive doc's
tokens, so the (frozen random) twin tower gives query == doc embeddings
and a trained NCI must learn query -> RQ code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mevi_tpu.config import InferConfig, MEVIConfig, RQConfig, TrainConfig
from mevi_tpu.data import io
from mevi_tpu.eval import ensemble as E
from mevi_tpu.eval.run_eval import Evaluator, write_result_files
from mevi_tpu.index.build import build_rq_index, embed_corpus
from mevi_tpu.models.nci import NCIDims, NCIT5
from mevi_tpu.models.t5 import T5Dims, T5Model
from mevi_tpu.train import trainer as T

KARY, M = 4, 2
NDOC, QLEN = 120, 8
VOCAB = 64


@pytest.fixture(scope="module")
def pipeline_state():
    rng = np.random.default_rng(0)
    doc_tokens = rng.integers(2, VOCAB, size=(NDOC, QLEN)).astype(np.int32)
    doc_masks = np.ones_like(doc_tokens)

    # frozen random twin tower
    tdims = T5Dims(vocab_size=VOCAB, d_model=16, d_kv=4, d_ff=32,
                   num_heads=4, num_layers=1, num_decoder_layers=1,
                   dropout_rate=0.0)
    tower = T5Model(tdims)
    tparams = tower.init(jax.random.PRNGKey(1),
                         jnp.zeros((2, QLEN), jnp.int32),
                         jnp.ones((2, QLEN), jnp.int32),
                         jnp.zeros((2, 1), jnp.int32))["params"]

    @jax.jit
    def rep_fn(ids, mask):
        return tower.apply({"params": tparams}, ids, mask,
                           method=T5Model.first_token_rep)

    emb = embed_corpus(rep_fn, doc_tokens, doc_masks, batch_size=32)
    assert emb.shape == (NDOC, 16)

    from mevi_tpu.config import EncoderConfig
    cfg = MEVIConfig(rq=RQConfig(subvector_num=M, subvector_bits=2,
                                 emb_size=16),
                     encoder=EncoderConfig(d_model=16))
    cfg.finalize()
    arts = build_rq_index(cfg, emb, iters=8)

    # NCI model trained on (doc tokens as query) -> code
    ndims = NCIDims(t5=T5Dims(vocab_size=VOCAB, d_model=16, d_kv=4,
                              d_ff=32, num_heads=4, num_layers=1,
                              num_decoder_layers=1, dropout_rate=0.0),
                    kary=KARY, max_output_length=M + 2,
                    adaptor_layer_num=1, adaptor_num_heads=4,
                    adaptor_d_ff=32)
    nci = NCIT5(ndims)
    ids = jnp.asarray(doc_tokens)
    mask = jnp.asarray(doc_masks)
    params = nci.init(jax.random.PRNGKey(0), ids[:2], mask[:2],
                      jnp.zeros((2, M + 2), jnp.int32))["params"]
    tcfg = TrainConfig(learning_rate=5e-3, decoder_learning_rate=5e-3,
                       warmup_steps=0)
    opt = T.make_optimizer(tcfg, params, total_steps=10_000)
    state = T.init_state(params, opt)
    step = T.make_nci_train_step(nci, opt, donate=False)
    batch = {"query_ids": ids, "query_mask": mask,
             "codes": jnp.asarray(arts.codes)}
    for _ in range(60):
        state, metrics = step(state, batch, None)
    final_loss = float(metrics["loss"])

    return dict(doc_tokens=doc_tokens, doc_masks=doc_masks, emb=emb,
                cfg=cfg, arts=arts, nci=nci, params=state.params,
                rep_fn=rep_fn, final_loss=final_loss)


def test_training_converges(pipeline_state):
    assert pipeline_state["final_loss"] < 0.5


def test_end_to_end_eval_and_ensemble(pipeline_state, tmp_path):
    s = pipeline_state
    cfg = InferConfig(num_return_sequences=4,
                      recall_num=(1, 5, 10), max_cluster_docs=64)
    ev = Evaluator(s["nci"], s["params"], cfg, fine_index=s["arts"].fine,
                   query_rep_fn=s["rep_fn"], doc_codes=s["arts"].codes)
    queries = [f"q{i}" for i in range(32)]
    gt = [[i] for i in range(32)]
    out = ev.evaluate(queries, s["doc_tokens"][:32], s["doc_masks"][:32],
                      gt, batch_size=8, keep_results=True)

    # trained NCI must put the gt cluster in its 4 beams for most queries
    assert out.coarse["recall"][4] > 0.8, out.coarse
    # fine re-rank must find the doc itself (qemb == doc emb)
    assert out.fine["recall"][10] > 0.8, out.fine
    assert out.fine["mrr"][10] > 0.5
    assert out.ndoc_per_query > 0

    # result tsv round trip + ensemble
    coarse_p = str(tmp_path / "coarse.tsv")
    hn_p = str(tmp_path / "hn.tsv")
    write_result_files(out, gt, coarse_path=coarse_p, hardneg_path=hn_p)
    _, _, clusters = io.parse_result_tsv(coarse_p,
                                         {"query": 0, "cluster": 1})
    preds, scores, _ = io.parse_result_tsv(
        hn_p, {"query": 0, "pred": 2, "score": 3})
    assert len(clusters) == 32 and len(preds) == 32

    mapping = {i: tuple(c.tolist()) for i, c in enumerate(s["arts"].codes)}
    gts = {q: g for q, g in zip(queries, gt)}
    res = E.run_ensemble(gts, preds, scores, clusters, mapping,
                         recall_ks=(1, 10))
    fused = res[(0.6, 0.03, 0.02)]
    assert fused["recall"][10] > 0.8


def test_eval_all_documents_path(pipeline_state):
    """Full-corpus scan (eval_all_documents) via exact MIPS equals or
    beats the cluster-restricted path."""
    from mevi_tpu.ops.mips import mips_topk
    s = pipeline_state
    q = s["rep_fn"](jnp.asarray(s["doc_tokens"][:16]),
                    jnp.asarray(s["doc_masks"][:16]))
    scores, ids = mips_topk(q, jnp.asarray(s["emb"]), k=10, chunk=64)
    top1 = np.asarray(ids)[:, 0]
    # query == doc tokens, so the doc itself should usually rank first
    assert (top1 == np.arange(16)).mean() > 0.8
