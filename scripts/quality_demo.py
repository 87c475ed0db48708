"""End-to-end retrieval-quality demonstration on synthetic data.

The bench (``bench.py``) measures throughput with random weights; this
script closes the quality loop the reference demonstrates with trained
checkpoints (coarse recall 0.886 at `marco_eval_nci_rq.sh:29`): it
TRAINS the NCI seq2seq model and shows the constrained beam retrieving
the right clusters through the real serving path.

Pipeline (all on the default jax backend — TPU or CPU):
  1. hierarchical synthetic corpus (same generative family as bench.py),
     unit-norm rows; RQ 4x32 fit on device -> CSR fine index
  2. queries = random-projection bucket tokens of a (perturbed) document
     embedding — a deterministic "language" whose semantics the model
     must learn; train pairs use the doc's own embedding, dev pairs a
     noisy perturbation (generalization, not memorization)
  3. train NCI (T5 + PAWA, compact logits) on query-tokens -> RQ code
  4. eval: tree-constrained beam-10 -> coarse hitrate@{1,10} on dev,
     then in-cluster fine re-rank with the true embeddings -> recall@10

Prints one JSON line:
  {"coarse_hit@10": ..., "fine_recall@10": ..., "steps": N, ...}

Measured on one v5e (200k docs, d=512 6+3-layer NCI, batch 256):
  DEMO_STEPS=4000  (~2.5 min train): hit@10 0.33
  DEMO_STEPS=20000 (~9 min):         hit@10 0.42
  DEMO_STEPS=60000 (~43 min):        hit@10 0.96, hit@1 0.48
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mevi_jax_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    if os.environ.get("DEMO_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from mevi_tpu.decode.beam import nci_beam_search_incremental
    from mevi_tpu.eval.searcher import build_fine_index, fine_rerank
    from mevi_tpu.models.nci import NCIDims, NCIT5
    from mevi_tpu.models.t5 import T5Dims
    from mevi_tpu.ops import rq as rq_ops
    from mevi_tpu.train import trainer as T
    from mevi_tpu.config import TrainConfig

    on_tpu = jax.devices()[0].platform != "cpu"
    NDOC = int(os.environ.get("DEMO_NDOC", 200_000 if on_tpu else 5_000))
    NTRAIN = int(os.environ.get("DEMO_NTRAIN",
                                100_000 if on_tpu else 2_000))
    STEPS = int(os.environ.get("DEMO_STEPS", 4000 if on_tpu else 60))
    BATCH = 256 if on_tpu else 32
    D = 768 if on_tpu else 64
    KARY, M = 32, 4
    QLEN, NBEAM, CAP = 24, 10, 256
    VOCAB = 2 + QLEN * KARY          # per-position projection buckets

    host = np.random.default_rng(0)
    # ---- corpus: 3-level shared-sons hierarchy + leaf noise -------------
    scales = (1.0, 0.42, 0.18)
    lv_ctrs = [host.normal(size=(KARY, D)).astype(np.float32) * s
               for s in scales]
    EPS = 0.06

    t0 = time.time()
    lv_lab = [host.integers(0, KARY, NDOC) for _ in scales]
    emb = sum(c[l] for c, l in zip(lv_ctrs, lv_lab)) \
        + EPS * host.standard_normal((NDOC, D)).astype(np.float32)
    emb = (emb / np.linalg.norm(emb, axis=1, keepdims=True)) \
        .astype(np.float32)
    log(f"corpus {NDOC}x{D}: {time.time()-t0:.1f}s")

    t0 = time.time()
    cbs, _ = rq_ops.rq_train(jnp.asarray(emb[:min(NDOC, 300_000)]),
                             levels=M, kary=KARY, iters=8,
                             key=jax.random.PRNGKey(1))
    codes = np.asarray(rq_ops.assign(jnp.asarray(emb), cbs, "rq", "l2"))
    fine = build_fine_index(codes, emb, KARY)
    log(f"RQ fit+assign+index: {time.time()-t0:.1f}s")

    # ---- query "language" -------------------------------------------
    # A query names its document through 6 scattered INFO tokens (the
    # doc's hierarchy labels + id digits, each hashed into a per-slot
    # vocabulary); the remaining slots are fresh random FILLER tokens
    # per utterance.  The model must learn which tokens carry meaning
    # and map them to the doc's RQ code (which correlates with, but is
    # not identical to, the generative labels — RQ is fit post hoc).
    n_info = 7
    info_pos = host.choice(QLEN, size=n_info, replace=False)
    salt = host.integers(1, 1 << 30, size=n_info)

    def to_tokens(docs, rng):
        n = len(docs)
        tok = rng.integers(2, VOCAB, size=(n, QLEN)).astype(np.int32)
        info = np.stack([lv_lab[0][docs], lv_lab[1][docs],
                         lv_lab[2][docs],
                         docs % KARY, (docs // KARY) % KARY,
                         (docs // KARY**2) % KARY,
                         (docs // KARY**3) % KARY])
        for j, p in enumerate(info_pos):
            tok[:, p] = 2 + int(p) * KARY + (info[j] * salt[j]) % KARY
        return tok

    train_docs = host.integers(0, NDOC, NTRAIN)
    n_dev = 512
    # new utterances (fresh fillers) for TRAINED docs — the reference's
    # eval regime: retrieval of indexed documents from unseen queries
    dev_docs = train_docs[host.integers(0, NTRAIN, n_dev)]
    q_dev = to_tokens(dev_docs, host)
    dev_vecs = emb[dev_docs] + 0.5 * EPS * host.standard_normal(
        (n_dev, D)).astype(np.float32)
    dev_vecs /= np.linalg.norm(dev_vecs, axis=1, keepdims=True)
    y_train = codes[train_docs]

    # ---- model + training -----------------------------------------------
    if on_tpu:
        t5 = T5Dims(vocab_size=VOCAB, num_layers=6, num_decoder_layers=3,
                    d_model=512, d_kv=64, d_ff=2048, num_heads=8,
                    dropout_rate=0.0)
        adaptor = dict(adaptor_layer_num=2, adaptor_num_heads=8)
    else:
        t5 = T5Dims(vocab_size=VOCAB, num_layers=2, num_decoder_layers=2,
                    d_model=64, d_kv=16, d_ff=128, num_heads=4,
                    dropout_rate=0.0)
        adaptor = dict(adaptor_layer_num=1, adaptor_num_heads=4)
    dims = NCIDims(t5=t5, kary=KARY, max_output_length=M + 2, **adaptor)
    model = NCIT5(dims)

    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, QLEN), jnp.int32),
                        jnp.ones((1, QLEN), jnp.int32),
                        jnp.zeros((1, M + 2), jnp.int32))["params"]
    tcfg = TrainConfig(learning_rate=3e-4, warmup_steps=100,
                       train_batch_size=BATCH)
    opt = T.make_optimizer(tcfg, params, total_steps=STEPS)
    state = T.init_state(params, opt)
    step = T.make_nci_train_step(model, opt, T.NCIStepConfig())

    mask = jnp.ones((BATCH, QLEN), jnp.int32)
    t0 = time.time()
    loss0 = loss = None
    for i in range(STEPS):
        sel = host.integers(0, NTRAIN, BATCH)
        # fresh fillers per utterance: the model can only key on the
        # info tokens (otherwise it memorizes whole sequences and dev
        # queries with new fillers score zero)
        batch = {"query_ids": jnp.asarray(
                     to_tokens(train_docs[sel], host)),
                 "query_mask": mask,
                 "codes": jnp.asarray(y_train[sel])}
        state, metrics = step(state, batch, None)
        if i == 0:
            loss0 = float(metrics["loss"])
        if (i + 1) % max(STEPS // 10, 1) == 0:
            loss = float(metrics["loss"])
            log(f"step {i+1}/{STEPS} loss {loss:.4f}")
    train_s = time.time() - t0
    log(f"trained {STEPS} steps x {BATCH}: {train_s:.1f}s "
        f"({STEPS*BATCH/train_s:.0f} ex/s)")

    # ---- eval: constrained beam -> coarse + fine -------------------------
    codes_dev, _, _ = nci_beam_search_incremental(
        model, state.params, jnp.asarray(q_dev),
        jnp.ones((n_dev, QLEN), jnp.int32), NBEAM)
    codes_dev = np.asarray(codes_dev)
    gt = codes[dev_docs]
    hit1 = float(np.mean((codes_dev[:, 0, :] == gt).all(-1)))
    hit10 = float(np.mean([(codes_dev[i] == gt[i]).all(-1).any()
                           for i in range(n_dev)]))

    fs, fids, nd = fine_rerank(
        jnp.asarray(dev_vecs.astype(np.asarray(fine.sorted_emb).dtype)),
        jnp.asarray(codes_dev), fine.offsets, fine.doc_ids,
        fine.sorted_emb, KARY, CAP, 10)
    fids = np.asarray(fids)
    rec10 = float(np.mean([dev_docs[i] in set(fids[i].tolist())
                           for i in range(n_dev)]))
    out = {"coarse_hit@1": round(hit1, 4), "coarse_hit@10": round(hit10, 4),
           "fine_recall@10": round(rec10, 4), "steps": STEPS,
           "batch": BATCH, "examples_per_s": round(STEPS*BATCH/train_s, 1),
           "loss_first": round(loss0, 4), "loss_last": round(loss, 4),
           "ndoc": NDOC, "n_train": NTRAIN}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
