"""Full-configuration retrieval-quality run (round-3 north star).

Drives the REAL framework surfaces end-to-end at the reference's full
model configuration — T5-base NCI (12 enc / 6 dec, d=768, PAWA 4-layer
adaptor), t5-base-shaped query tower, RQ 4x32 — on a synthetic corpus of
millions of documents (``mevi_tpu/data/synth.py``; real MS MARCO is not
downloadable in this environment), and captures trained coarse/fine
retrieval quality through the serving path (``PallasServer``, beam 10):
the regime the reference demonstrates with released checkpoints
(coarse recall@100 = 0.886079, ``MEVI/marco_eval_nci_rq.sh:29``).

Stages (idempotent; QF_STAGE=data|train|tower|eval|all):
  data   synthesize corpus spec, RQ-fit codes on device, write train
         utterance token memmaps + row-aligned codes (the `mevi train`
         data contract), and a dev utterance set.
  train  subprocess `python -m mevi_tpu.cli.main train --scan_steps N`
         (the real CLI; checkpoints via orbax under the workdir).
  tower  train the query tower (tokens -> embedding) contrastively
         against the fixed document embeddings (in-batch negatives,
         ``document_encoder.py:61-102`` semantics).
  eval   build the CSR fine index in HBM, serve dev queries through
         PallasServer with the TRAINED tower + NCI, report coarse
         hit@{1,10}, fine recall@{1,10,100}, MRR@10, and the exact-MIPS
         ceiling of the tower embeddings; writes QUALITY json.

Env knobs: QF_WORKDIR, QF_NDOC, QF_UTT (utterances/doc), QF_EPOCHS,
QF_BATCH, QF_SCAN, QF_TOWER_STEPS, QF_TINY=1 (CPU smoke geometry),
QF_OUT (json path).
"""

import json
import os
import os.path as osp
import subprocess
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mevi_jax_cache")

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _maybe_force_cpu():
    """QF_FORCE_CPU=1: the axon TPU plugin pins jax_platforms in
    sitecustomize, so JAX_PLATFORMS=cpu alone does not take — override
    via config after import (BENCH_FORCE_CPU pattern)."""
    if os.environ.get("QF_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
        os.environ["MEVI_FORCE_CPU"] = "1"   # subprocess CLI stages


def env_int(name, default):
    return int(os.environ.get(name, default))


def make_spec():
    from mevi_tpu.data.synth import SynthSpec
    # info_dropout: with a fully-clean language the ints->code mapping
    # is a factorized lookup the model drives to ~0 loss within 1k
    # steps (measured); corrupting each info token to a filler with
    # this probability makes queries genuinely ambiguous, so the beam
    # must rank under uncertainty — the reference's 0.886-recall regime
    # rather than a trivially-perfect one
    noise = float(os.environ.get("QF_NOISE", 0.15))
    if os.environ.get("QF_TINY"):
        return SynthSpec(ndoc=env_int("QF_NDOC", 3000), d=32, kary=8,
                         levels=3, pool_n=64, scales=(1.0, 0.4, 0.2),
                         zipf=(1.0, 0.6, 0.3), eps=0.05, seed=5,
                         qlen=16, n_filler_vocab=32, info_dropout=noise)
    return SynthSpec(ndoc=env_int("QF_NDOC", 1_000_000), seed=5,
                     info_dropout=noise)


def model_cfg(spec, workdir):
    """MEVIConfig at the reference's full size (T5-base NCI + PAWA-4,
    ``MEVI/main.py:755-761``), bf16 compute; tiny variant for CPU."""
    from mevi_tpu.config import (EncoderConfig, MEVIConfig, ModelConfig,
                                 RQConfig, TrainConfig)
    tiny = bool(os.environ.get("QF_TINY"))
    if tiny:
        m = ModelConfig(num_layers=2, num_decoder_layers=2, d_model=32,
                        d_kv=8, d_ff=64, num_heads=4,
                        adaptor_layer_num=1, adaptor_num_heads=4,
                        dropout_rate=0.0, vocab_size=spec.vocab_size,
                        kary=spec.kary,
                        max_output_length=spec.levels + 2)
        enc = EncoderConfig(family="t5", d_model=32, num_layers=2,
                            num_heads=4, d_ff=64,
                            t5_vocab_size=spec.vocab_size)
    else:
        m = ModelConfig(num_layers=12, num_decoder_layers=6, d_model=768,
                        d_kv=64, d_ff=3072, num_heads=12,
                        adaptor_layer_num=4, adaptor_num_heads=12,
                        dropout_rate=0.0, vocab_size=spec.vocab_size,
                        kary=spec.kary,
                        max_output_length=spec.levels + 2,
                        dtype="bfloat16")
        enc = EncoderConfig(family="t5", d_model=768, num_layers=12,
                            num_heads=12, d_ff=3072,
                            t5_vocab_size=spec.vocab_size,
                            dtype="bfloat16")
    cfg = MEVIConfig(
        rq=RQConfig(subvector_num=spec.levels,
                    subvector_bits=int(np.log2(spec.kary)),
                    emb_size=spec.d),
        model=m, encoder=enc,
        train=TrainConfig(
            train_batch_size=env_int("QF_BATCH", 512 if not tiny else 16),
            num_train_epochs=env_int("QF_EPOCHS", 8 if not tiny else 2),
            learning_rate=2e-4, decoder_learning_rate=1e-4,
            warmup_steps=1000 if not tiny else 4),
        ckpt_dir=osp.join(workdir, "ckpts"))
    cfg.finalize()
    return cfg


def stage_data(spec, workdir):
    import jax.numpy as jnp
    from mevi_tpu.data import io as dio
    from mevi_tpu.data import synth

    os.makedirs(workdir, exist_ok=True)
    synth.save_spec(spec, osp.join(workdir, "spec.json"))
    tab = synth.make_tables(spec)
    tables = (jnp.asarray(tab[0]), jnp.asarray(tab[1]))
    draws = synth.make_draws(spec)
    t0 = time.time()
    # center_last (default on since r05): without it the last RQ level
    # was degenerate (78% of prefixes -> ONE leaf) and big-corpus
    # serving cap-truncated the buckets; see ops.rq.rq_train
    center = os.environ.get("QF_RQ_CENTER", "1") == "1"
    cbs, codes = synth.fit_rq_codes(spec, tables, draws,
                                    center_levels=center)
    log(f"RQ fit+assign: {time.time() - t0:.1f}s")
    leaves = len(np.unique(
        (codes.astype(np.int64) *
         (spec.kary ** np.arange(spec.levels - 1, -1, -1))).sum(1)))
    log(f"distinct leaf codes: {leaves}")
    np.save(osp.join(workdir, "codebooks.npy"), cbs)
    np.save(osp.join(workdir, "codes.npy"), codes)
    if center:
        # the conditioning tables are part of the quantizer: bench's
        # bigger-corpus re-assign must subtract them (synth.py
        # fit_rq_codes(prefix_shift=...))
        shift_p = osp.join(spec.cache_dir() + "_hrq", "prefix_shift.npz")
        import shutil
        shutil.copyfile(shift_p, osp.join(workdir, "prefix_shift.npz"))

    U = env_int("QF_UTT", 4)
    n_rows = spec.ndoc * U
    host = np.random.default_rng(spec.seed + 21)
    order = host.permutation(
        np.repeat(np.arange(spec.ndoc, dtype=np.int64), U))
    t0 = time.time()
    # write token memmaps chunk-wise (the L1 contract:
    # prepare_passage_tokenized.py:83-88 int64 (n, L) tokens+masks)
    ids_p = osp.join(workdir, "trainq_tokens.bin")
    mask_p = osp.join(workdir, "trainq_masks.bin")
    ids_mm = np.memmap(ids_p, np.int64, "w+", shape=(n_rows, spec.qlen))
    mask_mm = np.memmap(mask_p, np.int64, "w+",
                        shape=(n_rows, spec.qlen))
    CH = 1 << 19
    for s in range(0, n_rows, CH):
        e = min(n_rows, s + CH)
        ids_mm[s:e] = synth.query_tokens(spec, draws[order[s:e]], host)
        mask_mm[s:e] = 1
    ids_mm.flush(); mask_mm.flush()
    np.save(osp.join(workdir, "codes_rows.npy"), codes[order])
    np.save(osp.join(workdir, "train_order.npy"), order)
    log(f"train utterances {n_rows}: {time.time() - t0:.1f}s")

    n_dev = env_int("QF_NDEV", 2048)
    dev_docs = host.integers(0, spec.ndoc, n_dev)
    dev_tok = synth.query_tokens(spec, draws[dev_docs],
                                 np.random.default_rng(spec.seed + 99))
    np.save(osp.join(workdir, "dev_docs.npy"), dev_docs)
    np.save(osp.join(workdir, "dev_tokens.npy"), dev_tok)
    # gt codes for the between-epoch dev probe (checkpoints rank on
    # coarse hit@10, not train loss)
    np.save(osp.join(workdir, "dev_codes.npy"), codes[dev_docs])
    log("data stage done")


def stage_train(spec, workdir, cfg):
    cfgp = osp.join(workdir, "cfg.json")
    with open(cfgp, "w") as fw:
        fw.write(cfg.to_json())
    cmd = [sys.executable, "-m", "mevi_tpu.cli.main", "train",
           "--config", cfgp,
           "--queries", osp.join(workdir, "trainq"),
           "--query_length", str(spec.qlen),
           "--codes", osp.join(workdir, "codes_rows.npy"),
           "--scan_steps", os.environ.get("QF_SCAN", "16"),
           "--log_every", "512",
           "--log_dir", workdir]
    dev_codes = osp.join(workdir, "dev_codes.npy")
    if osp.exists(dev_codes):
        cmd += ["--dev_queries", osp.join(workdir, "dev_tokens.npy"),
                "--dev_codes", dev_codes]
    if os.environ.get("QF_RESUME"):
        cmd += ["--resume", "best"]
    log("train:", " ".join(cmd))
    subprocess.run(cmd, check=True, cwd=REPO)


def _tower(cfg):
    from mevi_tpu.models.twin_tower import tower_from_config
    return tower_from_config(cfg.encoder).module


def _hard_negative_draws(spec, anchor_draws, host, hn):
    """(B, 4) anchor draws -> (B, hn, 4) hard negatives: same hierarchy
    prefix with a fresh pool row (within-leaf-cluster distractors — the
    discrimination the fine stage needs), and with prob 1/4 the last
    hierarchy level also resampled (cross-sibling-cluster distractors).
    The reference mines in-cluster hard negatives for its co-loss
    (``main_models.py:1813-1950``); here the generative family lets us
    SAMPLE them exactly."""
    B = len(anchor_draws)
    neg = np.repeat(anchor_draws[:, None, :], hn, axis=1).copy()
    neg[:, :, 3] = host.integers(0, spec.pool_n, (B, hn))
    flip = host.random((B, hn)) < 0.25
    neg[:, :, 2] = np.where(flip,
                            host.integers(0, spec.kary, (B, hn)),
                            neg[:, :, 2])
    return neg


def stage_tower(spec, workdir, cfg):
    """Query tower: tokens -> embedding, contrastive vs the fixed doc
    embeddings.  Round-5 recipe: in-batch negatives PLUS per-anchor
    hard negatives (same hierarchy prefix, different pool row — in-batch
    negatives at B=256 over 1M docs almost never share a cluster, so
    the r04 tower never learned within-cluster ranking: served MRR@10
    0.044 vs the posterior-mean oracle's 0.51, CEILING.json), and a
    dev exact-MIPS probe every QF_TOWER_PROBE steps that keeps the BEST
    params by (recall@100, mrr@10) — the recall-monitored checkpoint
    semantics of ``MEVI/main.py:89-170`` applied to the tower."""
    import jax
    import jax.numpy as jnp
    import optax
    from functools import partial
    from mevi_tpu.data import synth
    from mevi_tpu.models.t5 import T5Model
    from mevi_tpu.models.twin_tower import contrastive_loss
    from mevi_tpu.train.checkpoints import save_params_npz

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    tab = synth.make_tables(spec)
    tables = (jnp.asarray(tab[0]), jnp.asarray(tab[1]))
    draws = synth.make_draws(spec)

    tower = _tower(cfg)
    tiny = bool(os.environ.get("QF_TINY"))
    B = env_int("QF_TOWER_BATCH", 256)
    K = env_int("QF_TOWER_SCAN", 8)
    HN = env_int("QF_TOWER_HN", 7)      # co_neg_num=7, main.py:537
    steps = env_int("QF_TOWER_STEPS", 24000 if not tiny else 40)
    params = tower.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, spec.qlen), jnp.int32),
                        jnp.ones((1, spec.qlen), jnp.int32),
                        jnp.zeros((1, 1), jnp.int32))["params"]
    part = osp.join(workdir, "tower_params.partial.npz")
    start = 0
    if os.environ.get("QF_TOWER_RESUME") and osp.exists(part):
        # mid-run restart after a tunnel stall: params only (fresh
        # optimizer state), loaded BEFORE the optimizer so the cosine
        # schedule spans only the steps this run will take — a
        # schedule sized for `steps` restarts warmup at full peak on
        # converged params and never decays (observed divergence:
        # loss 2.0 -> 5.8 resuming 24k of 48k at peak 3e-4)
        from mevi_tpu.train.checkpoints import load_params_npz
        meta = np.load(part + ".step.npy") if \
            osp.exists(part + ".step.npy") else np.asarray(0)
        params = jax.device_put(load_params_npz(part))
        start = int(meta)
        log(f"tower resumed from step {start}")
    run_steps = max(steps - start, 1)
    peak_lr = float(os.environ.get(
        "QF_TOWER_LR", 3e-4 if start == 0 else 1e-4))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, peak_lr, max(run_steps // 20, 1), run_steps, 1e-5)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=0.01))
    opt_state = opt.init(params)
    align_w = float(os.environ.get("QF_TOWER_ALIGN", 4.0))

    @partial(jax.jit, donate_argnums=(0, 1))
    def chunk(params, opt_state, toks, p_draws):
        def body(carry, xs):
            params, opt_state = carry
            tok, pdr = xs                 # pdr: (B*(1+HN), 4) grouped
            p_rep = synth.gen_rows(tables, pdr)

            def lf(p):
                q = tower.apply({"params": p}, tok,
                                jnp.ones_like(tok),
                                method=T5Model.first_token_rep)
                qf = q.astype(jnp.float32)
                # normalize q inside the loss only: per-query MIPS
                # ranking is invariant to ||q||, and a fixed temperature
                # on cos keeps the softmax scale stable across training
                qn = qf / (jnp.linalg.norm(qf, axis=-1, keepdims=True)
                           + 1e-6)
                pf = p_rep.astype(jnp.float32)
                # grouped layout [q0_pos, q0_neg..., q1_pos, ...]:
                # in-batch + every anchor's hard negatives in one CE
                # (negatives_x_sample, document_encoder.py:78-92)
                loss, _ = contrastive_loss(qn * 20.0, pf)
                # direct alignment to the (unit-norm) doc embedding:
                # under info dropout its minimizer is the posterior
                # mean — the oracle tower of eval/ceiling.py
                pos = pf[::(1 + HN)]
                align = jnp.mean(1.0 - jnp.sum(qn * pos, -1))
                # gentle ||q|| ~ 1 pull: per-query ranking is norm-
                # invariant but the ensemble fusion adds ABSOLUTE
                # bonuses to raw scores (ensemble_marco.py:235-238), so
                # score scales should be comparable across queries
                nw = float(os.environ.get("QF_TOWER_NORM_W", 0.01))
                norms = jnp.linalg.norm(qf, axis=-1)
                norm_pen = jnp.mean((norms - 1.0) ** 2)
                return loss + align_w * align + nw * norm_pen
            loss, grads = jax.value_and_grad(lf)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (toks, p_draws))
        return params, opt_state, losses[-1]

    # ---- dev exact-MIPS probe (jitted once; scan over corpus chunks) --
    n_probe = env_int("QF_TOWER_NPROBE", 512 if not tiny else 64)
    dev_docs = np.load(osp.join(workdir, "dev_docs.npy"))[:n_probe]
    dev_tok = np.load(osp.join(workdir, "dev_tokens.npy"))[:n_probe]
    dev_ids = jnp.asarray(dev_tok.astype(np.int32))
    CH = min(1 << 16, spec.ndoc)
    nch = (spec.ndoc + CH - 1) // CH
    pad = nch * CH - spec.ndoc
    draws_pad = np.concatenate([draws, draws[:1].repeat(pad, 0)]) \
        if pad else draws
    draws_dev = jnp.asarray(draws_pad.reshape(nch, CH, -1))

    @jax.jit
    def probe_topk(params, draws_dev, dev_ids):
        # draws_dev passed as an ARGUMENT: a closed-over 16 MB device
        # array would serialize into the program body on the tunneled
        # deployment (HTTP 413, CLAUDE.md)
        q = tower.apply({"params": params}, dev_ids,
                        jnp.ones_like(dev_ids),
                        method=T5Model.first_token_rep)
        q = q.astype(jnp.float32)

        def body(carry, xs):
            bs, bi = carry
            dr, base = xs
            s = q @ synth.gen_rows(tables, dr).T
            idx = base + jnp.arange(CH, dtype=jnp.int32)
            cs = jnp.concatenate([bs, s], 1)
            ci = jnp.concatenate(
                [bi, jnp.broadcast_to(idx[None], s.shape)], 1)
            ts, ti = jax.lax.top_k(cs, 100)
            return (ts, jnp.take_along_axis(ci, ti, 1)), ()
        init = (jnp.full((n_probe, 100), -jnp.inf, jnp.float32),
                jnp.full((n_probe, 100), -1, jnp.int32))
        bases = jnp.arange(nch, dtype=jnp.int32) * CH
        (_, ids_), _ = jax.lax.scan(body, init, (draws_dev, bases))
        return ids_

    def probe(params):
        ids_ = np.asarray(probe_topk(params, draws_dev, dev_ids))
        ids_ = np.where(ids_ < spec.ndoc, ids_, -1)
        found = ids_ == dev_docs[:, None]
        pos = np.argmax(found, 1)
        hit = found.any(1)
        r100 = float(hit.mean())
        mrr = float(np.where(hit & (pos < 10), 1.0 / (pos + 1), 0.0)
                    .mean())
        return r100, mrr

    host = np.random.default_rng(spec.seed + 31)
    t0 = time.time()
    loss = None
    save_every = env_int("QF_TOWER_SAVE_EVERY", 4000)
    probe_every = env_int("QF_TOWER_PROBE", 2000 if not tiny else 16)
    best = (-1.0, -1.0)
    best_step = None
    meta_p = osp.join(workdir, "tower_meta.json")
    if os.environ.get("QF_TOWER_RESUME") and osp.exists(meta_p):
        # don't let a resumed run's first (often worse) probe overwrite
        # a better already-shipped tower_params.npz
        try:
            with open(meta_p) as fr:
                m = json.load(fr)
            best = (m.get("recall@100", -1.0), m.get("mrr@10", -1.0))
            best_step = m.get("best_step")
        except Exception:
            pass
    probe_log = open(osp.join(workdir, "tower_probe.jsonl"), "a")

    def run_probe(it):
        nonlocal best, best_step
        r100, mrr = probe(params)
        probe_log.write(json.dumps(
            {"step": it, "recall@100": round(r100, 4),
             "mrr@10": round(mrr, 4)}) + "\n")
        probe_log.flush()
        log(f"tower probe @{it}: exact-MIPS recall@100 {r100:.4f} "
            f"mrr@10 {mrr:.4f}")
        if (r100, mrr) > best:
            best = (r100, mrr)
            best_step = it
            save_params_npz(osp.join(workdir, "tower_params.best.npz"),
                            params)
            # ship immediately: a tower killed mid-run (tunnel outage,
            # stage timeout) must still leave a COMPLETE servable
            # bundle — bench._bundle_complete requires tower_params.npz
            save_params_npz(osp.join(workdir, "tower_params.npz"),
                            params)
            with open(osp.join(workdir, "tower_meta.json"), "w") as fw:
                json.dump({"monitor": "dev_exact_mips_recall@100",
                           "best_step": best_step,
                           "recall@100": best[0], "mrr@10": best[1],
                           "steps": steps, "hard_negatives": HN,
                           "align_w": align_w, "partial": True}, fw)

    for it in range(start, steps, K):
        docs = host.integers(0, spec.ndoc, (K, B))
        toks = np.stack([synth.query_tokens(spec, draws[d], host)
                         for d in docs])
        adr = draws[docs]                              # (K, B, 4)
        neg = np.stack([_hard_negative_draws(spec, adr[k], host, HN)
                        for k in range(K)])            # (K, B, HN, 4)
        grouped = np.concatenate([adr[:, :, None, :], neg], axis=2) \
            .reshape(K, B * (1 + HN), 4)
        params, opt_state, loss = chunk(
            params, opt_state, jnp.asarray(toks), jnp.asarray(grouped))
        if (it // K) % 20 == 0:
            log(f"tower step {it + K}/{steps} loss {float(loss):.4f} "
                f"({(it + K - start) * B / max(time.time() - t0, 1e-9):.0f}"
                f" ex/s)")
        if probe_every and (it + K - start) % \
                max(probe_every // K * K, K) == 0:
            run_probe(it + K)
        if save_every and (it // K) % max(save_every // K, 1) == 0 \
                and it > start:
            save_params_npz(part, params)
            np.save(part + ".step.npy", np.asarray(it + K))
    run_probe(steps)
    probe_log.close()
    log(f"tower trained: {time.time() - t0:.1f}s loss {float(loss):.4f} "
        f"best probe {best} @ step {best_step}")
    # ship the probe-best params (falls back to last when probing was
    # disabled)
    best_p = osp.join(workdir, "tower_params.best.npz")
    if osp.exists(best_p) and best[0] >= 0:
        import shutil
        shutil.copyfile(best_p, osp.join(workdir, "tower_params.npz"))
        with open(osp.join(workdir, "tower_meta.json"), "w") as fw:
            json.dump({"monitor": "dev_exact_mips_recall@100",
                       "best_step": best_step,
                       "recall@100": best[0], "mrr@10": best[1],
                       "steps": steps, "hard_negatives": HN,
                       "align_w": align_w, "partial": False}, fw)
    else:
        save_params_npz(osp.join(workdir, "tower_params.npz"), params)


def _load_nci_params(workdir, cfg):
    from mevi_tpu.train.checkpoints import (CheckpointManager,
                                            restore_tree_host)
    mgr = CheckpointManager.from_dir(osp.join(cfg.ckpt_dir, "nci"))
    tag = mgr.best_tag()
    assert tag is not None, "no NCI checkpoint found"
    path = osp.abspath(osp.join(cfg.ckpt_dir, "nci", tag))
    restored = restore_tree_host(path)
    log(f"loaded NCI checkpoint {tag}")
    return restored["params"]


def stage_eval(spec, workdir, cfg, out_path):
    import jax
    import jax.numpy as jnp
    from mevi_tpu.cli.main import _nci_dims
    from mevi_tpu.data import synth
    from mevi_tpu.eval.searcher import FineIndex
    from mevi_tpu.models.nci import NCIT5
    from mevi_tpu.serve import PallasServer
    from mevi_tpu.train.checkpoints import load_params_npz
    from mevi_tpu.utils.native import build_csr
    from mevi_tpu.ops.mips import mips_topk

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    on_tpu = jax.devices()[0].platform != "cpu"
    dt = jnp.bfloat16 if on_tpu else jnp.float32

    nci = NCIT5(_nci_dims(cfg, dropout=0.0))
    nci_params = _load_nci_params(workdir, cfg)
    tower = _tower(cfg)
    tower_params = load_params_npz(osp.join(workdir, "tower_params.npz"))

    tab = synth.make_tables(spec)
    tables = (jnp.asarray(tab[0]), jnp.asarray(tab[1]))
    draws = synth.make_draws(spec)
    codes = np.load(osp.join(workdir, "codes.npy"))
    offsets, doc_ids = build_csr(codes, spec.kary)
    CAP = env_int("QF_CAP", 512)
    t0 = time.time()
    semb = synth.fill_sorted_matrix(spec, tables, draws, doc_ids,
                                    n_pad_rows=CAP + 8, dtype=dt)
    fine = FineIndex(jnp.asarray(offsets.astype(np.int64)),
                     jnp.asarray(doc_ids), semb, spec.levels, spec.kary,
                     host_offsets=offsets, host_doc_ids=doc_ids)
    log(f"fine index in HBM: {time.time() - t0:.1f}s")

    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dt)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
    if on_tpu:
        nci_params = cast(nci_params)
        tower_params = cast(tower_params)
    NBEAM = env_int("QF_BEAMS", 10)
    POOL = env_int("QF_POOL", 1000)
    server = PallasServer(tower, nci, tower_params, nci_params, fine,
                          num_beams=NBEAM, cap=CAP, pool=POOL)

    dev_docs = np.load(osp.join(workdir, "dev_docs.npy"))
    dev_tok = np.load(osp.join(workdir, "dev_tokens.npy"))
    n_dev = len(dev_docs)
    B = min(env_int("QF_EVAL_BATCH", 256), n_dev)
    n_use = (n_dev // B) * B
    gt_codes = codes[dev_docs]

    all_codes, all_ids, all_ndoc, all_fs, all_bs = [], [], [], [], []
    t0 = time.time()
    handles = []
    for s in range(0, n_use, B):
        ids = jnp.asarray(dev_tok[s:s + B].astype(np.int32))
        handles.append(server.query_device(ids, jnp.ones_like(ids)))
    for h in handles:
        scores, ids_, codes_, bscores, ndoc = server.finalize(h)
        all_codes.append(codes_); all_ids.append(ids_)
        all_ndoc.append(ndoc); all_fs.append(scores)
        all_bs.append(bscores)
    dt_serve = time.time() - t0
    beam_codes = np.concatenate(all_codes)      # (n, nb, M)
    fine_ids = np.concatenate(all_ids)          # (n, pool)
    ndoc = np.concatenate(all_ndoc)
    gt = gt_codes[:n_use]
    eq = (beam_codes == gt[:, None, :]).all(-1)         # (n, nb)
    hit1 = float(eq[:, 0].mean())
    hit10 = float(eq.any(1).mean())
    # per-level diagnosis of the top beam (which RQ level limits hit@1:
    # prefix_acc[l] = P(levels 0..l all correct in beam 0))
    lvl_eq = (beam_codes[:, 0, :] == gt)                 # (n, M)
    prefix = np.cumprod(lvl_eq, axis=1)
    level_acc = [round(float(lvl_eq[:, l].mean()), 4)
                 for l in range(gt.shape[1])]
    prefix_acc = [round(float(prefix[:, l].mean()), 4)
                  for l in range(gt.shape[1])]
    pos = np.argmax(fine_ids == dev_docs[:n_use, None], axis=1)
    found = (fine_ids == dev_docs[:n_use, None]).any(1)
    rec = {k: float(((pos < k) & found).mean()) for k in (1, 10, 100)}
    mrr10 = float(np.where(found & (pos < 10), 1.0 / (pos + 1), 0.0)
                  .mean())

    # beam-major reordering of the SAME served pool: rank buckets by
    # their beam rank, docs within a bucket by tower score.  The Bayes
    # diagnostic shows the code posterior nearly identifies the doc
    # (median candidate set = 1), so the NCI beam's bucket ordering is
    # the strong early-precision signal and the tower should only break
    # ties WITHIN a bucket — the global tower re-rank throws that
    # ordering away (r04/r05 MRR@10 ~ 0.05 vs coarse hit@1 ~ 0.24).
    fs_full = np.concatenate(all_fs).astype(np.float32)   # (n, pool)
    bs_full = np.concatenate(all_bs).astype(np.float32)   # (n, nb)
    cand_codes = codes[np.clip(fine_ids, 0, None)]        # (n, pool, M)
    match = (cand_codes[:, :, None, :]
             == beam_codes[:n_use, None, :, :]).all(-1)   # (n, pool, nb)
    crank = np.where(match.any(-1), match.argmax(-1), NBEAM)
    crank = np.where(fine_ids >= 0, crank, NBEAM + 1)
    fsf = np.where(fine_ids >= 0, fs_full, 0.0)
    span = float(fsf.max() - fsf.min()) + 1.0
    bm_order = np.argsort(crank.astype(np.float64) * span - fsf,
                          axis=1, kind="stable")
    ids_bm = np.take_along_axis(fine_ids, bm_order, 1)
    bm_found = ids_bm == dev_docs[:n_use, None]
    bm_pos = np.argmax(bm_found, 1)
    bm_hit = bm_found.any(1)
    bm_rec = {k: float(((bm_pos < k) & bm_hit).mean())
              for k in (1, 10, 100)}
    bm_mrr10 = float(np.where(bm_hit & (bm_pos < 10),
                              1.0 / (bm_pos + 1), 0.0).mean())

    # persist the served arrays: every downstream re-ranking /fusion
    # experiment becomes an offline numpy job instead of a chip serve
    np.savez_compressed(
        osp.join(workdir, "served_eval.npz"),
        fine_ids=fine_ids, fine_scores=fs_full,
        beam_codes=beam_codes[:n_use], beam_scores=bs_full,
        ndoc=ndoc, dev_docs=dev_docs[:n_use])

    # tower-embedding exact-MIPS list (the 'ANN path' — replaces faiss
    # HNSW, faiss_search.py:13-21) for the ceiling AND the ensemble
    n_ceil = min(1024, n_use)
    q_rep = jax.jit(lambda p, i, m: tower.apply(
        {"params": p}, i, m, method=type(tower).first_token_rep))(
        tower_params, jnp.asarray(dev_tok[:n_ceil].astype(np.int32)),
        jnp.ones((n_ceil, spec.qlen), jnp.int32))
    ann_s, rows = mips_topk(q_rep.astype(dt), semb, k=100)
    ids_exact = doc_ids[np.clip(np.asarray(rows), 0, len(doc_ids) - 1)]
    ann_s = np.asarray(ann_s, np.float32)
    ann_found = ids_exact == dev_docs[:n_ceil, None]
    ceil100 = float(ann_found.any(1).mean())
    ann_pos = np.argmax(ann_found, 1)
    ann_hit = ann_found.any(1)
    ann_mrr10 = float(np.where(ann_hit & (ann_pos < 10),
                               1.0 / (ann_pos + 1), 0.0).mean())
    # leg diversity: fusion only helps where the ANN and fine lists
    # DISAGREE (round-4 fusion gained +0.012 because both legs shared
    # the same weak tower; report the overlap so that is visible)
    overlap100 = float(np.mean([
        len(set(ids_exact[i].tolist())
            & set(fine_ids[i][fine_ids[i] >= 0][:100].tolist())) / 100.0
        for i in range(n_ceil)]))

    # ensemble fusion (ensemble_marco.py:221-240 semantics) of the ANN
    # list with the coarse/fine MEVI lists, at the default a/b/g
    from mevi_tpu.eval.ensemble import run_ensemble
    qnames = [f"q{i}" for i in range(n_ceil)]
    gts = {q: [int(dev_docs[i])] for i, q in enumerate(qnames)}
    ance_preds = {q: ids_exact[i].tolist() for i, q in enumerate(qnames)}
    ance_scores = {q: ann_s[i].tolist() for i, q in enumerate(qnames)}
    coarse_clusters = {q: [tuple(c) for c in beam_codes[i]]
                       for i, q in enumerate(qnames)}
    fine_preds, fine_scores_m = {}, {}
    fs_all = np.concatenate(all_fs)[:n_ceil]
    for i, q in enumerate(qnames):
        keep = fine_ids[i] >= 0
        fine_preds[q] = fine_ids[i][keep][:100].tolist()
        fine_scores_m[q] = fs_all[i][keep][:100].tolist()
    mapping = {int(d): tuple(codes[int(d)])
               for i in range(n_ceil)
               for d in list(ids_exact[i]) + fine_preds[qnames[i]]}
    # grid over the fusion weights on dev, like the reference's
    # ensemble runs (ensemble_marco.py:249-260 loops alpha/beta/gamma);
    # report the default point AND the dev-best point with its weights
    # large-alpha/beta=1 points make the fused ordering lexicographic
    # (cluster rank major, score as tiebreak) — the beam-major ordering
    # expressed inside the reference's own fusion formula
    ens = run_ensemble(gts, ance_preds, ance_scores, coarse_clusters,
                       mapping, fine_preds, fine_scores_m,
                       alphas=(0.3, 0.6, 0.9, 1.5, 3.0, 10.0, 50.0),
                       betas=(0.0, 0.01, 0.03, 0.1, 1.0),
                       gammas=(0.0, 0.02, 0.05, 0.1),
                       recall_ks=(10, 100))
    ens_m = ens[(0.6, 0.03, 0.02)]
    best_w = max(ens, key=lambda w: (ens[w]["recall"][100],
                                     ens[w]["mrr"][10]))
    ens_b = ens[best_w]
    best_wm = max(ens, key=lambda w: (ens[w]["mrr"][10],
                                      ens[w]["recall"][100]))
    ens_bm = ens[best_wm]
    # reciprocal-rank fusion (beyond-parity rank-space alternative)
    from mevi_tpu.eval.ensemble import rrf_fuse
    from mevi_tpu.eval.metrics import evaluate_scores
    rrf = evaluate_scores(gts, rrf_fuse([ance_preds, fine_preds]),
                          recall_ks=(10, 100))

    # data ceiling (Bayes + posterior-mean oracle tower) on the same
    # dev slice — trained numbers are reported measured/ceiling
    from mevi_tpu.eval.ceiling import ceiling_report
    ceil = ceiling_report(spec, tab, draws, codes,
                          dev_tok[:n_ceil], dev_docs[:n_ceil])

    # served-fine with the ORACLE tower embeddings + the TRAINED beam's
    # clusters: isolates the beam's contribution from the tower's (what
    # the pipeline would retrieve if the tower were perfect)
    from mevi_tpu.eval.ceiling import observed_info, \
        oracle_tower_embeddings
    from mevi_tpu.eval.searcher import fine_rerank
    q_orc = oracle_tower_embeddings(
        spec, tab, observed_info(spec, dev_tok[:n_ceil]))
    # chunk like the serve loop: one jit call over all 1024 queries
    # needs ~22.5 GiB of HLO temps (1024 x 10*CAP candidate gathers)
    # and OOMs the 15.75 GiB chip
    orc_chunks = []
    for s in range(0, n_ceil, B):
        _, oc_ids, _ = fine_rerank(
            jnp.asarray(q_orc[s:s + B]).astype(dt),
            jnp.asarray(beam_codes[s:s + B]),
            fine.offsets, fine.doc_ids, fine.sorted_emb, spec.kary,
            CAP, 100)
        orc_chunks.append(np.asarray(oc_ids))
    orc_ids = np.concatenate(orc_chunks)
    orc_found = orc_ids == dev_docs[:n_ceil, None]
    orc_pos = np.argmax(orc_found, 1)
    orc_hit = orc_found.any(1)
    oracle_fine = {
        "recall@100": round(float(orc_hit.mean()), 4),
        "mrr@10": round(float(np.where(orc_hit & (orc_pos < 10),
                                       1.0 / (orc_pos + 1), 0.0)
                              .mean()), 4)}

    # checkpoint-board provenance: which monitor ranked the served NCI
    # checkpoint (the reference's recall-monitored ModelCheckpoint,
    # MEVI/main.py:89-170) and the board itself (best-vs-rest visible)
    ckpt_meta = {}
    board_dir = osp.join(cfg.ckpt_dir, "nci")
    try:
        with open(osp.join(board_dir, "leaderboard.meta.json")) as fr:
            ckpt_meta = json.load(fr)
        with open(osp.join(board_dir, "leaderboard.json")) as fr:
            ckpt_meta["board"] = json.load(fr)
    except Exception:
        pass
    tower_meta = {}
    try:
        with open(osp.join(workdir, "tower_meta.json")) as fr:
            tower_meta = json.load(fr)
    except Exception:
        pass

    out = {
        "config": "T5-base NCI (12+6, d=768, PAWA-4) + t5-base tower, "
                  "RQ 4x32" if not os.environ.get("QF_TINY")
                  else "tiny smoke",
        "ndoc": spec.ndoc, "n_dev": n_use,
        "coarse_hit@1": round(hit1, 4), "coarse_hit@10": round(hit10, 4),
        "fine_recall@1": round(rec[1], 4),
        "fine_recall@10": round(rec[10], 4),
        "fine_recall@100": round(rec[100], 4),
        "fine_mrr@10": round(mrr10, 4),
        "tower_exact_mips_recall@100": round(ceil100, 4),
        "ensemble_recall@10": round(ens_m["recall"][10], 4),
        "ensemble_recall@100": round(ens_m["recall"][100], 4),
        "ensemble_mrr@10": round(ens_m["mrr"][10], 4),
        "ensemble_best_weights": list(best_w),
        "ensemble_best_recall@10": round(ens_b["recall"][10], 4),
        "ensemble_best_recall@100": round(ens_b["recall"][100], 4),
        "ensemble_best_mrr@10": round(ens_b["mrr"][10], 4),
        "ensemble_mrr_best_weights": list(best_wm),
        "ensemble_mrr_best_recall@100": round(ens_bm["recall"][100], 4),
        "ensemble_mrr_best_mrr@10": round(ens_bm["mrr"][10], 4),
        "beam_major_fine_recall@1": round(bm_rec[1], 4),
        "beam_major_fine_recall@10": round(bm_rec[10], 4),
        "beam_major_fine_recall@100": round(bm_rec[100], 4),
        "beam_major_fine_mrr@10": round(bm_mrr10, 4),
        "ann_recall@100": round(ceil100, 4),
        "ann_mrr@10": round(ann_mrr10, 4),
        "overlap_ann_fine@100": round(overlap100, 4),
        "ensemble_rrf_recall@100": round(rrf["recall"][100], 4),
        "ensemble_rrf_mrr@10": round(rrf["mrr"][10], 4),
        "oracle_tower_served_fine": oracle_fine,
        "ndoc_per_query": round(float(ndoc.mean()), 1),
        "serve_s_for_n_dev": round(dt_serve, 2),
        "beams": NBEAM, "cap": CAP, "pool": POOL,
        "top_beam_level_acc": level_acc,
        "top_beam_prefix_acc": prefix_acc,
        **ceil,
        "fine_recall@100_vs_oracle_tower": round(
            rec[100] / max(ceil["oracle_tower_recall@100"], 1e-9), 4),
        "coarse_hit@10_vs_bayes": round(
            hit10 / max(ceil["bayes_coarse_hit@10"], 1e-9), 4),
        "nci_ckpt": ckpt_meta,
        "tower_ckpt": tower_meta,
    }
    with open(out_path, "w") as fw:
        fw.write(json.dumps(out) + "\n")
    print(json.dumps(out), flush=True)


def stage_sharded(spec, workdir, cfg, out_path):
    """DP-infer parity for the TRAINED bundle (reference: mp.spawn NCCL
    inference, ``MEVI/main.py:289-337``): serve a dev slice through
    ``make_sharded_server`` on an 8-virtual-device (data=2, corpus=4)
    CPU mesh and through the single-device fine path, and assert the
    metrics (and the retrieved id sets) match.  Writes
    ``SHARDED_PARITY.json`` next to the QUALITY artifact.

    Run as its OWN process (QF_STAGE=sharded): the 8-device CPU mesh
    needs XLA_FLAGS set before jax initializes.
    """
    # T5-base per-shard programs skew >40 s across the 8 contending
    # host threads; XLA's CPU in-process collective aborts the process
    # at its default rendezvous termination timeout — raise it (the
    # virtual mesh is a correctness harness, not a perf one)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
        + " --xla_cpu_collective_timeout_seconds=1800"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mevi_tpu.cli.main import _nci_dims
    from mevi_tpu.data import synth
    from mevi_tpu.eval.searcher import fine_rerank
    from mevi_tpu.decode.beam import nci_beam_search_incremental
    from mevi_tpu.models.nci import NCIT5
    from mevi_tpu.parallel.mesh import (DATA_AXIS, make_mesh, shard_rows)
    from mevi_tpu.serve import make_sharded_server
    from mevi_tpu.train.checkpoints import load_params_npz
    from mevi_tpu.utils.native import build_csr
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert len(jax.devices()) >= 8, "needs the 8-virtual-device mesh"
    mesh = make_mesh(8, corpus=4)
    # f32 compute for the parity harness: the serving bundles run bf16,
    # and bf16 forwards at different batch shapes round differently
    # (measured: fine-score diffs up to 2e-2 on scores ~23 purely from
    # the data-sharded tower batch) — parity must compare the PATHS,
    # not the rounding
    import dataclasses as _dc
    cfg = _dc.replace(cfg, model=_dc.replace(cfg.model, dtype="float32"),
                      encoder=_dc.replace(cfg.encoder, dtype="float32"))
    nci = NCIT5(_nci_dims(cfg, dropout=0.0))
    nci_params = _load_nci_params(workdir, cfg)
    tower = _tower(cfg)
    tower_params = load_params_npz(osp.join(workdir, "tower_params.npz"))

    tab = synth.make_tables(spec)
    tables = (jnp.asarray(tab[0]), jnp.asarray(tab[1]))
    draws = synth.make_draws(spec)
    codes = np.load(osp.join(workdir, "codes.npy"))
    offsets, doc_ids = build_csr(codes, spec.kary)
    CAP = env_int("QF_CAP", 512)
    POOL = env_int("QF_POOL", 1000)
    NBEAM = env_int("QF_BEAMS", 10)
    t0 = time.time()
    semb = synth.fill_sorted_matrix(spec, tables, draws, doc_ids,
                                    n_pad_rows=CAP + 8,
                                    dtype=jnp.float32)
    semb_h = np.asarray(semb)
    del semb
    log(f"sorted matrix: {time.time() - t0:.1f}s "
        f"({semb_h.nbytes / 2**30:.1f} GiB f32)")

    B = env_int("QF_SHARD_B", 32)
    dev_docs = np.load(osp.join(workdir, "dev_docs.npy"))[:B]
    dev_tok = np.load(osp.join(workdir, "dev_tokens.npy"))[:B]
    ids_q = jnp.asarray(dev_tok.astype(np.int32))
    mask_q = jnp.ones_like(ids_q)
    off_dev = jnp.asarray(offsets.astype(np.int64))
    did_dev = jnp.asarray(doc_ids)

    # --- sharded path (corpus rows split over 4, queries over 2) -----
    emb_sh = shard_rows(semb_h, mesh)
    serve = make_sharded_server(tower, nci, mesh,
                                num_beams=NBEAM, cap=CAP, pool=POOL)
    ids_sh_q = jax.device_put(
        np.asarray(ids_q), NamedSharding(mesh, P(DATA_AXIS, None)))
    mask_sh_q = jax.device_put(
        np.asarray(mask_q), NamedSharding(mesh, P(DATA_AXIS, None)))
    t0 = time.time()
    s_sh, i_sh, c_sh, _ = serve(tower_params, nci_params, ids_sh_q,
                                mask_sh_q, off_dev, did_dev, emb_sh)
    i_sh = np.asarray(i_sh)
    c_sh = np.asarray(c_sh)
    dt_sh = time.time() - t0
    log(f"sharded serve {B} queries: {dt_sh:.1f}s")

    # --- single-device path (same beam fn, same fine math) -----------
    from mevi_tpu.models.t5 import T5Model
    codes_1, _, _ = nci_beam_search_incremental(
        nci, nci_params, ids_q, mask_q, NBEAM)
    qemb_1 = tower.apply({"params": tower_params}, ids_q, mask_q,
                         method=T5Model.first_token_rep)
    semb_dev = jnp.asarray(semb_h)
    fs_1, fids_1, _ = fine_rerank(qemb_1, codes_1, off_dev, did_dev,
                                  semb_dev, spec.kary, CAP, POOL)
    fids_1 = np.asarray(fids_1)
    fs_1 = np.asarray(fs_1, np.float32)
    codes_1 = np.asarray(codes_1)
    s_sh = np.asarray(s_sh, np.float32)

    # --- parity -------------------------------------------------------
    assert (codes_1 == c_sh).all(), "beam codes diverged across paths"

    def canonical(ids_, scores_):
        """The two paths produce identical (score, id) multisets but
        different tie order (duplicate-beam duplicates rank in
        local-then-global top-k order on the mesh); canonicalize by
        (-score, id) so metrics compare the retrieval CONTENT."""
        out = np.full((B, 100), -1, ids_.dtype)
        for i in range(B):
            keep = ids_[i] >= 0
            order = np.lexsort((ids_[i][keep], -scores_[i][keep]))
            out[i, :min(100, keep.sum())] = ids_[i][keep][order][:100]
        return out

    def metrics(fids):
        found = fids[:, :100] == dev_docs[:, None]
        hit = found.any(1)
        pos = np.argmax(found, 1)
        return {"recall@100": round(float(hit.mean()), 4),
                "mrr@10": round(float(np.where(
                    hit & (pos < 10), 1.0 / (pos + 1), 0.0).mean()), 4)}
    c_i_sh = canonical(i_sh, s_sh)
    c_i_1 = canonical(fids_1, fs_1)
    m_sh, m_1 = metrics(c_i_sh), metrics(c_i_1)
    if m_sh != m_1 or os.environ.get("QF_SHARD_DUMP"):
        np.savez(osp.join(workdir, "sharded_debug.npz"),
                 i_sh=i_sh, s_sh=s_sh, fids_1=fids_1, fs_1=fs_1,
                 dev_docs=dev_docs, c_i_sh=c_i_sh, c_i_1=c_i_1)
    overlap = np.mean([
        len(set(c_i_sh[i][c_i_sh[i] >= 0].tolist())
            & set(c_i_1[i][c_i_1[i] >= 0].tolist())) /
        max(len(set(c_i_1[i][c_i_1[i] >= 0].tolist())), 1)
        for i in range(B)])
    assert m_sh == m_1, f"sharded {m_sh} != single {m_1}"
    assert overlap > 0.99, f"top-100 id overlap {overlap:.4f}"
    out = {"metric": "sharded_trained_parity", "n_queries": B,
           "mesh": {"data": 2, "corpus": 4}, "ndoc": spec.ndoc,
           "sharded": m_sh, "single": m_1,
           "top100_overlap": round(float(overlap), 4),
           "beam_codes_equal": True,
           "sharded_serve_s": round(dt_sh, 1)}
    p = osp.join(workdir, "SHARDED_PARITY.json")
    with open(p, "w") as fw:
        fw.write(json.dumps(out) + "\n")
    print(json.dumps(out), flush=True)


def main():
    _maybe_force_cpu()
    stages = set(os.environ.get("QF_STAGE", "all").split(","))
    if "all" in stages:
        stages = {"data", "train", "tower", "eval"}
    workdir = os.environ.get(
        "QF_WORKDIR", osp.join(REPO, "data", "quality_r03"))
    spec_p = osp.join(workdir, "spec.json")
    if "data" not in stages and osp.exists(spec_p):
        # resume stages against the STAGED corpus spec (env drift must
        # not silently change the generative family mid-pipeline)
        from mevi_tpu.data.synth import load_spec
        spec = load_spec(spec_p)
    else:
        spec = make_spec()
    cfg = model_cfg(spec, workdir)
    out_path = os.environ.get("QF_OUT",
                              osp.join(workdir, "QUALITY.json"))
    if "data" in stages:
        stage_data(spec, workdir)
    if "train" in stages:
        stage_train(spec, workdir, cfg)
    if "tower" in stages:
        stage_tower(spec, workdir, cfg)
    if "eval" in stages:
        stage_eval(spec, workdir, cfg, out_path)
    if "sharded" in stages:
        stage_sharded(spec, workdir, cfg, out_path)


if __name__ == "__main__":
    main()
