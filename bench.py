"""End-to-end serving benchmark: queries/sec/chip on the MEVI eval path.

Measures the reference's headline serving configuration
(``marco_eval_nci_rq.sh``: T5-ANCE query tower + NCI beam-10 coarse
decode + in-cluster fine re-rank, recall pool 1000) on one TPU chip at
REAL geometry: MS-MARCO-scale corpus (8,841,823 docs x 768), RQ 4x32
codes from an actual k-means fit of a hierarchical synthetic corpus
(``mevi_tpu/data/synth.py``; cluster sizes carry realistic Zipf skew).

Two pipelines:

* **default** (random weights): qenc + beam run in full; the bucket
  stage is driven by ``cidx_override`` clusters sampled doc-weighted
  from the corpus (random NCI weights' beams land in empty clusters —
  the fine stage would otherwise do no work).
* **BENCH_CKPT=<quality workdir>** (trained weights from
  ``scripts/quality_full.py``): the beam's OWN codes drive the bucket
  kernel — no override anywhere — and gt-doc recall of the full served
  pipeline is reported from the same run.

Also captured in the same process:

* an on-device assert that the Pallas bucket kernel matches its XLA
  oracle on a sample,
* recall@100-vs-exact-MIPS of the cluster+cap fine stage (codebook-beam
  stand-in plus a COVERAGE-OPTIMAL oracle: clusters ranked by member
  count among the exact top-100).  ``oracle_cluster_coverage`` is a
  true upper bound on what ANY NBEAM-cluster coarse stage can cover
  pre-cap; the oracle's post-cap recall is a reference point (cap
  truncation can favor other cluster choices),
* a measured reference-style baseline: eval_batch_size=2, cache-less
  panel beam decode (``generation_utils.py:763`` use_cache=False), host
  round-trip between coarse and fine — the reference's serving
  architecture on the SAME chip, so ``vs_baseline`` is measured/measured,
* per-stage latency (dispatch-isolated) with MFU derived from XLA's
  compiled cost analysis + ``jax.profiler.trace`` device-op durations
  (no hand-rolled FLOP constants).

Measurement notes for tunneled TPU deployments (axon):
``jax.block_until_ready`` is a NO-OP — every timing fetches a result;
each dispatch/fetch is an HTTP RPC with a ~15-35 ms floor (measured and
reported as rpc_floor_ms).  The serving pipeline therefore returns ONE
packed array per batch (see ``PallasServer``) and distinct batches are
enqueued back-to-back.

Prints exactly ONE JSON line on stdout.
"""

import dataclasses
import json
import os
import sys
import time
from functools import partial

import numpy as np

BASELINE_QPS_FALLBACK = 100.0   # only if the measured baseline fails

# The axon remote-compile helper writes its logs to fd 1; keep stdout
# clean for the single JSON result line.  Hijacked lazily from main()
# so importing this module (tests) leaves the process stdout alone.
_REAL_STDOUT_FD = None

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mevi_jax_cache")


def _hijack_stdout():
    global _REAL_STDOUT_FD
    if _REAL_STDOUT_FD is None:
        _REAL_STDOUT_FD = os.dup(1)
        os.dup2(2, 1)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit_result(obj):
    sys.stdout.flush()
    if _REAL_STDOUT_FD is not None:
        os.dup2(_REAL_STDOUT_FD, 1)
    print(json.dumps(obj), flush=True)


def fetch1(out):
    """Force execution; fetch one element of the first leaf (each host
    fetch is its own RPC — fetch exactly one)."""
    import jax
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))
    return out


def run(NDOC, extras):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if os.environ.get("BENCH_FORCE_CPU"):
        # JAX_PLATFORMS env is pinned by the axon plugin; override late
        jax.config.update("jax_platforms", "cpu")

    from mevi_tpu.data import synth
    from mevi_tpu.decode.beam import nci_beam_search_incremental
    from mevi_tpu.models.nci import NCIDims, NCIT5
    from mevi_tpu.models.t5 import T5Dims, T5Model
    from mevi_tpu.ops import rq as rq_ops

    dev = jax.devices()[0]
    log(f"device: {dev}")
    on_tpu = dev.platform != "cpu"
    if not on_tpu:
        NDOC = min(NDOC, 20_000)

    ckpt_dir = os.environ.get("BENCH_CKPT")
    if ckpt_dir:
        spec = synth.load_spec(os.path.join(ckpt_dir, "spec.json"))
        if NDOC != spec.ndoc:
            # serve the trained bundle over a LARGER corpus of the same
            # generative family: the query language is compositional, so
            # the trained NCI generalizes to unseen docs — codes for the
            # big corpus are assigned with the TRAINING codebooks
            spec = dataclasses.replace(spec, ndoc=NDOC)
        D, KARY, M = spec.d, spec.kary, spec.levels
        QLEN = spec.qlen
    else:
        D = 768 if on_tpu else 64
        KARY, M, QLEN = 32, 4, 32
        spec = synth.SynthSpec(ndoc=NDOC, d=D, kary=KARY, levels=M,
                               seed=0, qlen=QLEN)

    BATCH = int(os.environ.get("BENCH_BATCH", 512 if on_tpu else 4))
    NBATCH = int(os.environ.get("BENCH_NBATCH", 20 if on_tpu else 3))
    NBEAM = 10
    POOL = 1000 if on_tpu else 100
    # BENCH_CAP: per-cluster row budget of the fine stage.  At big
    # corpora with skewed buckets the gt doc can sit beyond the cap
    # (pre-r05 indexes: only ~27k populated leaves at 8.84M docs);
    # raising it trades bucket-kernel time for fine recall — report
    # both sides when sweeping.
    CAP = int(os.environ.get("BENCH_CAP", 512 if on_tpu else 64))
    extras["cap"] = CAP
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    # corpus precision: bf16 (default) or int8 (halves the index to
    # 6.8 GB at 8.84M docs — full MS-MARCO scale fits one v5e with
    # headroom; quality loss is quantified by the recall checks below)
    corpus_int8 = os.environ.get("BENCH_DTYPE", "bf16") == "int8"
    extras["ndoc"] = NDOC
    extras["batch"] = BATCH
    extras["pipeline"] = "trained" if ckpt_dir else "cidx_override"
    extras["corpus_dtype"] = ("int8" if corpus_int8
                              else "bf16" if on_tpu else "f32")

    # ---- RPC floor ------------------------------------------------------
    tiny = jax.jit(lambda a: a + 1)
    xs = [jnp.full((8, 8), i, jnp.float32) for i in range(6)]
    fetch1(tiny(xs[0]))
    t0 = time.perf_counter()
    for i in range(5):
        fetch1(tiny(xs[i + 1]))
    t_rpc = (time.perf_counter() - t0) / 5
    extras["rpc_floor_ms"] = round(t_rpc * 1e3, 2)
    log(f"rpc floor: {t_rpc*1e3:.1f} ms")

    # ---- models ---------------------------------------------------------
    if ckpt_dir:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from mevi_tpu.cli.main import _nci_dims, load_config
        from mevi_tpu.models.twin_tower import tower_from_config
        cfg = load_config(os.path.join(ckpt_dir, "cfg.json"))
        nci = NCIT5(_nci_dims(cfg, dropout=0.0))
        qtower = tower_from_config(cfg.encoder).module
    elif on_tpu:
        t5 = T5Dims(num_layers=12, num_decoder_layers=6, d_model=768,
                    d_kv=64, d_ff=3072, num_heads=12, dropout_rate=0.0,
                    dtype=dt)
        qt5 = T5Dims(num_layers=12, num_decoder_layers=12, d_model=768,
                     d_kv=64, d_ff=3072, num_heads=12, dropout_rate=0.0,
                     dtype=dt)
        nci = NCIT5(NCIDims(t5=t5, kary=KARY, max_output_length=M + 2))
        qtower = T5Model(qt5)
    else:
        t5 = T5Dims(vocab_size=512, num_layers=2, num_decoder_layers=2,
                    d_model=D, d_kv=16, d_ff=128, num_heads=4,
                    dropout_rate=0.0)
        nci = NCIT5(NCIDims(t5=t5, kary=KARY, max_output_length=M + 2))
        qtower = T5Model(t5)

    rng = jax.random.PRNGKey(0)
    ids = jnp.ones((BATCH, QLEN), jnp.int32)
    mask = jnp.ones((BATCH, QLEN), jnp.int32)
    dec_in = jnp.zeros((BATCH, M + 2), jnp.int32)

    def cast(t):
        return jax.tree.map(
            lambda x: x.astype(dt)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)

    # (params are initialized AFTER the corpus transfer: the 13.6 GB
    # sorted matrix must grab its HBM block first — at 8.84M docs the
    # two don't fit in the other order)

    # ---- corpus: generated ON DEVICE from small tables ------------------
    # (see mevi_tpu/data/synth.py — shared with the quality run, so a
    # BENCH_CKPT bundle serves the exact corpus its models were trained
    # on).  A doc is fully determined by 4 small ints, so the sorted
    # matrix is synthesized straight into HBM chunk-by-chunk.
    host = np.random.default_rng(0)
    t0 = time.time()
    tab = synth.make_tables(spec)
    tables = (jnp.asarray(tab[0]), jnp.asarray(tab[1]))
    draws = synth.make_draws(spec)
    fixed_cbs = (np.load(os.path.join(ckpt_dir, "codebooks.npy"))
                 if ckpt_dir else None)
    shift_p = os.path.join(ckpt_dir, "prefix_shift.npz") if ckpt_dir \
        else None
    fixed_shift = (synth.load_prefix_shift(shift_p)
                   if shift_p and os.path.exists(shift_p) else None)
    cbs_h, codes = synth.fit_rq_codes(spec, tables, draws,
                                      codebooks=fixed_cbs,
                                      prefix_shift=fixed_shift)
    cbs = jnp.asarray(cbs_h)
    log(f"corpus draws + RQ fit + assign: {time.time() - t0:.1f}s")

    # cluster-size skew stats
    from mevi_tpu.index.csr import pack_codes as pack_np
    cidx_all = np.asarray(pack_np(codes, KARY)).astype(np.int64)
    sizes = np.bincount(cidx_all, minlength=KARY ** M)
    nz = sizes[sizes > 0]
    extras["cluster_sizes"] = {
        "nonempty": int(len(nz)), "mean": round(float(nz.mean()), 1),
        "p99": int(np.percentile(nz, 99)), "max": int(nz.max()),
        "over_cap": int((nz > CAP).sum())}
    log(f"cluster sizes: {extras['cluster_sizes']}")

    # ---- fine index: CSR + sorted matrix synthesized in HBM -------------
    from mevi_tpu.eval.searcher import FineIndex
    from mevi_tpu.utils.native import build_csr
    t0 = time.time()
    offsets, doc_ids = build_csr(codes, KARY)
    if corpus_int8:
        # symmetric global-scale quantization from the TRUE global max
        # (one scanned device pass over every row), matching
        # index/build.py:quantize_int8 — a sampled max can clip rows
        # whose components exceed it (advisor r3 finding)
        CHM = 1 << 18
        n_ch = (NDOC + CHM - 1) // CHM
        pad = n_ch * CHM - NDOC
        draws_dev = jnp.concatenate(
            [jnp.asarray(draws),
             jnp.tile(jnp.asarray(draws[:1]), (pad, 1))])
        def _chunk_max(c, dr):
            return jnp.maximum(
                c, jnp.max(jnp.abs(synth.gen_rows(tables, dr)))), None
        s_max = float(jax.jit(
            lambda dp: jax.lax.scan(
                _chunk_max, jnp.float32(0),
                dp.reshape(n_ch, CHM, dp.shape[1]))[0])(draws_dev))
        Q_SCALE = 126.0 / s_max
        extras["int8_scale"] = round(Q_SCALE, 3)
        dt_corp = jnp.int8
    else:
        Q_SCALE = None
        dt_corp = dt
    buf = synth.fill_sorted_matrix(spec, tables, draws, doc_ids,
                                   n_pad_rows=CAP + 8, dtype=dt_corp,
                                   q_scale=Q_SCALE)
    fetch1(buf)
    fine = FineIndex(jnp.asarray(offsets.astype(np.int64)),
                     jnp.asarray(doc_ids), buf, M, KARY,
                     host_offsets=offsets, host_doc_ids=doc_ids)
    log(f"index built in HBM: {time.time() - t0:.1f}s")

    # recall-check queries: perturbed documents, re-synthesized from
    # their draws (exact same rows as the index)
    nq_r = 64
    rec_ids = host.integers(0, NDOC, nq_r)
    q_base = np.asarray(synth.gen_rows(tables,
                                       jnp.asarray(draws[rec_ids])),
                        np.float32)

    log("init params...")
    t0 = time.time()
    if ckpt_dir:
        from mevi_tpu.train.checkpoints import (CheckpointManager,
                                                load_params_npz,
                                                restore_tree_host)
        mgr = CheckpointManager.from_dir(os.path.join(cfg.ckpt_dir,
                                                      "nci"))
        tag = mgr.best_tag()
        restored = restore_tree_host(
            os.path.abspath(os.path.join(cfg.ckpt_dir, "nci", tag)))
        nci_params = cast(jax.device_put(restored["params"]))
        q_params = cast(jax.device_put(load_params_npz(
            os.path.join(ckpt_dir, "tower_params.npz"))))
        log(f"loaded trained params ({tag})")
    else:
        nci_params = jax.jit(
            lambda k: cast(nci.init(k, ids, mask, dec_in)["params"]))(rng)
        q_params = jax.jit(
            lambda k: cast(qtower.init(
                k, ids, mask, jnp.zeros((BATCH, 1), jnp.int32))["params"])
        )(rng)
    fetch1(nci_params)
    fetch1(q_params)
    log(f"params ready: {time.time() - t0:.1f}s")

    from mevi_tpu.serve import PallasServer
    server = PallasServer(qtower, nci, q_params, nci_params, fine,
                          num_beams=NBEAM, cap=CAP, pool=POOL,
                          inv_scale=(1.0 / Q_SCALE if Q_SCALE else 1.0))

    # ---- kernel-vs-oracle assert on device ------------------------------
    if on_tpu:
        from mevi_tpu.ops.bucket import bucket_scores_fused_reference
        g = 64
        cidx_s = jnp.asarray(
            host.choice(cidx_all, size=g).astype(np.int32))
        q_s = jnp.asarray(host.normal(size=(g, D)).astype(
            np.float32)).astype(dt)
        # validate the kernel the server actually serves with (v3 by
        # default; MEVI_BUCKET_KERNEL=fused for the in-kernel lookup)
        k_s, k_r = server._bucket(
            server.sorted_emb, server.offsets2d, cidx_s, q_s, CAP)
        o_s, o_r = bucket_scores_fused_reference(
            server.sorted_emb, server.offsets2d, cidx_s, q_s, CAP)
        k_s, k_r, o_s, o_r = (np.asarray(x) for x in (k_s, k_r, o_s, o_r))
        assert (k_r == o_r).all(), "bucket kernel row mismatch"
        valid = k_r >= 0
        np.testing.assert_allclose(k_s[valid], o_s[valid], rtol=2e-2,
                                   atol=1.0 if corpus_int8 else 1e-2)
        extras["kernel_matches_oracle"] = True
        log("bucket kernel == XLA oracle on device sample: OK")

    # ---- recall vs exact MIPS (cluster+cap truncation quality) ----------
    # Queries are perturbed documents; two coarse stand-ins replace the
    # model path when weights are random:
    #   * codebook-beam over the query embedding (the ADC/topic path),
    #   * COVERAGE-OPTIMAL oracle = the NBEAM clusters holding the most
    #     exact-top-100 docs — an upper bound for ANY coarse stage that
    #     proposes NBEAM clusters (at this cap).
    t0 = time.time()
    q_emb = q_base + 0.5 * spec.eps * host.standard_normal((nq_r, D)) \
        .astype(np.float32)
    q_emb /= np.linalg.norm(q_emb, axis=1, keepdims=True)
    q_dev = jnp.asarray(q_emb).astype(dt)

    from mevi_tpu.ops.mips import mips_topk
    # pad rows are zeros; the true top-100 scores are strongly positive,
    # so pads never rank (slicing would copy 13.6GB)
    es, erows = mips_topk(q_dev, fine.sorted_emb, k=100)
    dmap = np.asarray(fine.host_doc_ids)
    eids_h = dmap[np.clip(np.asarray(erows), 0, len(dmap) - 1)]

    from mevi_tpu.eval.searcher import fine_rerank

    def cluster_recall(bcodes, key):
        fs, fids, _ = fine_rerank(q_dev, jnp.asarray(bcodes),
                                  fine.offsets, fine.doc_ids,
                                  fine.sorted_emb, KARY, CAP, 100)
        fids_h = np.asarray(fids)
        rec = np.mean([len(set(fids_h[i][fids_h[i] >= 0])
                           & set(eids_h[i])) / 100.0
                       for i in range(nq_r)])
        extras[key] = round(float(rec), 4)
        return rec

    shift_dev = None if fixed_shift is None else \
        [jnp.asarray(t) for t in fixed_shift]
    bcodes, _ = rq_ops.beam_search(jnp.asarray(q_emb), cbs,
                                   num_beams=NBEAM, dist_mode="l2",
                                   prefix_shift=shift_dev)
    rec_b = cluster_recall(np.asarray(bcodes), "recall100_beam_coarse")
    # coverage-optimal oracle clusters: rank clusters by how many of the
    # exact top-100 docs they hold; any NBEAM-cluster coarse proposal
    # covers at most this many of the top-100 PRE-cap (the reported
    # coverage is that bound; the post-cap recall under this choice is
    # a reference point, since cap truncation can favor other choices)
    from mevi_tpu.index.csr import unpack_codes
    oracle = np.zeros((nq_r, NBEAM, M), np.int32)
    coverage = np.zeros(nq_r)
    for i in range(nq_r):
        cl = cidx_all[eids_h[i]]
        uniq, counts = np.unique(cl, return_counts=True)
        order = np.argsort(-counts)
        top = uniq[order][:NBEAM]
        coverage[i] = counts[order][:NBEAM].sum() / 100.0
        oc = unpack_codes(top.astype(np.int64), M, KARY)
        oracle[i, :len(top)] = oc
        if len(top) < NBEAM:
            oracle[i, len(top):] = oc[-1]
    extras["oracle_cluster_coverage"] = round(float(coverage.mean()), 4)
    rec_o = cluster_recall(oracle, "recall100_oracle_coarse")
    log(f"recall@100 vs exact MIPS: beam-coarse {rec_b:.4f} / "
        f"oracle-coarse {rec_o:.4f} "
        f"(coverage bound {coverage.mean():.4f}, "
        f"{time.time() - t0:.1f}s)")

    # ---- trained-pipeline recall (BENCH_CKPT) ---------------------------
    rec_queries = None
    if ckpt_dir:
        # dev utterances for sampled (indexed) docs — the full served
        # path: tokens -> tower emb + NCI beam -> bucket -> top-pool
        n_rq = max(BATCH, 256)
        gt_docs = host.integers(0, NDOC, n_rq)
        tok = synth.query_tokens(spec, draws[gt_docs],
                                 np.random.default_rng(123))
        ids_q = jnp.asarray(tok.astype(np.int32))
        mask_q = jnp.ones_like(ids_q)
        scores_, ids_, codes_, bsc_, ndoc_ = server.query(ids_q, mask_q)
        gt = codes[gt_docs]
        eq = (codes_ == gt[:, None, :]).all(-1)
        extras["trained_coarse_hit@1"] = round(float(eq[:, 0].mean()), 4)
        extras["trained_coarse_hit@10"] = round(float(eq.any(1).mean()),
                                                4)
        found = (ids_ == gt_docs[:, None])
        extras["trained_fine_recall@100"] = round(
            float(found[:, :100].any(1).mean()), 4)
        pos_ = np.argmax(found, 1)
        hit_ = found.any(1)
        extras["trained_fine_mrr@10"] = round(float(np.where(
            hit_ & (pos_ < 10), 1.0 / (pos_ + 1), 0.0).mean()), 4)
        # beam-major reordering of the SAME served pool (bucket beam
        # rank major, tower score tiebreak — eval.searcher.merge_pool):
        # the NCI beam's bucket ordering carries the early-precision
        # signal a weak tower's global re-rank throws away
        cand_codes = codes[np.clip(ids_, 0, None)]
        match_ = (cand_codes[:, :, None, :]
                  == codes_[:, None, :, :]).all(-1)
        crank_ = np.where(match_.any(-1), match_.argmax(-1), NBEAM)
        crank_ = np.where(ids_ >= 0, crank_, NBEAM + 1)
        fsf_ = np.where(ids_ >= 0, scores_.astype(np.float64), 0.0)
        span_ = float(fsf_.max() - fsf_.min()) + 1.0
        bm_ord = np.argsort(crank_.astype(np.float64) * span_ - fsf_,
                            axis=1, kind="stable")
        ids_bm = np.take_along_axis(ids_, bm_ord, 1)
        fbm = ids_bm == gt_docs[:, None]
        pos_bm = np.argmax(fbm, 1)
        hit_bm = fbm.any(1)
        extras["trained_fine_recall@100_beam_major"] = round(
            float((hit_bm & (pos_bm < 100)).mean()), 4)
        extras["trained_fine_mrr@10_beam_major"] = round(float(np.where(
            hit_bm & (pos_bm < 10), 1.0 / (pos_bm + 1), 0.0).mean()), 4)
        extras["trained_ndoc_per_query"] = round(float(ndoc_.mean()), 1)
        log(f"trained pipeline: coarse hit@10 "
            f"{extras['trained_coarse_hit@10']} fine recall@100 "
            f"{extras['trained_fine_recall@100']}")
        rec_queries = tok

    # ---- compile serving path -------------------------------------------
    log("compiling serving pipeline...")
    t0 = time.time()
    server.query(ids, mask)
    t_compile = time.time() - t0
    extras["cold_start_s"] = round(t_compile, 1)
    log(f"pipeline compiled + first run: {t_compile:.1f}s")

    # ---- throughput -----------------------------------------------------
    from mevi_tpu.ops.bucket import ROWS
    g = BATCH * NBEAM
    g_pad = g + (-g) % ROWS
    batches = []
    ndoc_seen = []
    for i in range(NBATCH):
        if ckpt_dir:
            # real token queries; the beam's own codes feed the bucket
            docs_i = host.integers(0, NDOC, BATCH)
            ids_i = jnp.asarray(synth.query_tokens(
                spec, draws[docs_i],
                np.random.default_rng(1000 + i)).astype(np.int32))
            batches.append((ids_i, mask, None))
        else:
            # beam codes from RANDOM NCI weights land in empty clusters
            # and the fine stage would do no work; cidx_override drives
            # the bucket stage with clusters sampled doc-weighted from
            # the real (skewed) corpus distribution while qenc + beam
            # still run in full
            ids_i = jnp.asarray(
                np.full((BATCH, QLEN), 1 + (i % 7), np.int32))
            ci = cidx_all[host.integers(0, NDOC, size=g)].astype(np.int32)
            ndoc_seen.append(
                (offsets[ci + 1] - offsets[ci]).reshape(BATCH, NBEAM)
                .sum(-1).mean())
            ci = np.pad(ci, (0, g_pad - g))
            batches.append((ids_i, mask, jnp.asarray(ci)))
    t0 = time.time()
    handles = [server.query_device(i, m, c) for i, m, c in batches]
    results = [server.finalize(h) for h in handles]
    dt_pipe = time.time() - t0
    qps = BATCH * NBATCH / dt_pipe
    log(f"{NBATCH} pipelined batches x {BATCH} queries in "
        f"{dt_pipe:.3f}s -> {qps:.1f} q/s/chip")
    if ndoc_seen:
        extras["ndoc_per_query"] = round(float(np.mean(ndoc_seen)), 1)
    else:
        extras["ndoc_per_query"] = round(
            float(np.mean([r[4].mean() for r in results])), 1)

    t0 = time.time()
    for i, m, c in batches[:max(NBATCH // 2, 1)]:
        server.finalize(server.query_device(i, m, c))
    dt_seq = time.time() - t0
    extras["sequential_qps"] = round(
        BATCH * max(NBATCH // 2, 1) / dt_seq, 1)

    # ---- measured reference-style baseline ------------------------------
    # The reference serves eval_batch_size=2 with a cache-less beam
    # (use_cache=False, generation_utils.py:763) and host-side ragged
    # cluster lookups between coarse and fine (main_models.py:3915-).
    # Closest honest stand-in on the SAME chip: batch 2, the panel
    # (non-incremental) beam decoder, a host round-trip for the codes,
    # then the jitted fine re-rank.  This measures the architecture the
    # reference runs, on this hardware — vs_baseline is measured/measured.
    try:
        from mevi_tpu.decode.beam import nci_beam_search
        B_REF = 2
        ids2 = jnp.ones((B_REF, QLEN), jnp.int32)
        mask2 = jnp.ones((B_REF, QLEN), jnp.int32)
        qenc_jit2 = jax.jit(lambda p, i, m: qtower.apply(
            {"params": p}, i, m, method=T5Model.first_token_rep))

        def ref_serve_batch(ids_b, mask_b):
            codes_b, _, _, _ = nci_beam_search(
                nci, nci_params, ids_b, mask_b, NBEAM)
            codes_h = np.asarray(codes_b)          # host hop (ref: dict
            qe = qenc_jit2(q_params, ids_b, mask_b)  # lookups)
            if not ckpt_dir:
                codes_h = np.asarray(unpack_codes(
                    cidx_all[host.integers(0, NDOC,
                                           size=B_REF * NBEAM)]
                    .astype(np.int64), M, KARY)) \
                    .reshape(B_REF, NBEAM, M).astype(np.int32)
            fs, fids, _ = fine_rerank(
                qe, jnp.asarray(codes_h), fine.offsets, fine.doc_ids,
                fine.sorted_emb, KARY, CAP, POOL)
            return np.asarray(fids[:, :1])

        ref_serve_batch(ids2, mask2)               # compile
        n_ref = 6
        t0 = time.perf_counter()
        for _ in range(n_ref):
            ref_serve_batch(ids2, mask2)
        dt_ref = time.perf_counter() - t0
        baseline_qps = B_REF * n_ref / dt_ref
        extras["baseline_qps_measured"] = round(baseline_qps, 1)
        extras["baseline_def"] = ("reference-style loop on same chip: "
                                  "batch 2, cache-less panel beam, "
                                  "host hop, jitted fine")
        log(f"measured reference-style baseline: {baseline_qps:.1f} q/s")
    except Exception as e:                         # pragma: no cover
        log(f"baseline measurement failed: {e!r}")
        baseline_qps = BASELINE_QPS_FALLBACK
        extras["baseline_qps_measured"] = None

    # single small-batch latency (the reference profiles per-query
    # latency, faiss_search.py:32-68 / generate.py:247-280); best-effort
    try:
        B_LAT = 8
        ids8 = jnp.asarray(np.full((B_LAT, QLEN), 3, np.int32))
        mask8 = jnp.ones((B_LAT, QLEN), jnp.int32)
        server.query(ids8, mask8)                  # compile
        t0 = time.perf_counter()
        for _ in range(5):
            server.query(ids8, mask8)
        extras["latency_b8_ms"] = round(
            (time.perf_counter() - t0) / 5 * 1e3, 1)
    except Exception as e:                         # pragma: no cover
        log(f"latency probe skipped: {e!r}")

    # ---- stage split (dispatch+fetch each, rpc floor noted) --------------
    def timed(fn, n=5):
        fetch1(fn(0))
        t0 = time.perf_counter()
        for i in range(n):
            fetch1(fn(i + 1))
        return (time.perf_counter() - t0) / n

    qenc_jit = jax.jit(lambda p, i, m: qtower.apply(
        {"params": p}, i, m, method=T5Model.first_token_rep))

    def qenc_fn(i):
        return qenc_jit(q_params, batches[i % NBATCH][0], mask)

    def beam_fn(i):
        return nci_beam_search_incremental(
            nci, nci_params, batches[i % NBATCH][0], mask, NBEAM,
            level_tables=server.level_tables)[0]

    _, _, _, cidx0, q_rep0 = server._coarse(
        server.q_params, server.nci_params, batches[0][0], mask,
        server.level_tables, server.pawa_tables)
    cidx_b = batches[0][2] if batches[0][2] is not None else cidx0

    def bucket_fn(i):
        return server._bucket(server.sorted_emb, server.offsets2d,
                              cidx_b, q_rep0, CAP)[0]

    t_qenc = timed(qenc_fn)
    t_beam = timed(beam_fn)
    t_bucket = timed(bucket_fn)
    stage = {"qenc_ms": round(t_qenc * 1e3, 1),
             "beam_ms": round(t_beam * 1e3, 1),
             "bucket_ms": round(t_bucket * 1e3, 1),
             "rpc_floor_ms": extras["rpc_floor_ms"]}
    # MFU: flops from XLA cost analysis of the compiled programs;
    # device time from a jax.profiler.trace capture (works over the
    # tunnel) — no hand-rolled FLOP constants
    if on_tpu:
        try:
            from mevi_tpu.utils import profiling as P
            fl_qenc = P.compiled_flops(qenc_jit, q_params,
                                       batches[0][0], mask)
            dt_qenc, _ = P.traced_stage_seconds(
                lambda i: fetch1(qenc_fn(i)), n=3,
                trace_dir="/tmp/mevi_trace_qenc")
            dt_beam, beam_ops = P.traced_stage_seconds(
                lambda i: fetch1(beam_fn(i)), n=3,
                trace_dir="/tmp/mevi_trace_beam")
            stage["qenc_device_ms"] = round(dt_qenc * 1e3, 1)
            stage["beam_device_ms"] = round(dt_beam * 1e3, 1)
            if fl_qenc:
                stage["qenc_mfu_pct"] = round(
                    fl_qenc / max(dt_qenc, 1e-9)
                    / P.TPU_V5E_BF16_PEAK * 100, 1)
            # the beam is several dispatches inside one jit fn; lower
            # the whole jitted call for its flops
            try:
                fl_beam = P.compiled_flops(
                    nci_beam_search_incremental, nci, nci_params,
                    batches[0][0], mask, NBEAM,
                    level_tables=server.level_tables)
            except Exception:
                fl_beam = None
            if fl_beam:
                stage["beam_mfu_pct"] = round(
                    fl_beam / max(dt_beam, 1e-9)
                    / P.TPU_V5E_BF16_PEAK * 100, 1)
        except Exception as e:                     # pragma: no cover
            log(f"trace-derived MFU skipped: {e!r}")
    extras["stages"] = stage
    log(f"stages: {stage}")
    return qps, baseline_qps


def _bundle_complete(cand):
    """A quality workdir is servable iff ALL trained artifacts exist:
    corpus spec + trained tower + at least one ranked NCI checkpoint.
    (Round 3 shipped a bundle missing tower_params.npz and the bench
    silently fell back to the untrained pipeline — never again.)"""
    need = [os.path.join(cand, "spec.json"),
            os.path.join(cand, "tower_params.npz"),
            os.path.join(cand, "ckpts", "nci", "leaderboard.json")]
    return all(os.path.exists(p) for p in need)


def _discover_bundle(base=None):
    """Default BENCH_CKPT to the newest complete checked-in quality
    bundle (data/quality_*) so the headline serves the TRAINED
    pipeline — the beam's own codes — whenever one exists.  Opt out
    with BENCH_CKPT=''."""
    if "BENCH_CKPT" in os.environ:
        return os.environ["BENCH_CKPT"] or None
    import glob as _glob
    base = base or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data")
    for cand in sorted(_glob.glob(os.path.join(base, "quality_*")),
                       reverse=True):
        if _bundle_complete(cand):
            os.environ["BENCH_CKPT"] = cand
            return cand
    return None


def _sidecar_dir():
    d = os.environ.get("BENCH_STAGE_DIR") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data",
        "bench_stages")
    os.makedirs(d, exist_ok=True)
    return d


def _sidecar_path(ndoc, dtype):
    return os.path.join(_sidecar_dir(), f"rung_{ndoc}_{dtype}.json")


def _save_sidecar(ndoc, dtype, obj):
    with open(_sidecar_path(ndoc, dtype), "w") as fw:
        json.dump({"ts": time.time(), "result": obj}, fw)


def _load_sidecar(ndoc, dtype):
    p = _sidecar_path(ndoc, dtype)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as fr:
            return json.load(fr)
    except Exception:
        return None


def _newest_sidecar(attempts):
    """Best fallback in LADDER order (the headline rung first)."""
    for ndoc_try, dtype_try in attempts:
        sc = _load_sidecar(ndoc_try, dtype_try)
        if sc:
            return sc
    import glob as _glob
    cands = []
    for p in _glob.glob(os.path.join(_sidecar_dir(), "rung_*.json")):
        try:
            with open(p) as fr:
                cands.append(json.load(fr))
        except Exception:
            pass
    return max(cands, key=lambda c: c.get("ts", 0)) if cands else None


def _emit_sidecar(sc, reason):
    obj = dict(sc["result"])
    obj["from_sidecar"] = True
    obj["sidecar_age_s"] = round(time.time() - sc.get("ts", 0), 1)
    obj["sidecar_reason"] = reason
    emit_result(obj)


def main():
    _hijack_stdout()
    bundle = _discover_bundle()
    if bundle:
        log(f"trained bundle: {bundle}")
    NDOC = int(os.environ.get("BENCH_NDOC", 8_841_823))
    if os.environ.get("BENCH_CHILD"):
        extras = {}
        qps, baseline_qps = run(int(os.environ["BENCH_CHILD"]), extras)
        emit_result({
            "metric": "serving_queries_per_sec_per_chip",
            "value": round(qps, 2),
            "unit": "queries/s/chip",
            "vs_baseline": round(qps / baseline_qps, 3),
            **extras,
        })
        return

    # each attempt runs in a SUBPROCESS: an OOM'd attempt can pin HBM
    # through live buffers until process exit, so in-process retries
    # always re-OOM (observed with the 8.84M -> 4.4M -> 1M ladder)
    import subprocess

    # ladder: full scale in int8 FIRST — the only full-corpus
    # single-chip mode (8.84M bf16 is 13.6 GB of index and has OOM'd on
    # every capture; leading with it burned a child + 20 s claim-recycle
    # per driver run) — then full bf16 as a stretch rung, then smaller
    # bf16 indexes
    if os.environ.get("BENCH_CKPT"):
        with open(os.path.join(os.environ["BENCH_CKPT"],
                               "spec.json")) as fr:
            spec_ndoc = json.load(fr)["ndoc"]
        if os.environ.get("BENCH_DTYPE"):
            attempts = [(NDOC, os.environ["BENCH_DTYPE"]),
                        (spec_ndoc, os.environ["BENCH_DTYPE"])]
        else:
            attempts = [(NDOC, "int8"), (spec_ndoc, "bf16")]
    elif os.environ.get("BENCH_DTYPE"):
        attempts = [(NDOC, os.environ["BENCH_DTYPE"]),
                    (NDOC // 2, os.environ["BENCH_DTYPE"])]
    else:
        attempts = [(NDOC, "int8"), (NDOC // 2, "bf16"),
                    (1_000_000, "bf16")]

    # Round-4 failure mode: the driver's bench capture died rc 124
    # after the outage probe burned its whole budget and the ladder
    # never emitted.  Resilience: (a) every successful rung is cached
    # as a sidecar under data/bench_stages/, (b) a global deadline
    # bounds this process, and (c) on deadline/probe-exhaustion/ladder
    # failure the newest sidecar is emitted (flagged from_sidecar) —
    # the artifact is never null.
    t_start = time.time()
    deadline = float(os.environ.get("BENCH_DEADLINE", 4200))
    have_sidecar = _newest_sidecar(attempts) is not None

    def remaining():
        return deadline - (time.time() - t_start)

    # Tunnel outages (backend init polls ~25-30 min then raises
    # UNAVAILABLE) would burn every ladder rung's watchdog on a dead
    # backend; probe cheaply first and only start spending rungs once
    # the chip answers.  With a sidecar on disk the probe budget is cut
    # hard — a stale-but-real capture beats burning the deadline.
    probe_budget = float(os.environ.get(
        "BENCH_PROBE_BUDGET", 1200 if have_sidecar else 3600))
    if os.environ.get("BENCH_FORCE_CPU"):
        probe_budget = 0.0            # no tunnel to probe on CPU runs
    probe_t0 = time.time()
    probe_ok = probe_budget == 0.0
    while time.time() - probe_t0 < min(probe_budget,
                                       max(remaining() - 600, 0)):
        try:
            p = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                env=dict(os.environ), stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL, timeout=600)
            if p.returncode == 0 and p.stdout.strip():
                probe_ok = True
                break
        except subprocess.TimeoutExpired:
            pass
        log(f"backend probe failed; retrying "
            f"({int(time.time() - probe_t0)}s of {int(probe_budget)}s)")
        time.sleep(120)
    if not probe_ok and have_sidecar and remaining() < 1200:
        _emit_sidecar(_newest_sidecar(attempts),
                      "backend unreachable within probe budget")
        return

    fallback_from = None
    # generous default: a chip-claim recycle after a previous process
    # can block a child's first dispatch for 20+ minutes on tunneled
    # deployments, and that wait counts against the watchdog
    child_timeout = int(os.environ.get("BENCH_CHILD_TIMEOUT", 3000))
    for ndoc_try, dtype_try in attempts:
        if remaining() < 300:
            log(f"bench deadline reached before rung ndoc={ndoc_try}")
            break
        env = dict(os.environ, BENCH_CHILD=str(ndoc_try),
                   BENCH_DTYPE=dtype_try)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                stdout=subprocess.PIPE,
                timeout=min(child_timeout, max(remaining(), 60)))
        except subprocess.TimeoutExpired:
            # a wedged chip claim can hang a child at its first dispatch
            # indefinitely; kill and try the next size
            log(f"bench child timed out at ndoc={ndoc_try}")
            if fallback_from is None:
                fallback_from = ndoc_try
            continue
        lines = r.stdout.decode().strip().splitlines()
        line = next((x for x in reversed(lines) if x.startswith("{")),
                    None)
        if r.returncode == 0 and line:
            obj = json.loads(line)
            if fallback_from:
                obj["fallback_from_ndoc"] = fallback_from
            if not os.environ.get("BENCH_FORCE_CPU"):
                _save_sidecar(ndoc_try, dtype_try, obj)
            emit_result(obj)
            return
        log(f"bench child failed at ndoc={ndoc_try} rc={r.returncode}")
        if fallback_from is None:
            fallback_from = ndoc_try
        time.sleep(20)                    # let the chip claim recycle
    sc = _newest_sidecar(attempts)
    if sc:
        _emit_sidecar(sc, "live ladder failed or deadline reached")
        return
    raise SystemExit("bench failed at every corpus size")


if __name__ == "__main__":
    main()
