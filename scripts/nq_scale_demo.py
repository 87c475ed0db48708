"""NQ-scale (21,015,324 passages) end-to-end exercise.

The NQ-dpr corpus (``dataprocess/NQ_dpr/get_inverse_answers.py:17``) is
30 GB bf16 / 15.1 GB int8 at d=768 — beyond one v5e's HBM next to the
towers.  Two paths make it real, both exercised here at the TRUE row
count:

* **mesh** (virtual 8-device CPU mesh): the sharded serving path —
  ``sharded_mips_topk`` + ``make_sharded_server`` over a corpus
  row-sharded P(corpus) at 21,015,324 rows (reduced d so 8 host
  "devices" hold it) — validates the multi-chip geometry end-to-end.
* **stream** (one real chip): the host-streaming capability path —
  the corpus lives in a host int8 memmap at FULL d=768 (15.1 GB);
  ``streaming_mips_topk`` double-buffers chunks through the exact-MIPS
  scan and ``HostStreamFineReranker`` serves the cluster fine stage —
  the reference's memmap->GPU chunked scan
  (``main_models.py:3944-3991``) rebuilt TPU-side.

Writes one JSON line (NQSCALE artifact).  Env: NQ_STAGE=mesh|stream|all,
NQ_NDOC (default 21015324), NQ_OUT, NQ_FORCE_CPU=1.
"""

import glob
import json
import os
import os.path as osp
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mevi_jax_cache")
REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

NQ_NDOC_TRUE = 21_015_324


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def stage_mesh(out):
    """21M-row sharded serving on a virtual 8-device CPU mesh."""
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mevi_tpu.eval.searcher import FineIndex, sharded_fine_rerank
    from mevi_tpu.models.nci import NCIDims, NCIT5
    from mevi_tpu.models.t5 import T5Dims, T5Model
    from mevi_tpu.ops.mips import sharded_mips_topk
    from mevi_tpu.parallel.mesh import (CORPUS_AXIS, DATA_AXIS,
                                        make_mesh, shard_rows)
    from mevi_tpu.serve import make_sharded_server
    from mevi_tpu.utils.native import build_csr
    from jax.sharding import NamedSharding, PartitionSpec as P

    NDOC = int(os.environ.get("NQ_NDOC", NQ_NDOC_TRUE))
    # d=64 keeps the 8-host-device footprint ~1.3 GiB; NQ_MESH_D=768
    # runs the true byte volume (15 GiB int8 sharded) when host RAM
    # allows — either way the artifact records mesh_d
    D = int(os.environ.get("NQ_MESH_D", 64))
    KARY, M, QLEN, NBEAM, CAP, POOL = 32, 4, 32, 10, 256, 100
    mesh = make_mesh(8, corpus=4)          # data=2 x corpus=4
    log(f"mesh {dict(mesh.shape)} over {len(jax.devices())} devices")

    host = np.random.default_rng(0)
    # int8 corpus rows synthesized host-side in chunks (structure does
    # not matter for the geometry check; row COUNT and layout do)
    t0 = time.time()
    emb = np.empty((NDOC, D), np.int8)
    CH = 1 << 20
    for s in range(0, NDOC, CH):
        e = min(NDOC, s + CH)
        emb[s:e] = host.integers(-100, 100, size=(e - s, D), dtype=np.int16) \
            .astype(np.int8)
    codes = np.empty((NDOC, M), np.int32)
    for s in range(0, NDOC, CH):
        e = min(NDOC, s + CH)
        codes[s:e] = host.integers(0, KARY, size=(e - s, M))
    log(f"host corpus {NDOC}x{D} int8: {time.time()-t0:.1f}s")

    t0 = time.time()
    offsets, doc_ids = build_csr(codes, KARY)
    # eager CSR permutation: one extra NDOC x D int8 host copy (~1.3 GB
    # at d=64); the original rows are freed right after
    sorted_emb = emb[doc_ids]
    del emb
    log(f"CSR build + permute: {time.time()-t0:.1f}s")

    t0 = time.time()
    emb_sh = shard_rows(sorted_emb, mesh)
    log(f"sharded upload: {time.time()-t0:.1f}s")

    # exact sharded MIPS at 21M rows
    q = host.normal(size=(16, D)).astype(np.float32)
    q_dev = jax.device_put(q, NamedSharding(mesh, P(DATA_AXIS, None)))
    t0 = time.time()
    s_sh, i_sh = sharded_mips_topk(q_dev, emb_sh, k=POOL, mesh=mesh)
    s_sh, i_sh = np.asarray(s_sh), np.asarray(i_sh)
    dt_mips = time.time() - t0
    # verify one query against a host oracle, chunk-wise: a full
    # float32 materialization of the 21M x D matrix would be a ~5.4 GiB
    # host temp (advisor r3 finding)
    sc0 = np.empty(len(sorted_emb), np.float32)
    for s in range(0, len(sorted_emb), CH):
        e = min(len(sorted_emb), s + CH)
        sc0[s:e] = q[0] @ sorted_emb[s:e].astype(np.float32).T
    want = np.sort(np.argsort(-sc0)[:POOL])
    got = np.sort(i_sh[0])
    assert (got == want).mean() > 0.99, "sharded MIPS mismatch"
    out["mesh_mips_rows"] = int(NDOC)
    out["mesh_mips_s"] = round(dt_mips, 2)

    # full sharded server (tiny towers, real index geometry)
    t5 = T5Dims(vocab_size=128, num_layers=1, num_decoder_layers=1,
                d_model=D, d_kv=16, d_ff=128, num_heads=4,
                dropout_rate=0.0)
    nci = NCIT5(NCIDims(t5=t5, kary=KARY, max_output_length=M + 2,
                        adaptor_layer_num=1, adaptor_num_heads=4))
    qtower = T5Model(t5)
    ids_b = jnp.ones((8, QLEN), jnp.int32)
    nci_p = nci.init(jax.random.PRNGKey(0), ids_b[:1],
                     jnp.ones((1, QLEN), jnp.int32),
                     jnp.zeros((1, M + 2), jnp.int32))["params"]
    q_p = qtower.init(jax.random.PRNGKey(1), ids_b[:1],
                      jnp.ones((1, QLEN), jnp.int32),
                      jnp.zeros((1, 1), jnp.int32))["params"]
    serve = make_sharded_server(qtower, nci, mesh, num_beams=NBEAM,
                                cap=CAP, pool=POOL)
    t0 = time.time()
    ts, ti, tc, tb = serve(q_p, nci_p, ids_b,
                           jnp.ones_like(ids_b),
                           jnp.asarray(offsets.astype(np.int64)),
                           jnp.asarray(doc_ids), emb_sh)
    np.asarray(ti[0, 0])
    out["mesh_server_rows"] = int(NDOC)
    out["mesh_server_batch_s"] = round(time.time() - t0, 2)
    out["mesh_shape"] = dict(mesh.shape)
    out["mesh_d"] = int(D)   # byte volume caveat: d=64 unless NQ_MESH_D
    log(f"sharded server one batch at {NDOC} rows: "
        f"{out['mesh_server_batch_s']}s")


def stage_stream(out):
    """Full-d host-streaming on the current default backend."""
    from mevi_tpu.data import synth

    prep_only = bool(os.environ.get("NQ_PREP_ONLY"))
    if prep_only:
        # host staging only: never touch jax (the chip may be claimed
        # by a training run; even backend init would block on it)
        on_tpu = True
    else:
        import jax
        if os.environ.get("NQ_FORCE_CPU"):
            jax.config.update("jax_platforms", "cpu")
        on_tpu = jax.devices()[0].platform != "cpu"
    NDOC = int(os.environ.get("NQ_NDOC", NQ_NDOC_TRUE))
    if not on_tpu:
        NDOC = min(NDOC, 200_000)
    D = int(os.environ.get("NQ_D", 768 if on_tpu else 64))
    KARY, M, CAP, POOL = 32, 4, 512 if on_tpu else 64, 1000
    spec = synth.SynthSpec(ndoc=NDOC, d=D, kary=KARY, levels=M, seed=9)
    log(f"stream stage: {NDOC} x {D} int8 "
        f"({'prep-only' if prep_only else 'device run'})")

    cache = spec.cache_dir("/tmp/mevi_synth_nq")
    os.makedirs(cache, exist_ok=True)
    mm_p = os.path.join(cache, "emb_int8.bin")
    ctrs, pool_t = synth.make_tables(spec)
    draws = synth.make_draws(spec)
    t0 = time.time()
    if not os.path.exists(mm_p):
        # host-side chunked synthesis into the int8 memmap (15.1 GB at
        # the true NQ count) — pure numpy, no device involved
        mm = np.memmap(mm_p, np.int8, "w+", shape=(NDOC, D))
        CH = 1 << 19
        for s in range(0, NDOC, CH):
            e = min(NDOC, s + CH)
            dr = draws[s:e]
            v = (ctrs[0][dr[:, 0]] + ctrs[1][dr[:, 1]]
                 + ctrs[2][dr[:, 2]] + pool_t[dr[:, 3]])
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            mm[s:e] = np.clip(np.round(v * 126.0), -127, 127) \
                .astype(np.int8)
        mm.flush()
        del mm
    emb = np.memmap(mm_p, np.int8, "r", shape=(NDOC, D))
    log(f"int8 corpus memmap ready ({emb.nbytes/2**30:.1f} GiB, "
        f"{time.time()-t0:.1f}s)")
    if prep_only:
        # host-side staging only (run while the chip is busy elsewhere)
        out["stream_prep_gib"] = round(emb.nbytes / 2 ** 30, 1)
        return
    import jax.numpy as jnp
    from mevi_tpu.eval.streaming import (HostStreamFineReranker,
                                         streaming_mips_topk)
    from mevi_tpu.utils.native import build_csr

    # RQ codes from a device fit (cached) -> CSR over the HOST matrix
    tables_dev = (jnp.asarray(ctrs), jnp.asarray(pool_t))
    cbs, codes = synth.fit_rq_codes(spec, tables_dev, draws,
                                    cache_base="/tmp/mevi_synth_nq")
    t0 = time.time()
    offsets, doc_ids = build_csr(codes, KARY)
    sorted_p = os.path.join(cache, "emb_sorted_int8.bin")
    if not os.path.exists(sorted_p):
        sm = np.memmap(sorted_p, np.int8, "w+", shape=(NDOC, D))
        CH = 1 << 19
        for s in range(0, NDOC, CH):
            e = min(NDOC, s + CH)
            sm[s:e] = emb[doc_ids[s:e]]
        sm.flush()
        del sm
    sorted_emb = np.memmap(sorted_p, np.int8, "r", shape=(NDOC, D))
    log(f"CSR + sorted memmap: {time.time()-t0:.1f}s")

    # queries: perturbed docs (recall is then measurable vs gt doc)
    host = np.random.default_rng(1)
    NQ = 128
    gt = host.integers(0, NDOC, NQ)
    dr = draws[gt]
    v = (ctrs[0][dr[:, 0]] + ctrs[1][dr[:, 1]] + ctrs[2][dr[:, 2]]
         + pool_t[dr[:, 3]])
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v += 0.5 * spec.eps * host.standard_normal((NQ, D)).astype(np.float32)
    q = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
    q_dev = jnp.asarray(q).astype(jnp.bfloat16 if on_tpu
                                  else jnp.float32)

    # exact full-corpus scan, host-streamed with double buffering
    t0 = time.time()
    s_ex, i_ex = streaming_mips_topk(q_dev, sorted_emb, k=100,
                                     chunk=1 << 17)
    dt_scan = time.time() - t0
    ids_ex = np.asarray(doc_ids)[np.clip(i_ex, 0, NDOC - 1)]
    rec_exact = float((ids_ex == gt[:, None]).any(1).mean())
    gib = emb.nbytes / 2 ** 30
    out["stream_rows"] = int(NDOC)
    out["stream_scan_s"] = round(dt_scan, 1)
    out["stream_scan_gib_per_s"] = round(gib / dt_scan, 2)
    out["stream_exact_recall@100_gt"] = round(rec_exact, 4)
    log(f"streamed exact scan of {gib:.1f} GiB: {dt_scan:.1f}s, "
        f"gt-recall@100 {rec_exact:.4f}")

    # cluster fine stage from the host-resident sorted matrix
    bcodes = np.repeat(codes[gt][:, None, :], 10, axis=1)
    # rough beam stand-in: gt cluster + 9 codebook-beam neighbors
    from mevi_tpu.ops import rq as rq_ops
    nb_codes, _ = rq_ops.beam_search(jnp.asarray(q), jnp.asarray(cbs),
                                     num_beams=10, dist_mode="l2")
    bcodes = np.asarray(nb_codes)
    hs = HostStreamFineReranker(sorted_emb, offsets, doc_ids, KARY,
                                CAP, POOL,
                                query_dtype=(jnp.bfloat16 if on_tpu
                                             else jnp.float32),
                                sub_batch=32)
    t0 = time.time()
    fs, fi, ndoc = hs(q, bcodes)
    dt_fine = time.time() - t0
    rec_fine = float((fi == gt[:, None]).any(1).mean())
    out["stream_fine_s_128q"] = round(dt_fine, 1)
    out["stream_fine_recall@pool_gt"] = round(rec_fine, 4)
    out["stream_ndoc_per_query"] = round(float(ndoc.mean()), 1)
    log(f"host-stream fine stage 128 q: {dt_fine:.1f}s, "
        f"gt-recall {rec_fine:.4f}")


def stage_adc(out):
    """HBM-resident compressed ANN leg at the TRUE NQ row count.

    The round-4 full-corpus answer was the host-streamed exact scan
    (354.7 s tunnel-bound); the serving-grade answer is ADC over RQ
    codes: an 8-level x 32 RQ (NQ_ADC_LEVELS x NQ_ADC_KARY) costs
    256 int8 per doc = 5.4 GiB at 21,015,324 rows — resident in one
    chip's HBM — and top-k is one (n, M*K) x (M*K, B) int8 matmul
    (ops/adc.py).  This is the faiss-HNSW role (faiss_search.py:13-21)
    with ADC reconstruction semantics (pq.py:743-799).

    Reports adc_topk_qps and recall-vs-exact (the exact oracle runs
    on-device from the generative tables — no host streaming needed).
    """
    import jax
    if os.environ.get("NQ_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mevi_tpu.data import synth
    from mevi_tpu.ops import adc as adc_ops
    from mevi_tpu.ops import rq as rq_ops

    on_tpu = jax.devices()[0].platform != "cpu"
    NDOC = int(os.environ.get("NQ_NDOC", NQ_NDOC_TRUE))
    if not on_tpu:
        NDOC = min(NDOC, 100_000)
    D = int(os.environ.get("NQ_D", 768 if on_tpu else 64))
    LV = int(os.environ.get("NQ_ADC_LEVELS", 8))
    KARY = int(os.environ.get("NQ_ADC_KARY", 32))
    TAG = os.environ.get("NQ_ADC_TAG", "")   # "16" -> adc16_* keys
    TOPK = 1000
    spec = synth.SynthSpec(ndoc=NDOC, d=D, kary=32, levels=4, seed=9)
    log(f"adc stage: {NDOC} x {D}, RQ {LV}x{KARY} "
        f"({NDOC * LV * KARY / 2**30:.1f} GiB one-hot)")
    ctrs, pool_t = synth.make_tables(spec)
    tables_dev = (jnp.asarray(ctrs), jnp.asarray(pool_t))
    draws = synth.make_draws(spec)

    # dedicated ANN codebooks (deeper than the serving RQ 4x32: the ANN
    # leg trades bytes for recall independently of the cluster index)
    host = np.random.default_rng(2)
    t0 = time.time()
    nfit = min(NDOC, 500_000)
    sample = synth.gen_rows(tables_dev, jnp.asarray(
        draws[host.choice(NDOC, size=nfit, replace=False)]))
    cbs, _ = rq_ops.rq_train(sample, levels=LV, kary=KARY, iters=8,
                             key=jax.random.PRNGKey(17))
    cbs = cbs.astype(jnp.float32)
    del sample
    log(f"ANN RQ {LV}x{KARY} fit: {time.time()-t0:.1f}s")

    @jax.jit
    def gen_assign(dr):
        return rq_ops.assign(synth.gen_rows(tables_dev, dr), cbs,
                             "rq", "l2")
    t0 = time.time()
    CH = 1 << 19
    codes = np.empty((NDOC, LV), np.int32)
    for s in range(0, NDOC, CH):
        e = min(NDOC, s + CH)
        codes[s:e] = np.asarray(gen_assign(jnp.asarray(draws[s:e])))
    dt_assign = time.time() - t0
    log(f"assign {NDOC} rows: {dt_assign:.1f}s")

    # queries: perturbed docs (same construction as the stream stage)
    NQ = int(os.environ.get("NQ_ADC_NQ", 128))
    gt = np.random.default_rng(1).integers(0, NDOC, NQ)
    dr = draws[gt]
    v = (ctrs[0][dr[:, 0]] + ctrs[1][dr[:, 1]] + ctrs[2][dr[:, 2]]
         + pool_t[dr[:, 3]])
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v += 0.5 * spec.eps * np.random.default_rng(1) \
        .standard_normal((NQ, D)).astype(np.float32)
    q = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
    q_dev = jnp.asarray(q)

    # exact oracle ON DEVICE from the generative tables (chunked scan;
    # nothing streams from host)
    nch = (NDOC + CH - 1) // CH
    pad = nch * CH - NDOC
    draws_p = np.concatenate([draws, draws[:1].repeat(pad, 0)]) \
        if pad else draws
    draws_dev = jnp.asarray(draws_p.reshape(nch, CH, 4))

    # draws/tables must be ARGUMENTS: a closure bakes the 21M x 4 draw
    # buffer (336 MB) into the serialized module as a constant and the
    # tunnel's remote-compile endpoint rejects it (HTTP 413) — same
    # failure mode as the tower probe (quality_full.py) before 24eba66
    @jax.jit
    def exact_topk(qd, tabs, draws_sc):
        def body(carry, xs):
            bs, bi = carry
            drc, base = xs
            s = qd @ synth.gen_rows(tabs, drc).T
            idx = base + jnp.arange(CH, dtype=jnp.int32)
            cs = jnp.concatenate([bs, s.astype(jnp.float32)], 1)
            ci = jnp.concatenate(
                [bi, jnp.broadcast_to(idx[None], s.shape)], 1)
            ts, ti = jax.lax.top_k(cs, 100)
            return (ts, jnp.take_along_axis(ci, ti, 1)), ()
        init = (jnp.full((NQ, 100), -jnp.inf, jnp.float32),
                jnp.full((NQ, 100), -1, jnp.int32))
        bases = jnp.arange(nch, dtype=jnp.int32) * CH
        (_, ids_), _ = jax.lax.scan(body, init, (draws_sc, bases))
        return ids_
    t0 = time.time()
    ids_exact = np.asarray(exact_topk(q_dev, tables_dev, draws_dev))
    ids_exact = np.where(ids_exact < NDOC, ids_exact, -1)
    out["adc_exact_oracle_s"] = round(time.time() - t0, 1)
    del draws_dev       # free the scan buffer before the index lands

    # index build AFTER the exact oracle: the 16-level one-hot
    # (10.25 GiB) plus the oracle scan's gen_rows temps exceed the
    # 15.75 GiB chip; sequencing keeps the peak to one of the two
    t0 = time.time()
    onehot = adc_ops.fill_onehot_matrix(codes, KARY)
    # sync via a direct 2-D slice: .ravel()[:1] dispatches
    # slice(reshape(x)) and XLA materializes the full reshape — a
    # second index-sized copy that OOMs at 16 levels (10.24 GiB x 2)
    np.asarray(jax.device_get(onehot[0, :1]))
    dt_fill = time.time() - t0
    out["adc_rows"] = int(NDOC)
    out["adc_levels"] = LV
    out["adc_kary"] = KARY
    out["adc_index_gib"] = round(onehot.nbytes / 2**30, 2)
    out["adc_build_s"] = round(dt_assign + dt_fill, 1)
    log(f"one-hot in HBM: {dt_fill:.1f}s ({out['adc_index_gib']} GiB)")

    s_adc, i_adc = adc_ops.adc_search(q_dev, cbs, onehot, k=TOPK)
    i_adc = np.asarray(i_adc)
    i_adc = np.where(i_adc < NDOC, i_adc, -1)          # mask pad rows
    r100 = np.mean([len(set(i_adc[i][:100].tolist())
                        & set(ids_exact[i].tolist())) / 100.0
                    for i in range(NQ)])
    r100_in_1000 = np.mean([len(set(i_adc[i].tolist())
                                & set(ids_exact[i].tolist())) / 100.0
                            for i in range(NQ)])
    rec_gt = float((i_adc == gt[:, None]).any(1).mean())
    out["adc_recall@100_vs_exact"] = round(float(r100), 4)
    out["adc_exact100_in_top1000"] = round(float(r100_in_1000), 4)
    out["adc_recall@1000_gt"] = round(rec_gt, 4)

    # exact rerank of the ADC top-1000 (the serving pattern: ADC is the
    # candidate generator, the 1000 true rows are a tiny host gather —
    # or, for this generative corpus, re-synthesized on device)
    cand_draws = jnp.asarray(draws[np.clip(i_adc, 0, NDOC - 1)])
    @jax.jit
    def rerank(qd, tabs, cd, ids_):
        # tables as an argument, not a closure: the 100 MB pool table
        # would otherwise be serialized into the module (HTTP 413)
        rows = synth.gen_rows(tabs,
                              cd.reshape(-1, 4)).reshape(NQ, TOPK, D)
        s = jnp.einsum("qd,qkd->qk", qd, rows)
        s = jnp.where(ids_ >= 0, s, -jnp.inf)
        _, ti = jax.lax.top_k(s, 100)
        return jnp.take_along_axis(ids_, ti, 1)
    ids_rr = np.asarray(rerank(q_dev, tables_dev, cand_draws,
                               jnp.asarray(i_adc)))
    rr100 = np.mean([len(set(ids_rr[i].tolist())
                         & set(ids_exact[i].tolist())) / 100.0
                     for i in range(NQ)])
    out["adc_rerank_recall@100_vs_exact"] = round(float(rr100), 4)

    # throughput: pipelined batches, timing fetches one element (RPC
    # floor rules, CLAUDE.md)
    def fetch1(x):
        np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:1]))
        return x
    NB = 8
    qs = [jnp.asarray(np.roll(q, i, 0)) for i in range(NB)]
    fetch1(adc_ops.adc_search(qs[0], cbs, onehot, k=TOPK))  # compile
    t0 = time.time()
    hs = [adc_ops.adc_search(qi, cbs, onehot, k=TOPK) for qi in qs]
    for h in hs:
        fetch1(h)
    dt = time.time() - t0
    out["adc_topk_qps"] = round(NQ * NB / dt, 1)
    out["adc_topk_batch"] = NQ
    log(f"adc top-{TOPK}: {out['adc_topk_qps']} q/s at batch {NQ}; "
        f"recall@100 vs exact {r100:.4f} "
        f"(exact100 in top1000: {r100_in_1000:.4f})")

    if TAG:
        # variant capture (e.g. NQ_ADC_TAG=16 for the 16x32 index):
        # rename adc_* -> adc<TAG>_* so the merged artifact keeps both
        # the default 8x32 leg and this one side by side
        for k in list(out):
            out[f"adc{TAG}_{k[len('adc_'):]}"] = out.pop(k)


def main():
    """Each stage writes its keys to its OWN sidecar file
    (data/nqscale_stages/<stage>.json); the combined artifact is
    re-merged from ALL sidecars every run, so a prep-only or
    single-stage re-run can never clobber another stage's captured
    numbers (round-3 lesson: a driver re-run replaced the committed
    mesh keys with prep-only content)."""
    stage = os.environ.get("NQ_STAGE", "all")
    out_p = os.environ.get("NQ_OUT", osp.join(REPO, "NQSCALE_r05.json"))
    side_dir = os.environ.get(
        "NQ_STAGE_DIR", osp.join(REPO, "data", "nqscale_stages"))
    os.makedirs(side_dir, exist_ok=True)

    def run(name, fn):
        keys = {}
        fn(keys)
        if keys:                 # prep-only stream runs stay partial:
            side_p = osp.join(side_dir, f"{name}.json")
            prior = {}
            if osp.exists(side_p):
                try:
                    with open(side_p) as fr:
                        prior = json.load(fr)
                except Exception:
                    prior = {}
            prior.update(keys)   # accumulate within the stage too
            with open(side_p, "w") as fw:
                fw.write(json.dumps(prior) + "\n")

    if stage in ("all", "mesh"):
        run("mesh", stage_mesh)
    if stage in ("all", "stream"):
        run("stream", stage_stream)
    if stage in ("all", "adc"):
        run("adc" + os.environ.get("NQ_ADC_TAG", ""), stage_adc)

    out = {"metric": "nq_scale_demo", "ndoc_true": NQ_NDOC_TRUE}
    for p in sorted(glob.glob(osp.join(side_dir, "*.json"))):
        try:
            with open(p) as fr:
                out.update(json.load(fr))
        except Exception:
            pass
    with open(out_p, "w") as fw:
        fw.write(json.dumps(out) + "\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
