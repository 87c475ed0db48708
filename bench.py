"""End-to-end serving benchmark: queries/sec/chip on the MEVI eval path.

Measures the reference's headline serving configuration
(``marco_eval_nci_rq.sh``: T5-ANCE query tower + NCI beam-10 coarse
decode + in-cluster fine re-rank, recall pool 1000) on one TPU chip at
REAL geometry: MS-MARCO-scale corpus (8,841,823 docs x 768, bf16), RQ
4x32 codes from an actual k-means fit of clustered-Gaussian embeddings
(so cluster sizes carry realistic skew), with

* an on-device assert that the Pallas bucket kernel matches its XLA
  oracle on a sample,
* recall@100-vs-exact-MIPS checks of the cluster+cap fine stage from
  the same run (codebook-beam and oracle-coarse stand-ins for the
  model path),
* a per-stage latency table (qenc / beam / bucket) with the RPC
  roundtrip floor reported, rough MFU estimates, and a small-batch
  latency probe.

Measurement notes for tunneled TPU deployments (axon):
``jax.block_until_ready`` is a NO-OP — every timing fetches a result;
each dispatch/fetch is an HTTP RPC with a ~15-35 ms floor (measured and
reported as rpc_floor_ms).  The serving pipeline therefore returns ONE
packed array per batch (see ``PallasServer``) and distinct batches are
enqueued back-to-back.

Prints exactly ONE JSON line on stdout.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

BASELINE_QPS_PER_CHIP = 100.0
# no published reference throughput exists (BASELINE.json "published": {});
# 100 q/s/GPU is a generous stand-in for the reference's python-loop
# beam + host-side ragged gathers at eval_batch_size=2

# The axon remote-compile helper writes its logs to fd 1; keep stdout
# clean for the single JSON result line.
_REAL_STDOUT_FD = os.dup(1)
os.dup2(2, 1)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mevi_jax_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit_result(obj):
    sys.stdout.flush()
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

    from mevi_tpu.decode.beam import nci_beam_search_incremental
    from mevi_tpu.models.nci import NCIDims, NCIT5
    from mevi_tpu.models.t5 import T5Dims, T5Model
    from mevi_tpu.ops import rq as rq_ops

    dev = jax.devices()[0]
    log(f"device: {dev}")
    on_tpu = dev.platform != "cpu"
    if not on_tpu:
        NDOC = min(NDOC, 20_000)

    BATCH = int(os.environ.get("BENCH_BATCH", 512 if on_tpu else 4))
    NBATCH = int(os.environ.get("BENCH_NBATCH", 20 if on_tpu else 3))
    NBEAM = 10
    POOL = 1000 if on_tpu else 100
    CAP = 512 if on_tpu else 64
    QLEN = 32
    D = 768 if on_tpu else 64
    KARY, M = 32, 4
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    # corpus precision: bf16 (default) or int8 (halves the index to
    # 6.8 GB at 8.84M docs — full MS-MARCO scale fits one v5e with
    # headroom; quality loss is quantified by the recall checks below)
    corpus_int8 = os.environ.get("BENCH_DTYPE", "bf16") == "int8"
    extras["ndoc"] = NDOC
    extras["batch"] = BATCH
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
    if on_tpu:
        t5 = T5Dims(num_layers=12, num_decoder_layers=6, d_model=768,
                    d_kv=64, d_ff=3072, num_heads=12, dropout_rate=0.0,
                    dtype=dt)
        qt5 = T5Dims(num_layers=12, num_decoder_layers=12, d_model=768,
                     d_kv=64, d_ff=3072, num_heads=12, dropout_rate=0.0,
                     dtype=dt)
    else:
        t5 = T5Dims(vocab_size=512, num_layers=2, num_decoder_layers=2,
                    d_model=D, d_kv=16, d_ff=128, num_heads=4,
                    dropout_rate=0.0)
        qt5 = t5
    nci = NCIT5(NCIDims(t5=t5, kary=KARY, max_output_length=M + 2))
    qtower = T5Model(qt5)

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
    # 3-level shared-sons hierarchy (RQ 4x32's generative model: level 4
    # encodes the leaf noise) with per-level Zipf skew.  Flat clustered
    # Gaussians make RQ levels 2+ pure noise — query and neighbor codes
    # then NEVER agree and any coarse stand-in scores ~0 recall by
    # construction, which benchmarks nothing.
    #
    # A doc is fully determined by 4 small ints (level choices + noise
    # pool row), so the 13.6 GB sorted matrix is synthesized straight
    # into HBM chunk-by-chunk (donated dynamic_update_slice) — no 13.6 GB
    # host generation, disk file, or wire transfer (the wire moves
    # ~140 MB of draws instead; the full-corpus prep drops from ~35 min
    # to ~2 min and host staging can't OOM the device).
    cache_dir = os.environ.get("BENCH_CACHE",
                               f"/tmp/mevi_bench_h3_{NDOC}_{D}")
    os.makedirs(cache_dir, exist_ok=True)
    codes_p = os.path.join(cache_dir, "codes.npy")
    cbs_p = os.path.join(cache_dir, "codebooks.npy")
    host = np.random.default_rng(0)
    L_SCALE = (1.0, 0.42, 0.18)
    L_ZIPF = (1.1, 0.8, 0.5)
    EPS = 0.06
    POOLN = 1 << 16
    t0 = time.time()
    draws = np.empty((NDOC, 4), np.int32)
    for j, a in enumerate(L_ZIPF):
        p = 1.0 / np.arange(1, KARY + 1) ** a
        draws[:, j] = host.choice(KARY, size=NDOC, p=p / p.sum())
    draws[:, 3] = host.integers(0, POOLN, NDOC)
    ctrs_h = np.stack([host.normal(size=(KARY, D)).astype(np.float32) * s
                       for s in L_SCALE])
    pool_h = (host.standard_normal((POOLN, D)) * EPS).astype(np.float32)
    tables = (jnp.asarray(ctrs_h), jnp.asarray(pool_h))

    def _gen(tables, dr):
        ctrs, pool = tables
        v = (ctrs[0][dr[:, 0]] + ctrs[1][dr[:, 1]] + ctrs[2][dr[:, 2]]
             + pool[dr[:, 3]])
        # unit-norm rows: max-inner-product == nearest-L2, so the L2-fit
        # RQ index and the exact-MIPS oracle rank by the SAME objective
        return v / jnp.linalg.norm(v, axis=1, keepdims=True)

    gen_chunk = jax.jit(_gen)
    CH = 1 << 19
    if os.path.exists(codes_p):
        log(f"codes cache hit: {cache_dir}")
        codes = np.load(codes_p)
        cbs = jnp.asarray(np.load(cbs_p))
    else:
        fit_rng = np.random.default_rng(7)
        nfit = min(NDOC, 500_000)
        sample = gen_chunk(tables, jnp.asarray(
            draws[fit_rng.choice(NDOC, size=nfit, replace=False)]))
        cbs, _ = rq_ops.rq_train(sample, levels=M, kary=KARY, iters=8,
                                 key=jax.random.PRNGKey(1))
        del sample
        cbs = cbs.astype(jnp.float32)

        @jax.jit
        def gen_assign(tables, dr, cbs):
            return rq_ops.assign(_gen(tables, dr), cbs, "rq", "l2")

        codes = np.empty((NDOC, M), np.int32)
        for s in range(0, NDOC, CH):
            e = min(NDOC, s + CH)
            codes[s:e] = np.asarray(
                gen_assign(tables, jnp.asarray(draws[s:e]), cbs))
        np.save(cbs_p, np.asarray(cbs))
        np.save(codes_p, codes)
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
    n_pad = NDOC + CAP + 8
    n_pad += (-n_pad) % 8
    if corpus_int8:
        # symmetric global-scale quantization; unit-norm rows keep all
        # components well inside the sampled max
        s_max = float(jnp.max(jnp.abs(gen_chunk(
            tables, jnp.asarray(draws[:min(NDOC, 1 << 16)])))))
        Q_SCALE = 126.0 / s_max
        extras["int8_scale"] = round(Q_SCALE, 3)
        dt_corp = jnp.int8
    else:
        Q_SCALE = None
        dt_corp = dt
    buf = jnp.zeros((n_pad, D), dt_corp)

    # ONE scan program fills the whole matrix: separate per-chunk
    # dispatches each pre-allocate their f32 generator temporaries at
    # ENQUEUE time, so a queue of them runs the 15.75G hbm out next to
    # the 13.6G buffer; the scan allocates one temp set.  The final
    # chunk re-covers [NDOC-CH, NDOC) so every start index is in range.
    CH_FILL = min(1 << 16, NDOC)
    starts = list(range(0, NDOC - CH_FILL + 1, CH_FILL))
    if starts[-1] + CH_FILL < NDOC:
        starts.append(NDOC - CH_FILL)
    dr_all = np.stack([draws[doc_ids[s:s + CH_FILL]] for s in starts])

    @partial(jax.jit, donate_argnums=(0,))
    def fill_all(buf, tables, dr_all, starts):
        def body(b, xs):
            dr, i = xs
            row = _gen(tables, dr)
            if Q_SCALE is not None:
                row = jnp.clip(jnp.round(row * Q_SCALE), -127, 127)
            row = row.astype(b.dtype)
            return jax.lax.dynamic_update_slice_in_dim(b, row, i, 0), ()
        return jax.lax.scan(body, buf,
                            (dr_all, starts))[0]

    buf = fill_all(buf, tables, jnp.asarray(dr_all),
                   jnp.asarray(starts, jnp.int32))
    fetch1(buf)
    fine = FineIndex(jnp.asarray(offsets.astype(np.int64)),
                     jnp.asarray(doc_ids), buf, M, KARY,
                     host_offsets=offsets, host_doc_ids=doc_ids)
    log(f"index built in HBM: {time.time() - t0:.1f}s")

    # recall-check queries: perturbed documents, re-synthesized from
    # their draws (exact same rows as the index)
    nq_r = 64
    rec_ids = host.integers(0, NDOC, nq_r)
    q_base = np.asarray(gen_chunk(tables, jnp.asarray(draws[rec_ids])),
                        np.float32)
    del tables  # free table HBM before the towers come up

    log("init params...")
    t0 = time.time()
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
        from mevi_tpu.ops.bucket import (bucket_scores_fused,
                                         bucket_scores_fused_reference)
        g = 64
        cidx_s = jnp.asarray(
            host.choice(cidx_all, size=g).astype(np.int32))
        q_s = jnp.asarray(host.normal(size=(g, D)).astype(
            np.float32)).astype(dt)
        k_s, k_r = bucket_scores_fused(
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
    # (here untrained) NCI model:
    #   * codebook-beam over the query embedding (the ADC/topic path),
    #   * ORACLE coarse = clusters of the exact top-NBEAM docs, which
    #     isolates the cap + NBEAM-cluster truncation loss.
    t0 = time.time()
    q_emb = q_base + 0.5 * EPS * host.standard_normal((nq_r, D)) \
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

    bcodes, _ = rq_ops.beam_search(jnp.asarray(q_emb), cbs,
                                   num_beams=NBEAM, dist_mode="l2")
    rec_b = cluster_recall(np.asarray(bcodes), "recall100_beam_coarse")
    # oracle beams: first NBEAM DISTINCT clusters of the exact ranking
    # (duplicates would waste beam slots on the same member list)
    oracle = np.zeros((nq_r, NBEAM, M), np.int32)
    for i in range(nq_r):
        seen, j = set(), 0
        for did in eids_h[i]:
            key = tuple(codes[did])
            if key in seen:
                continue
            seen.add(key)
            oracle[i, j] = codes[did]
            j += 1
            if j == NBEAM:
                break
        oracle[i, j:] = oracle[i, max(j - 1, 0)]
    rec_o = cluster_recall(oracle, "recall100_oracle_coarse")
    log(f"recall@100 vs exact MIPS: beam-coarse {rec_b:.4f} / "
        f"oracle-coarse {rec_o:.4f} ({time.time() - t0:.1f}s)")

    # ---- compile serving path -------------------------------------------
    log("compiling serving pipeline...")
    t0 = time.time()
    server.query(ids, mask)
    t_compile = time.time() - t0
    extras["cold_start_s"] = round(t_compile, 1)
    log(f"pipeline compiled + first run: {t_compile:.1f}s")

    # ---- throughput -------------------------------------------------------
    # beam codes from RANDOM NCI weights land in empty clusters and the
    # fine stage would do no work; cidx_override drives the bucket stage
    # with clusters sampled doc-weighted from the real (skewed) corpus
    # distribution while qenc + beam still run in full
    from mevi_tpu.ops.bucket import ROWS
    g = BATCH * NBEAM
    g_pad = g + (-g) % ROWS
    batches = []
    ndoc_seen = []
    for i in range(NBATCH):
        ids_i = jnp.asarray(np.full((BATCH, QLEN), 1 + (i % 7), np.int32))
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
    extras["ndoc_per_query"] = round(float(np.mean(ndoc_seen)), 1)

    t0 = time.time()
    for i, m, c in batches[:max(NBATCH // 2, 1)]:
        server.finalize(server.query_device(i, m, c))
    dt_seq = time.time() - t0
    extras["sequential_qps"] = round(
        BATCH * max(NBATCH // 2, 1) / dt_seq, 1)

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

    _, _, _, _, q_rep0 = server._coarse(
        server.q_params, server.nci_params, batches[0][0], mask,
        server.level_tables)

    def bucket_fn(i):
        return server._bucket(server.sorted_emb, server.offsets2d,
                              batches[i % NBATCH][2], q_rep0, CAP)[0]

    t_qenc = timed(qenc_fn)
    t_beam = timed(beam_fn)
    t_bucket = timed(bucket_fn)
    stage = {"qenc_ms": round(t_qenc * 1e3, 1),
             "beam_ms": round(t_beam * 1e3, 1),
             "bucket_ms": round(t_bucket * 1e3, 1),
             "rpc_floor_ms": extras["rpc_floor_ms"]}
    # rough MFU vs the v5e bf16 peak (197 TFLOP/s)
    if on_tpu:
        R = BATCH * NBEAM
        qenc_flop = 2 * 110e6 * BATCH * QLEN       # enc + 1-token dec
        step_flop = 2 * (50e6 + 24e6) * R \
            + 2 * 768 * 768 * 33 * R               # dec+pawa+head delta
        dec_flop = (2 * 85e6 * BATCH * QLEN        # nci encoder
                    + 2 * 6 * 2 * 768 * 768 * BATCH * QLEN  # cross k/v
                    + step_flop * (1 / NBEAM + 4))  # step0 at B + 4 + EOS
        peak = 197e12
        stage["qenc_mfu_pct"] = round(
            qenc_flop / max(t_qenc - t_rpc, 1e-9) / peak * 100, 1)
        stage["beam_mfu_pct"] = round(
            dec_flop / max(t_beam - t_rpc, 1e-9) / peak * 100, 1)
    extras["stages"] = stage
    log(f"stages: {stage}")
    return qps


def main():
    NDOC = int(os.environ.get("BENCH_NDOC", 8_841_823))
    if os.environ.get("BENCH_CHILD"):
        extras = {}
        qps = run(int(os.environ["BENCH_CHILD"]), extras)
        emit_result({
            "metric": "serving_queries_per_sec_per_chip",
            "value": round(qps, 2),
            "unit": "queries/s/chip",
            "vs_baseline": round(qps / BASELINE_QPS_PER_CHIP, 3),
            **extras,
        })
        return

    # each attempt runs in a SUBPROCESS: an OOM'd attempt can pin HBM
    # through live buffers until process exit, so in-process retries
    # always re-OOM (observed with the 8.84M -> 4.4M -> 1M ladder)
    import subprocess
    fallback_from = None
    child_timeout = int(os.environ.get("BENCH_CHILD_TIMEOUT", 1500))
    # ladder: full scale in bf16; if HBM is short (pool degradation),
    # full scale in int8 (6.8 GB index); then smaller bf16 indexes
    if os.environ.get("BENCH_DTYPE"):
        attempts = [(NDOC, os.environ["BENCH_DTYPE"]),
                    (NDOC // 2, os.environ["BENCH_DTYPE"])]
    else:
        attempts = [(NDOC, "bf16"), (NDOC, "int8"),
                    (NDOC // 2, "bf16"), (1_000_000, "bf16")]
    for ndoc_try, dtype_try in attempts:
        env = dict(os.environ, BENCH_CHILD=str(ndoc_try),
                   BENCH_DTYPE=dtype_try)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                stdout=subprocess.PIPE, timeout=child_timeout)
        except subprocess.TimeoutExpired:
            # a wedged chip claim can hang a child at its first dispatch
            # indefinitely; kill and try the next size
            log(f"bench child timed out at ndoc={ndoc_try} "
                f"({child_timeout}s)")
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
            emit_result(obj)
            return
        log(f"bench child failed at ndoc={ndoc_try} rc={r.returncode}")
        if fallback_from is None:
            fallback_from = ndoc_try
        time.sleep(20)                    # let the chip claim recycle
    raise SystemExit("bench failed at every corpus size")


if __name__ == "__main__":
    main()
