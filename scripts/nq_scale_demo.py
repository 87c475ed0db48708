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


def main():
    """Each stage writes its keys to its OWN sidecar file
    (data/nqscale_stages/<stage>.json); the combined artifact is
    re-merged from ALL sidecars every run, so a prep-only or
    single-stage re-run can never clobber another stage's captured
    numbers (round-3 lesson: a driver re-run replaced the committed
    mesh keys with prep-only content)."""
    stage = os.environ.get("NQ_STAGE", "all")
    out_p = os.environ.get("NQ_OUT", osp.join(REPO, "NQSCALE_r04.json"))
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
