"""End-to-end serving benchmark: queries/sec/chip on the MEVI eval path.

Measures the reference's headline serving configuration
(``marco_eval_nci_rq.sh``: T5-ANCE query tower + NCI beam-10 coarse
decode + in-cluster fine re-rank, recall pool 1000) on one TPU chip with
random weights and a synthetic corpus at MS-MARCO-like geometry
(RQ 4x32, d=768).  Model quality does not affect the timed work: the
compute is identical for trained weights.

Baseline note: the reference publishes no latency/throughput numbers
(BASELINE.json "published": {}).  ``vs_baseline`` is reported against a
100 queries/sec/GPU stand-in for the reference stack on A100 — its beam
search is a per-step python loop with ``use_cache=False`` re-encoding and
host-side ragged cluster gathers at eval_batch_size=2
(``main_models.py:3555-4020``), for which 100 q/s/GPU is a generous
allowance.  Replace with a measured number when one exists.

Prints exactly ONE JSON line on stdout.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_QPS_PER_CHIP = 100.0

# The axon remote-compile helper writes its logs to fd 1; keep stdout
# clean for the single JSON result line by pointing fd 1 at stderr for
# the duration of the run and restoring it at the end.
_REAL_STDOUT_FD = os.dup(1)
os.dup2(2, 1)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit_result(obj):
    sys.stdout.flush()
    os.dup2(_REAL_STDOUT_FD, 1)
    print(json.dumps(obj), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mevi_tpu.decode.beam import nci_beam_search
    from mevi_tpu.eval.searcher import build_fine_index, fine_rerank
    from mevi_tpu.models.nci import NCIDims, NCIT5
    from mevi_tpu.models.t5 import T5Dims, T5Model

    dev = jax.devices()[0]
    log(f"device: {dev}")
    on_tpu = dev.platform != "cpu"

    # ---- geometry (reference headline config) --------------------------
    NDOC = int(os.environ.get("BENCH_NDOC", 1_000_000 if on_tpu else 20_000))
    BATCH = int(os.environ.get("BENCH_BATCH", 256 if on_tpu else 4))
    NBEAM = 10
    POOL = 1000 if on_tpu else 100
    CAP = 512 if on_tpu else 64
    QLEN = 32
    D = 768 if on_tpu else 64
    KARY, M = 32, 4
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    if on_tpu:
        t5 = T5Dims(num_layers=12, num_decoder_layers=6, d_model=768,
                    d_kv=64, d_ff=3072, num_heads=12, dropout_rate=0.0,
                    dtype=compute_dtype)
        qt5 = T5Dims(num_layers=12, num_decoder_layers=12, d_model=768,
                     d_kv=64, d_ff=3072, num_heads=12, dropout_rate=0.0,
                     dtype=compute_dtype)
    else:
        t5 = T5Dims(vocab_size=512, num_layers=2, num_decoder_layers=2,
                    d_model=D, d_kv=16, d_ff=128, num_heads=4,
                    dropout_rate=0.0)
        qt5 = t5

    nci_dims = NCIDims(t5=t5, kary=KARY, max_output_length=M + 2)
    nci = NCIT5(nci_dims)
    qtower = T5Model(qt5)

    rng = jax.random.PRNGKey(0)
    ids = jnp.ones((BATCH, QLEN), jnp.int32)
    mask = jnp.ones((BATCH, QLEN), jnp.int32)
    dec_in = jnp.zeros((BATCH, M + 2), jnp.int32)
    log("init params...")
    t0 = time.time()

    def cast(t):
        return jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)

    # init + cast in one jit: params are born on device in bf16 and never
    # cross the host link
    nci_params = jax.jit(
        lambda k: cast(nci.init(k, ids, mask, dec_in)["params"]))(rng)
    q_params = jax.jit(
        lambda k: cast(qtower.init(
            k, ids, mask, jnp.zeros((BATCH, 1), jnp.int32))["params"])
    )(rng)
    jax.block_until_ready((nci_params, q_params))
    log(f"params ready: {time.time() - t0:.1f}s")

    # ---- synthetic corpus + index --------------------------------------
    log(f"corpus: {NDOC} docs x {D}")
    host_rng = np.random.default_rng(0)
    emb = host_rng.normal(size=(NDOC, D)).astype(np.float32)
    doc_codes = host_rng.integers(0, KARY, size=(NDOC, M)).astype(np.int32)
    t0 = time.time()
    fine = build_fine_index(doc_codes, emb, KARY,
                            dtype=np.dtype("bfloat16") if on_tpu
                            else np.float32, pad_rows=CAP + 8)
    del emb
    log(f"index built: {time.time() - t0:.1f}s; transferring...")
    t0 = time.time()
    jax.block_until_ready(fine.sorted_emb)
    log(f"index on device: {time.time() - t0:.1f}s")

    # ---- serving pipeline ------------------------------------------------
    from mevi_tpu.serve import PallasServer

    server = PallasServer(qtower, nci, q_params, nci_params, fine,
                          num_beams=NBEAM, cap=CAP, pool=POOL)

    @jax.jit
    def encode_query(params, ids, mask):
        return qtower.apply({"params": params}, ids, mask,
                            method=T5Model.first_token_rep)

    def coarse(params, ids, mask):
        return nci_beam_search(nci, params, ids, mask, NBEAM,
                               length_penalty=0.8)

    def pipeline(ids, mask):
        s, i, _, _, _ = server.query(ids, mask)
        return s, i

    def pipelined_run(n_batches):
        """Realistic serving loop: enqueue device work for batch i+1
        while batch i's results stream back."""
        handles = [server.query_device(ids, mask)
                   for _ in range(n_batches)]
        return [server.finalize(h) for h in handles]

    log("compiling qenc...")
    t0 = time.time()
    jax.block_until_ready(encode_query(q_params, ids, mask))
    log(f"qenc compiled: {time.time() - t0:.1f}s; compiling beam...")
    t0 = time.time()
    jax.block_until_ready(coarse(nci_params, ids, mask)[0])
    log(f"beam compiled: {time.time() - t0:.1f}s; compiling rerank...")
    t0 = time.time()
    s, i = pipeline(ids, mask)
    jax.block_until_ready((s, i))
    log(f"rerank compiled + pipeline first run: {time.time() - t0:.1f}s")

    # ---- timing ----------------------------------------------------------
    iters = 20 if on_tpu else 3
    t0 = time.time()
    results = pipelined_run(iters)
    dt = time.time() - t0
    qps = BATCH * iters / dt
    log(f"{iters} pipelined batches x {BATCH} queries in {dt:.3f}s -> "
        f"{qps:.1f} q/s/chip")
    t0 = time.time()
    for _ in range(iters):
        s, i = pipeline(ids, mask)
    dt = time.time() - t0
    log(f"  (sequential query(): {BATCH * iters / dt:.1f} q/s)")

    # stage split (informational)
    for name, fn in (("qenc", lambda: encode_query(q_params, ids, mask)),
                     ("beam", lambda: coarse(nci_params, ids, mask))):
        jax.block_until_ready(fn())
        t0 = time.time()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        log(f"  {name}: {BATCH * iters / (time.time() - t0):.1f} q/s")

    emit_result({
        "metric": "serving_queries_per_sec_per_chip",
        "value": round(qps, 2),
        "unit": "queries/s/chip",
        "vs_baseline": round(qps / BASELINE_QPS_PER_CHIP, 3),
    })


if __name__ == "__main__":
    main()
