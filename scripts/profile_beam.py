"""Dissect the NCI beam-decode serving stage on the real chip.

Measurement notes for the axon-tunneled TPU:
* ``jax.block_until_ready`` is a NO-OP — timings must fetch (a tiny
  slice of) the result to host,
* every dispatch is an HTTP RPC with a fixed cost (measured below as
  the tiny-op roundtrip) — per-stage numbers are reported both
  sequentially (includes RPC) and pipelined (enqueue all, fetch all),
* closed-over device arrays are serialized into the program body; big
  ones blow the tunnel's request limit (HTTP 413) — everything is
  passed as arguments here.
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mevi_jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mevi_tpu.models.nci import NCIDims, NCIT5
from mevi_tpu.models.t5 import T5Dims


def fetch(out):
    """Materialize a tiny slice of the first output leaf (forces the
    whole program to execute; each host fetch is its own ~30 ms RPC, so
    fetch exactly one)."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, iters=5, warmup=1, vary=1):
    def perturb(x, i):
        if not hasattr(x, "dtype"):
            return x
        if jnp.issubdtype(x.dtype, jnp.integer):
            return x + (i % 2)
        return x + jnp.asarray(i * 1e-6, x.dtype)

    variants = []
    for i in range(iters + warmup):
        a = list(args)
        a[vary] = jax.tree.map(lambda x: perturb(x, i), a[vary])
        variants.append(a)
    for i in range(warmup):
        fetch(fn(*variants[i]))
    # sequential: dispatch + fetch per iteration (includes RPC roundtrip)
    t0 = time.perf_counter()
    for i in range(iters):
        fetch(fn(*variants[warmup + i]))
    seq = (time.perf_counter() - t0) / iters
    # pipelined: enqueue all, fetch all
    t0 = time.perf_counter()
    outs = [fn(*variants[i % len(variants)]) for i in range(iters)]
    for o in outs:
        fetch(o)
    pipe = (time.perf_counter() - t0) / iters
    return seq, pipe


def report(name, t, B=None):
    seq, pipe = t
    extra = f" -> {B/pipe:.0f} q/s" if B else ""
    print(f"{name}: seq {seq*1e3:.1f} ms / pipe {pipe*1e3:.1f} ms{extra}",
          flush=True)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    B = int(os.environ.get("B", 256))
    NB = 10
    KARY, M = 32, 4
    QLEN = 32
    dt = jnp.bfloat16
    t5 = T5Dims(num_layers=12, num_decoder_layers=6, d_model=768,
                d_kv=64, d_ff=3072, num_heads=12, dropout_rate=0.0,
                dtype=dt)
    dims = NCIDims(t5=t5, kary=KARY, max_output_length=M + 2)
    model = NCIT5(dims)

    ids = jnp.ones((B, QLEN), jnp.int32)
    mask = jnp.ones((B, QLEN), jnp.int32)
    dec_in = jnp.zeros((B, M + 2), jnp.int32)

    def cast(t):
        return jax.tree.map(
            lambda x: x.astype(dt)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)

    t0 = time.time()
    params = jax.jit(lambda k: cast(
        model.init(k, ids, mask, dec_in)["params"]))(jax.random.PRNGKey(0))
    fetch(params)
    print(f"params ready {time.time()-t0:.1f}s", file=sys.stderr)

    R = B * NB

    # tiny-op RPC roundtrip baseline
    tiny = jax.jit(lambda a: a + 1)
    report("tiny-op roundtrip", timeit(tiny, jnp.ones((8, 8)), vary=0))

    def apply_p(p, method, *a, **kw):
        return model.apply({"params": p}, *a, method=method, **kw)

    @jax.jit
    def enc_stage(params, ids, mask):
        enc = apply_p(params, NCIT5.encode, ids, mask)
        memory, mem_mask, _ = apply_p(params, NCIT5.build_memory, enc,
                                      mask)
        kvs = apply_p(params, NCIT5.project_cross_kvs, memory)
        return enc, mem_mask, kvs

    enc, mem_mask, kvs = enc_stage(params, ids, mask)
    report(f"enc+kv proj (B={B})", timeit(enc_stage, params, ids, mask),
           B)

    from mevi_tpu.decode.beam import (nci_beam_search,
                                      nci_beam_search_incremental)

    def beam_inc(params, ids, mask):
        return nci_beam_search_incremental(model, params, ids, mask, NB)

    beam_inc(params, ids, mask)
    report("incremental beam", timeit(beam_inc, params, ids, mask), B)

    def beam_panel(params, ids, mask):
        return nci_beam_search(model, params, ids, mask, NB)

    beam_panel(params, ids, mask)
    report("panel beam      ", timeit(beam_panel, params, ids, mask), B)

    # M+1 greedy decode steps, no beam logic (isolates decoder+PAWA+head)
    kvs_b = jax.jit(
        lambda kvs: jax.tree.map(lambda x: jnp.repeat(x, NB, axis=0),
                                 kvs))(kvs)
    mem_mask_b = jnp.repeat(mask, NB, axis=0)
    tok = jnp.zeros((R, 1), jnp.int32)

    @jax.jit
    def dec_steps_only(params, tok, kvs_b, mem_mask_b):
        dec_cache, pawa_cache, pawa_mem = apply_p(
            params, NCIT5.init_decode_state, R)
        W_lvl, A_lvl = apply_p(params, NCIT5.head_level_tables)

        def body(carry, xs):
            t, W_t, A_t = xs
            tok, dec_cache, pawa_cache = carry
            logits, dec_cache, pawa_cache = apply_p(
                params, NCIT5.decode_logits_step, tok, t, dec_cache,
                pawa_cache, kvs_b, pawa_mem, mem_mask_b,
                level_tables=(W_t, A_t))
            nxt = jnp.argmax(logits[:, :KARY], -1).astype(jnp.int32)
            return (nxt[:, None] + t * KARY + 2, dec_cache,
                    pawa_cache), logits.sum()

        _, outs = jax.lax.scan(
            body, (tok, dec_cache, pawa_cache),
            (jnp.arange(M + 1), W_lvl[:M + 1], A_lvl[:M + 1]))
        return outs

    dec_steps_only(params, tok, kvs_b, mem_mask_b)
    report(f"{M+1} greedy decode steps (R={R})",
           timeit(dec_steps_only, params, tok, kvs_b, mem_mask_b), B)

    # adaptor head delta alone: old 3-operand einsum vs packed matmul
    h_t = jnp.ones((R, 768), dt)
    seq_t = jnp.ones((R, 768), dt)
    A_param = params["adaptor_kernel"]

    @jax.jit
    def adaptor_einsum(A_param, h_t, seq_t):
        A = A_param.reshape(768, 768, dims.decode_vocab_size)
        A_t = jax.lax.dynamic_slice_in_dim(A, 2 + 1 * KARY, KARY, 2)
        return jnp.einsum("bi,idk,bd->bk", h_t, A_t, seq_t)

    adaptor_einsum(A_param, h_t, seq_t)
    report("adaptor einsum OLD (1 step)",
           timeit(adaptor_einsum, A_param, h_t, seq_t))

    @jax.jit
    def adaptor_packed(A_param, h_t, seq_t):
        A = A_param.reshape(768, 768, dims.decode_vocab_size)
        A_t = jnp.concatenate(
            [A[:, :, 2 + KARY:2 + 2 * KARY], A[:, :, 1:2]],
            -1).reshape(768, 768 * (KARY + 1))
        tmp = (h_t @ A_t).reshape(-1, 768, KARY + 1)
        return jnp.einsum("bdk,bd->bk", tmp, seq_t)

    adaptor_packed(A_param, h_t, seq_t)
    report("adaptor packed NEW (1 step)",
           timeit(adaptor_packed, A_param, h_t, seq_t))

    if os.environ.get("TRACE"):
        # trace-derived device-op breakdown (works over the tunnel):
        # wall times above include the RPC floor; these do not
        from mevi_tpu.utils import profiling as P
        tables = jax.jit(
            lambda p: apply_p(p, NCIT5.head_level_tables))(params)

        def beam_fn(i):
            fetch(nci_beam_search_incremental(
                model, params, ids + (i % 2), mask, NB,
                level_tables=tables))

        def enc_fn(i):
            fetch(enc_stage(params, ids + (i % 2), mask))

        for name, fn, flop_fn in (
                ("enc+kv", enc_fn,
                 lambda: P.compiled_flops(enc_stage, params, ids, mask)),
                ("beam", beam_fn,
                 lambda: P.compiled_flops(
                     nci_beam_search_incremental, model, params, ids,
                     mask, NB, level_tables=tables))):
            avg, per_op = P.traced_stage_seconds(
                fn, n=3, trace_dir=f"/tmp/mevi_trace_{name}")
            fl = flop_fn()
            mfu = (fl / max(avg, 1e-9) / P.TPU_V5E_BF16_PEAK * 100
                   if fl else float("nan"))
            print(f"[trace] {name}: device {avg*1e3:.1f} ms, "
                  f"flops {fl and fl/1e9:.1f} GF, MFU {mfu:.1f}%",
                  flush=True)
            top = sorted(per_op.items(), key=lambda kv: -kv[1])[:12]
            for op, s in top:
                print(f"    {s*1e3/3:7.2f} ms  {op[:90]}", flush=True)


if __name__ == "__main__":
    main()
