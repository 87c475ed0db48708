"""Bisect the per-step decode cost on the real chip.

Variants (each a 5-iteration scan, R = B * nb rows):
  matmul-calib   scan of 30 (R,768)x(768,768) matmuls (op-overhead floor)
  dec-only       T5 decoder steps, no PAWA, no LM head
  dec+head       + level-table head (no PAWA)
  full           decoder + PAWA + head (the serving step)
"""

import os
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
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, iters=5):
    fetch(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        fetch(o)
    return (time.perf_counter() - t0) / iters


def main():
    B = int(os.environ.get("B", 512))
    NB, KARY, M, QLEN = 10, 32, 4, 32
    R = B * NB
    dt = jnp.bfloat16
    t5 = T5Dims(num_layers=12, num_decoder_layers=6, d_model=768,
                d_kv=64, d_ff=3072, num_heads=12, dropout_rate=0.0,
                dtype=dt)

    ids = jnp.ones((B, QLEN), jnp.int32)
    mask = jnp.ones((B, QLEN), jnp.int32)
    dec_in = jnp.zeros((B, M + 2), jnp.int32)

    def cast(t):
        return jax.tree.map(
            lambda x: x.astype(dt)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)

    # ---- calibration: pure matmul scan -----------------------------------
    Ws = jnp.ones((30, 768, 768), dt) * 0.01
    x0 = jnp.ones((R, 768), dt)

    @jax.jit
    def matmul_scan(x0, Ws):
        def body(x, _):
            for i in range(30):
                x = jnp.tanh(x @ Ws[i])
            return x, ()
        return jax.lax.scan(body, x0, jnp.arange(5))[0]

    t = timeit(matmul_scan, x0, Ws)
    print(f"calib: 5 x 30 (R={R},768)x(768,768) matmuls: {t*1e3:.1f} ms "
          f"({5*30*2*R*768*768/t/1e12:.1f} TFLOP/s)", flush=True)

    for name, use_pawa in (("dec+head (no pawa)", False),
                           ("full (pawa+delta)", True)):
        dims = NCIDims(t5=t5, kary=KARY, max_output_length=M + 2,
                       use_pawa=use_pawa)
        model = NCIT5(dims)
        params = jax.jit(lambda k, m=model: cast(
            m.init(k, ids, mask, dec_in)["params"]))(jax.random.PRNGKey(0))
        fetch(params)

        def apply_p(p, method, *a, **kw):
            return model.apply({"params": p}, *a, method=method, **kw)

        @jax.jit
        def steps(params, ids, mask, model=model):
            enc = apply_p(params, NCIT5.encode, ids, mask)
            kvs = apply_p(params, NCIT5.project_cross_kvs, enc)
            dec_cache, pawa_cache, pawa_mem = apply_p(
                params, NCIT5.init_decode_state, R)
            W_lvl, A_lvl = apply_p(params, NCIT5.head_level_tables)
            if A_lvl is None:
                A_lvl = jnp.zeros((M + 2, 1, 1), W_lvl.dtype)
            tok = jnp.zeros((R, 1), jnp.int32)

            def body(carry, xs):
                t, W_t, A_t = xs
                tok, dec_cache, pawa_cache = carry
                logits, dec_cache, pawa_cache = apply_p(
                    params, NCIT5.decode_logits_step, tok, t, dec_cache,
                    pawa_cache, kvs, pawa_mem, mask, beams=NB,
                    level_tables=(W_t, A_t))
                nxt = jnp.argmax(logits[:, :KARY], -1).astype(jnp.int32)
                return (nxt[:, None] + t * KARY + 2, dec_cache,
                        pawa_cache), logits.sum()

            _, outs = jax.lax.scan(
                body, (tok, dec_cache, pawa_cache),
                (jnp.arange(M + 1), W_lvl[:M + 1], A_lvl[:M + 1]))
            return outs

        # subtract the shared enc prologue by timing it alone
        @jax.jit
        def prologue(params, ids, mask):
            enc = apply_p(params, NCIT5.encode, ids, mask)
            kvs = apply_p(params, NCIT5.project_cross_kvs, enc)
            return jax.tree.leaves(kvs)[0]

        tp = timeit(prologue, params, ids, mask)
        t = timeit(steps, params, ids, mask)
        print(f"{name}: enc-prologue {tp*1e3:.1f} ms; "
              f"5 steps {t*1e3:.1f} ms (steps-only "
              f"{(t-tp)*1e3:.1f} ms, {(t-tp)*1e3/5:.1f} ms/step)",
              flush=True)


if __name__ == "__main__":
    main()
