"""Micro-benchmark the bucket kernels on the real chip (fused-offsets
vs double-buffered v2) at serving geometry."""

import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mevi_jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from mevi_tpu.ops.bucket import (bucket_scores_fused, bucket_scores_v2,
                                 bucket_scores_v2_reference,
                                 pack_offsets_2d)


def fetch(out):
    np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[:1]))


def timeit(fn, *argsets, iters=6):
    fetch(fn(*argsets[0]))
    t0 = time.perf_counter()
    outs = [fn(*argsets[i % len(argsets)]) for i in range(iters)]
    for o in outs:
        fetch(o)
    return (time.perf_counter() - t0) / iters


def main():
    host = np.random.default_rng(0)
    N, D, CAP, G = 2_000_000, 768, 512, 5120
    semb = jnp.asarray(host.normal(size=(N + CAP + 8, D))
                       .astype(np.float32)).astype(jnp.bfloat16)
    # synthetic CSR: ~30k clusters over N rows
    C = 30_000
    bounds = np.sort(host.integers(0, N, C - 1))
    offsets = np.concatenate([[0], bounds, [N]]).astype(np.int64)
    off2d = jnp.asarray(pack_offsets_2d(offsets))
    variants = []
    for v in range(3):
        ci = host.integers(0, C, G)
        st = offsets[ci].astype(np.int32)
        en = offsets[ci + 1].astype(np.int32)
        variants.append((ci.astype(np.int32), st, en))
    q = jnp.asarray(host.normal(size=(G, D)).astype(np.float32)) \
        .astype(jnp.bfloat16)

    t = timeit(lambda ci: bucket_scores_fused(semb, off2d,
                                              jnp.asarray(ci), q, CAP)[0],
               *[(v[0],) for v in variants])
    print(f"fused-offsets kernel: {t*1e3:.1f} ms", flush=True)

    t = timeit(lambda st, en: bucket_scores_v2(
        semb, jnp.asarray(st), jnp.asarray(en), q, CAP)[0],
        *[(v[1], v[2]) for v in variants])
    print(f"double-buffered v2  : {t*1e3:.1f} ms", flush=True)

    # correctness vs oracle on one variant
    st, en = variants[0][1], variants[0][2]
    k_s, k_r = bucket_scores_v2(semb, jnp.asarray(st), jnp.asarray(en),
                                q, CAP)
    o_s, o_r = bucket_scores_v2_reference(semb, jnp.asarray(st),
                                          jnp.asarray(en), q, CAP)
    np.testing.assert_array_equal(np.asarray(k_r), np.asarray(o_r))
    valid = np.asarray(k_r) >= 0
    np.testing.assert_allclose(np.asarray(k_s)[valid],
                               np.asarray(o_s)[valid], rtol=2e-2,
                               atol=1e-2)
    print("v2 == oracle: OK", flush=True)


if __name__ == "__main__":
    main()
