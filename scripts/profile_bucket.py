"""Dispatch-isolated microbench of the bucket-scoring kernels.

Builds a serving-geometry synthetic CSR corpus ON DEVICE (8.84M x 768
int8 by default — host->device transfer of 6.8 GB would be tunnel-bound)
and times each kernel variant at G = batch x beams buckets, fetching one
element per rep so the tunnel RPC floor is paid once per timing, not
amortized away (CLAUDE.md measurement rules).

Env: PB_NDOC, PB_D, PB_G, PB_CAP, PB_REPS, PB_KERNELS (csv of
fused,v2,v3).
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mevi_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mevi_tpu.ops.bucket import (ALIGN, bucket_scores_fused,
                                 bucket_scores_v2, bucket_scores_v3,
                                 pack_offsets_2d)


def env_int(name, default):
    return int(os.environ.get(name, default))


def main():
    N = env_int("PB_NDOC", 8_841_823)
    D = env_int("PB_D", 768)
    G = env_int("PB_G", 5120)
    CAP = env_int("PB_CAP", 512)
    REPS = env_int("PB_REPS", 10)
    kernels = os.environ.get("PB_KERNELS", "fused,v3").split(",")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    host = np.random.default_rng(0)
    npad = ((N + CAP + ALIGN) // ALIGN + 1) * ALIGN
    # one scan program, int8 chunks: a full-size int32 intermediate
    # would be 27 GB, and a python chunk loop would queue per-chunk
    # dispatches whose temps PJRT pre-allocates at enqueue (CLAUDE.md)
    CH = 1 << 20
    nch = (npad + CH - 1) // CH
    def fill_chunk(key, _):
        key, sub = jax.random.split(key)
        return key, jax.random.randint(sub, (CH, D), -127, 128, jnp.int8)
    _, semb = jax.lax.scan(fill_chunk, jax.random.PRNGKey(0), None,
                           length=nch)
    npad = nch * CH                      # keep the bitcast un-sliced:
    semb = semb.reshape(npad, D)         # a slice would copy 6.8 GB
    semb.block_until_ready()
    print(f"corpus on device: {npad}x{D} int8", file=sys.stderr)

    # synthetic CSR: ~27k nonempty clusters (the serving distribution's
    # nonempty count at 8.84M), bucket draws doc-weighted like serving
    ncl = 27_651
    cuts = np.sort(host.choice(N - 1, size=ncl - 1, replace=False)) + 1
    offsets = np.concatenate([[0], cuts, [N]]).astype(np.int64)
    sizes = np.diff(offsets)
    cidx = host.choice(ncl, size=G, p=sizes / sizes.sum()).astype(np.int32)
    starts = offsets[cidx].astype(np.int32)
    ends = np.minimum(offsets[cidx + 1], starts + CAP).astype(np.int32)
    q = host.normal(size=(G, D)).astype(np.float32)

    off2d = jnp.asarray(pack_offsets_2d(offsets))
    cidx_d = jnp.asarray(cidx)
    starts_d = jnp.asarray(starts)
    ends_d = jnp.asarray(ends)
    q_d = jnp.asarray(q).astype(jnp.bfloat16)

    def timed(fn):
        out = fn()                       # compile + warm
        s0 = np.asarray(jax.tree.leaves(out)[0][0, 0])
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(jax.tree.leaves(out)[0][0, 0])   # one-element fetch
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3, s0, out

    results = {}
    outs = {}
    for name in kernels:
        if name == "fused":
            fn = lambda: bucket_scores_fused(semb, off2d, cidx_d, q_d, CAP)
        elif name == "v2":
            fn = lambda: bucket_scores_v2(semb, starts_d, ends_d, q_d, CAP)
        elif name == "v3":
            fn = lambda: bucket_scores_v3(semb, starts_d, ends_d, q_d, CAP)
        else:
            raise SystemExit(f"unknown kernel {name}")
        ms, _, out = timed(fn)
        results[name] = ms
        outs[name] = tuple(np.asarray(x) for x in out)
        print(f"{name}: {ms:.2f} ms (median of {REPS}, incl. one-element "
              f"fetch)", file=sys.stderr)

    if len(outs) > 1:                    # cross-check kernels agree
        names = list(outs)
        ref_s, ref_r = outs[names[0]]
        for n in names[1:]:
            s2, r2 = outs[n]
            assert (ref_r == r2).all(), f"{n} rows != {names[0]}"
            valid = ref_r >= 0
            np.testing.assert_allclose(s2[valid], ref_s[valid],
                                       rtol=2e-2, atol=1.0)
        print("kernels agree on scores/rows", file=sys.stderr)

    import json
    print(json.dumps({"geometry": {"ndoc": N, "d": D, "g": G, "cap": CAP},
                      "ms": {k: round(v, 2) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
