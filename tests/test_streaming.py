"""Host-streaming search (eval/streaming.py) vs in-memory oracles."""

import jax.numpy as jnp
import numpy as np

from mevi_tpu.eval import searcher
from mevi_tpu.eval.streaming import (HostStreamFineReranker,
                                     streaming_mips_topk)
from mevi_tpu.ops.mips import mips_topk


def test_streaming_mips_matches_in_memory(rng):
    nd, d, nq, k = 5000, 32, 8, 50
    emb = rng.normal(size=(nd, d)).astype(np.float32)
    q = rng.normal(size=(nq, d)).astype(np.float32)
    s1, i1 = mips_topk(jnp.asarray(q), jnp.asarray(emb), k=k)
    # chunk NOT dividing nd exercises the padded tail
    s2, i2 = streaming_mips_topk(jnp.asarray(q), emb, k=k, chunk=1024)
    np.testing.assert_allclose(np.asarray(s1), s2, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(i1), i2)


def test_streaming_mips_int8_memmap(rng, tmp_path):
    nd, d, nq, k = 3000, 16, 4, 20
    emb = rng.normal(size=(nd, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb8 = np.clip(np.round(emb * 126), -127, 127).astype(np.int8)
    p = str(tmp_path / "emb.bin")
    mm = np.memmap(p, np.int8, "w+", shape=emb8.shape)
    mm[:] = emb8
    mm.flush()
    ro = np.memmap(p, np.int8, "r", shape=emb8.shape)
    q = rng.normal(size=(nq, d)).astype(np.float32)
    s1, i1 = mips_topk(jnp.asarray(q), jnp.asarray(emb8), k=k)
    s2, i2 = streaming_mips_topk(jnp.asarray(q), ro, k=k, chunk=512)
    np.testing.assert_array_equal(np.asarray(i1), i2)
    np.testing.assert_allclose(np.asarray(s1), s2, rtol=1e-3)


def test_host_stream_fine_matches_fine_rerank(rng):
    n, d, kary, M, cap, pool = 600, 16, 4, 3, 32, 20
    emb = rng.normal(size=(n, d)).astype(np.float32)
    codes = rng.integers(0, kary, size=(n, M)).astype(np.int32)
    index = searcher.build_fine_index(codes, emb, kary)
    q = rng.normal(size=(7, d)).astype(np.float32)
    beams = rng.integers(0, kary, size=(7, 5, M)).astype(np.int32)
    s1, i1, nd1 = searcher.fine_rerank(
        jnp.asarray(q), jnp.asarray(beams), index.offsets,
        index.doc_ids, index.sorted_emb, kary, cap, pool)
    hs = HostStreamFineReranker(
        np.asarray(index.sorted_emb), np.asarray(index.host_offsets),
        np.asarray(index.host_doc_ids), kary, cap, pool, sub_batch=3)
    s2, i2, nd2 = hs(q, beams)
    np.testing.assert_array_equal(np.asarray(nd1), nd2)
    s1, i1 = np.asarray(s1), np.asarray(i1)
    for b in range(7):
        v = i1[b] >= 0
        assert set(i1[b][v].tolist()) == set(i2[b][i2[b] >= 0].tolist())
        np.testing.assert_allclose(s1[b][v], s2[b][v], rtol=1e-4)
