"""CSR cluster-bucket layout."""

import jax.numpy as jnp
import numpy as np

from mevi_tpu.index import csr


def test_pack_unpack_roundtrip(rng):
    codes = rng.integers(0, 32, size=(50, 4)).astype(np.int32)
    idx = csr.pack_codes(codes, 32)
    back = csr.unpack_codes(idx, 4, 32)
    assert (back == codes).all()
    # big-endian: first code is the most significant digit
    assert csr.pack_codes(np.array([[1, 0, 0, 0]]), 32)[0] == 32 ** 3


def test_build_csr_matches_dict(rng):
    codes = rng.integers(0, 4, size=(100, 3)).astype(np.int32)
    offsets, doc_ids = csr.build_csr(codes, 4)
    # dict oracle (reference get_document_cluster_simple, pq.py:200-214)
    from collections import defaultdict
    d = defaultdict(list)
    for i, c in enumerate(codes):
        d[tuple(c.tolist())].append(i)
    for key, docs in d.items():
        ci = csr.pack_codes(np.array(key), 4)
        got = doc_ids[offsets[ci]:offsets[ci + 1]].tolist()
        assert sorted(got) == docs


def test_gather_bucket_padding(rng):
    codes = np.array([[0, 0], [0, 0], [0, 1], [1, 1]], np.int32)
    idx = csr.make_index(codes, kary=2)
    clusters = jnp.array([csr.pack_codes(np.array([0, 0]), 2),
                          csr.pack_codes(np.array([1, 0]), 2)])
    docs, size = csr.gather_bucket(idx.offsets, idx.doc_ids, clusters, cap=3)
    docs, size = np.array(docs), np.array(size)
    assert size.tolist() == [2, 0]
    assert sorted(docs[0][docs[0] >= 0].tolist()) == [0, 1]
    assert (docs[1] == -1).all()


def test_gather_bucket_cap_overflow(rng):
    codes = np.zeros((10, 2), np.int32)  # all docs in cluster 0
    idx = csr.make_index(codes, kary=2)
    docs, size = csr.gather_bucket(idx.offsets, idx.doc_ids,
                                   jnp.array([0]), cap=4)
    assert int(size[0]) == 10          # true size reported
    assert (np.array(docs[0]) >= 0).all() and docs.shape == (1, 4)


def test_size_histogram():
    codes = np.array([[0], [0], [1]], np.int32)
    idx = csr.make_index(codes, kary=4)
    h = csr.size_histogram(idx.offsets)
    assert h["num_clusters"] == 4
    assert h["nonempty"] == 2
    assert h["max"] == 2
