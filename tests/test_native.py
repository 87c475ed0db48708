"""C++ host kernels vs python oracles (skipped if the toolchain can't
build the .so)."""

import numpy as np
import pytest

from mevi_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.ensure_built()
    if lib is None:
        pytest.skip("native build unavailable")
    return lib


def test_build_csr_matches_python(lib, rng):
    codes = rng.integers(0, 8, size=(5000, 3)).astype(np.int32)
    off, dids = native.build_csr(codes, kary=8)
    from mevi_tpu.index.csr import build_csr as py_build
    off2, dids2 = py_build(codes, 8)
    np.testing.assert_array_equal(off, off2.astype(np.int64))
    # bucket contents equal as sets (stable order may differ)
    for c in range(0, 512, 37):
        a = set(dids[off[c]:off[c + 1]].tolist())
        b = set(dids2[off2[c]:off2[c + 1]].tolist())
        assert a == b


def test_match_answers(lib):
    passages = [b"the quick brown fox", b"lazy dog sleeps", b"hello world"]
    answers = [b"brown fox", b"world"]
    out = native.match_answers(passages, answers)
    assert out.tolist() == [True, False, True]
    # empty answer set
    assert native.match_answers(passages, [b"zzz"]).tolist() == [
        False, False, False]


def test_line_offsets(lib):
    data = b"a\tx\nbb\tyy\nccc\tzzz\n"
    offs = native.line_offsets(data)
    assert offs.tolist() == [0, 4, 10, 18]
    # no trailing newline
    offs2 = native.line_offsets(b"a\nb")
    assert offs2.tolist() == [0, 2, 3]


def test_sample_cluster_negatives(lib, rng):
    from mevi_tpu.index.csr import build_csr, pack_codes
    codes = rng.integers(0, 4, size=(200, 2)).astype(np.int32)
    off, dids = build_csr(codes, 4)
    cluster_of = pack_codes(codes, 4).astype(np.int64)
    pos = rng.integers(0, 200, 32).astype(np.int32)
    out = native.sample_cluster_negatives(
        off.astype(np.int64), dids, cluster_of, pos, n_neg=5, seed=7)
    assert out.shape == (32, 5)
    for i, p in enumerate(pos):
        assert (out[i] != p).all()
        # negatives come from the positive's cluster when it has >1 member
        members = set(dids[off[cluster_of[p]]:
                           off[cluster_of[p] + 1]].tolist())
        if len(members) > 1:
            assert set(out[i].tolist()) <= members


def test_sample_negatives_deterministic(lib, rng):
    from mevi_tpu.index.csr import build_csr, pack_codes
    codes = rng.integers(0, 4, size=(100, 2)).astype(np.int32)
    off, dids = build_csr(codes, 4)
    cluster_of = pack_codes(codes, 4).astype(np.int64)
    pos = np.arange(10, dtype=np.int32)
    a = native.sample_cluster_negatives(off.astype(np.int64), dids,
                                        cluster_of, pos, 3, seed=5)
    b = native.sample_cluster_negatives(off.astype(np.int64), dids,
                                        cluster_of, pos, 3, seed=5)
    np.testing.assert_array_equal(a, b)
