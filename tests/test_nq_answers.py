"""Word-boundary NQ answer matching (DPR SimpleTokenizer parity,
``get_answers.py:36-141``) and the vectorized coarse hit path."""

import numpy as np
import pytest

from mevi_tpu.data import prepare as P
from mevi_tpu.eval.ensemble import AnswerIndex
from mevi_tpu.utils import native as N


def test_word_boundary_rejects_substrings():
    passages = ["start of the art world", "restart the artful dodger",
                "modern art", "smartphones are smart"]
    hits = N.match_answer_sets(passages, [["art"], ["smart"]])
    # "art" is a word in 0 and 2, but NOT in "restart"/"artful"/"smart*"
    assert hits[0] == [0, 2]
    assert hits[1] == [3]


def test_multi_token_answers_contiguous():
    passages = ["the new york times reported", "york new times"]
    hits = N.match_answer_sets(passages, [["new york"], ["york times"],
                                          ["new york times reported"]])
    assert hits[0] == [0]
    assert hits[1] == [0]
    assert hits[2] == [0]


def test_punctuation_and_case():
    # SimpleTokenizer: punctuation chars are their own tokens; matching
    # is uncased; NFD normalization applies
    passages = ["He said: 'Hello, World!'", "hello world"]
    hits = N.match_answer_sets(passages, [["hello, world"],
                                          ["hello world"]])
    assert hits[0] == [0]      # includes the comma token
    assert hits[1] == [1]


def test_unicode_nfd_and_marks():
    # e + combining acute (NFD) must match the precomposed form
    passages = ["the café opens", "cafe opens"]
    hits = N.match_answer_sets(passages, [["café"], ["cafe"]])
    assert hits[0] == [0]
    assert hits[1] == [1]


def test_python_fallback_matches_native():
    texts = ["start of the art world", "He said: 'Hello, World!'",
             "café au lait", "a1b2 c3"]
    import unicodedata
    for t in texts:
        a = N.tokenize_hashes(t)
        b = N._py_tokenize_hashes(unicodedata.normalize("NFD", t))
        np.testing.assert_array_equal(a, b)


def test_build_answer_arrays_word_boundary():
    passages = ["the start line", "state of the art", "art gallery"]
    offsets, array = P.build_answer_arrays(passages, [["art"]],
                                           word_boundary=True)
    # docs 1 and 2 contain the word; doc 0 only "start"
    assert offsets.tolist() == [0, 0, 1, 2]
    assert array.tolist() == [0, 0]
    # the old substring mode would (wrongly) also hit doc 0
    offsets2, array2 = P.build_answer_arrays(passages, [["art"]],
                                             word_boundary=False)
    assert offsets2.tolist() == [0, 1, 2, 3]


def test_query_clusters_matches_bruteforce(rng):
    ndoc, nq, C = 50, 7, 6
    # random doc -> answering queries
    doc_answers = [sorted(rng.choice(nq, size=rng.integers(0, 3),
                                     replace=False).tolist())
                   for _ in range(ndoc)]
    aidx = AnswerIndex.from_answer_sets(doc_answers)
    cluster_of = rng.integers(0, C, ndoc).astype(np.int64)
    off, clus = aidx.query_clusters(cluster_of, nq)
    for q in range(nq):
        got = set(clus[off[q]:off[q + 1]].tolist())
        want = {int(cluster_of[d]) for d in range(ndoc)
                if q in doc_answers[d]}
        assert got == want, (q, got, want)
