"""Data preparation transforms."""

import numpy as np
import pytest

from mevi_tpu.data import prepare as P


def test_build_train_pairs():
    queries = {"1": "what is x", "2": "who is y"}
    qrels = [("1", "0", "10", "1"), ("2", "20")]
    pairs = P.build_train_pairs(queries, qrels)
    assert pairs == [("what is x", 10), ("who is y", 20)]


def test_build_dev_dedup_groups():
    queries = {"1": "q"}
    qrels = [("1", "5"), ("1", "9")]
    dev = P.build_dev_dedup(queries, qrels)
    assert dev == [("q", [5, 9])]


def test_doc_aug_spans_bounds():
    rows = [(0, "short title", "a b c d e f g h")]
    spans = P.doc_aug_spans(rows, seed=1, spans_per_doc=5, span_len=4)
    assert len(spans) == 5
    for text, did in spans:
        assert did == 0
        assert 1 <= len(text.split(" ")) <= 4


def test_qg_subset():
    rows = [f"r{i}" for i in range(10)]
    assert P.qg_subset(rows, 5) == [f"r{i}" for i in range(0, 10, 2)]
    assert P.qg_subset(rows, 1) == ["r0"]
    assert P.qg_subset(rows, 10) == rows


def test_doc_as_query_text():
    assert P.doc_as_query_text("T", "C") == "Title: T Text: C"
    assert P.doc_as_query_text("T", "C", "ar2") == "T[SEP]C"


def test_compose_train_data(tmp_path):
    from mevi_tpu.data.io import write_query_docids_tsv
    write_query_docids_tsv(str(tmp_path / "train_mevi.tsv"),
                           [("q1", [1]), ("q2", [2])])
    write_query_docids_tsv(str(tmp_path / "qg5.tsv"), [("g1", [1])])
    corpus = str(tmp_path / "corpus.tsv")
    with open(corpus, "w") as fw:
        fw.write("0\tt0\tc0\n1\tt1\tc1\n")
    pairs, doc2q = P.compose_train_data(
        str(tmp_path), "gtq_doc_qg5", corpus_path=corpus)
    texts = [p[0] for p in pairs]
    assert "q1" in texts and "g1" in texts
    assert "Title: t0 Text: c0" in texts
    assert doc2q[1] == ["g1", "q1"]


def test_sample_corpus_remap():
    kept, remap = P.sample_corpus(100, drop_rate=0.3, seed=0)
    assert 50 < len(kept) < 90
    pairs = [("q", int(kept[0])), ("q2", -1 if 99 in remap else 99)]
    out = P.remap_pairs([("q", int(kept[0]))], remap)
    assert out == [("q", 0)] if kept[0] == kept.min() else out


def test_build_answer_arrays():
    passages = ["the sky is blue", "grass is green", "water is blue"]
    answers = [["blue"], ["green tea"], []]
    offsets, array = P.build_answer_arrays(passages, answers)
    # query 0 ("blue") answers docs 0 and 2; query 1 matches nothing
    assert offsets.tolist() == [0, 1, 1, 2]
    assert array.tolist() == [0, 0]
    from mevi_tpu.eval.ensemble import AnswerIndex
    idx = AnswerIndex(offsets, array)
    assert idx.first_hit_rank(0, [1, 2, 0]) == 1


def test_nq_biencoder_pairs(tmp_path):
    import json
    p = tmp_path / "bi.json"
    p.write_text(json.dumps([
        {"question": "q?", "positive_ctxs": [{"passage_id": "5"}]},
    ]))
    assert P.nq_biencoder_pairs(str(p)) == [("q?", 4)]


def test_qg_repair():
    rows = [("q1", 0), ("q1", 0), ("  ", 0), ("q2", 0),
            ("a", 1), ("b", 1), ("c", 1)]
    cleaned, need = P.qg_repair(rows, n_per_doc=3)
    assert ("q1", 0) in cleaned and ("q2", 0) in cleaned
    assert sum(1 for _, d in cleaned if d == 0) == 2
    assert need == [0]          # doc 0 has only 2 usable queries
