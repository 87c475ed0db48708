"""Fixture-driven test of the MARCO download/prep shell stage.

The wget targets can never execute here (no network), but the prep
half — the corpus LEFT join and the negatives-grouping awk
(``dataprocess/msmarco_passage/download_data.sh:14-15``) — runs against
staged fixture files, so the only previously-unexercised pipeline stage
gains coverage."""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "download_marco.sh")


@pytest.fixture()
def staged(tmp_path):
    raw = tmp_path / "marco" / "raw"
    raw.mkdir(parents=True)
    # para.txt: docid \t text (unsorted on purpose); doc 7 has no title
    (raw / "para.txt").write_text(
        "3\ttext three\n1\ttext one\n7\ttext seven\n2\ttext two\n")
    (raw / "para.title.txt").write_text(
        "2\ttitle two\n1\ttitle one\n3\ttitle three\n")
    # BM25 triples qid \t pos \t neg, \r\n records like the real dump
    triples = ("11\t100\t201\r\n11\t100\t202\r\n11\t101\t203\r\n"
               "12\t110\t301\r\n13\t120\t401\r\n13\t120\t402\r\n")
    (raw / "qidpidtriples.train.full.2.tsv").write_text(triples)
    (raw / "qrels.train.tsv").write_text("11\t0\t100\t1\n")
    return tmp_path / "marco"


def test_prep_join_and_negatives(staged):
    env = dict(os.environ, DATA_DIR=str(staged))
    r = subprocess.run(["bash", SCRIPT], env=env, capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    corpus = (staged / "raw" / "corpus.tsv").read_text().splitlines()
    # left join: every paragraph kept, missing title -> empty field,
    # numeric docid order (download_data.sh:14)
    assert corpus == [
        "1\ttitle one\ttext one",
        "2\ttitle two\ttext two",
        "3\ttitle three\ttext three",
        "7\t\ttext seven",
    ]
    negs = (staged / "raw" / "train.negatives.tsv").read_text() \
        .splitlines()
    # negatives grouped per qid as comma list (download_data.sh:15)
    assert negs == ["11\t201,202,203", "12\t301", "13\t401,402"]


def test_prep_is_idempotent(staged):
    env = dict(os.environ, DATA_DIR=str(staged))
    subprocess.run(["bash", SCRIPT], env=env, check=True,
                   capture_output=True)
    first = (staged / "raw" / "corpus.tsv").read_text()
    subprocess.run(["bash", SCRIPT], env=env, check=True,
                   capture_output=True)
    assert (staged / "raw" / "corpus.tsv").read_text() == first
