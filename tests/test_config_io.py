"""Config derivations and data-contract round trips."""

import numpy as np

from mevi_tpu.config import MEVIConfig, RQConfig
from mevi_tpu.data import io


def test_config_derivations_match_reference():
    cfg = MEVIConfig().finalize()
    # marco_train_nci_rq.sh: LABEL_LENGTH=4, CODE_BITS=5
    assert cfg.rq.kary == 32
    assert cfg.model.max_output_length == 6          # 2 + LABEL_LENGTH
    # main_models.py:1335-1341: kary * max_output_length + 2
    assert cfg.model.decode_vocab_size == 32 * 6 + 2
    assert cfg.model.code_len == 4
    assert cfg.rq.num_leaf_clusters == 32 ** 4


def test_config_json_roundtrip():
    cfg = MEVIConfig().finalize()
    cfg2 = MEVIConfig.from_json(cfg.to_json()).finalize()
    assert cfg2.rq.kary == cfg.rq.kary
    assert cfg2.infer.recall_num == cfg.infer.recall_num
    assert cfg.artifact_key("x") == cfg2.artifact_key("x")
    assert cfg.artifact_key("x") != cfg2.artifact_key("y")


def test_query_docids_tsv_roundtrip(tmp_path):
    rows = [("what is a tpu", [3, 5, 9]), ("q2", [1])]
    p = str(tmp_path / "dev.tsv")
    io.write_query_docids_tsv(p, rows)
    back = io.read_query_docids_tsv(p)
    assert back == rows
    assert io.read_gt_dict(p)["q2"] == [1]


def test_token_memmap_roundtrip(tmp_path):
    toks = np.arange(24, dtype=np.int64).reshape(2, 12)
    masks = (toks % 2).astype(np.int64)
    prefix = str(tmp_path / "all_document")
    io.write_token_memmaps(prefix, toks, masks)
    t2, m2 = io.open_token_memmaps(prefix, doc_length=12)
    assert (np.asarray(t2) == toks).all()
    assert (np.asarray(m2) == masks).all()


def test_embedding_memmap_roundtrip(tmp_path):
    emb = np.random.default_rng(1).normal(size=(5, 8)).astype(np.float32)
    p = str(tmp_path / "docemb.bin")
    io.write_embedding_memmap(p, emb)
    back = io.open_embedding_memmap(p, emb_size=8)
    np.testing.assert_array_equal(np.asarray(back), emb)


def test_packed_queries_roundtrip(tmp_path):
    ids = np.arange(12, dtype=np.int32).reshape(2, 6)
    mask = np.ones_like(ids)
    docids = np.array([7, 9], np.int32)
    packed = io.pack_queries(ids, mask, docids)
    p = str(tmp_path / "q.bin")
    packed.tofile(p)
    back = io.open_packed_queries(p, query_length=6)
    assert back.shape == (2, 13)
    assert (back[:, -1] == docids).all()
    assert (back[:, :6] == ids).all()


def test_result_tsv_contracts(tmp_path):
    coarse = str(tmp_path / "coarse.tsv")
    io.write_coarse_results(coarse, [
        ("q1", [[1, 2, 3, 4], [5, 6, 7, 8]], [11], [0.5, 0.25]),
    ])
    _, _, clusters = io.parse_result_tsv(coarse, {"query": 0, "cluster": 1})
    assert clusters["q1"] == [[1, 2, 3, 4], [5, 6, 7, 8]]

    hn = str(tmp_path / "hn.tsv")
    io.write_hardneg_results(hn, [("q1", [3.25], [4, 2], [9.5, 8.25])])
    preds, scores, _ = io.parse_result_tsv(
        hn, {"query": 0, "pred": 2, "score": 3})
    assert preds["q1"] == [4, 2]
    assert scores["q1"] == [9.5, 8.25]

    gt = str(tmp_path / "gt.tsv")
    io.write_query_docids_tsv(gt, [("q1", [4])])
    gpreds, _, _ = io.parse_result_tsv(gt, {"query": 0, "pred": -1})
    assert gpreds["q1"] == [4]
