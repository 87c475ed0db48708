"""CLI smoke tests with tiny synthetic artifacts (CPU)."""

import json
import os.path as osp

import numpy as np
import pytest

from mevi_tpu.cli.main import main
from mevi_tpu.data import io


def test_evaluate_cmd(tmp_path, capsys):
    gt = str(tmp_path / "gt.tsv")
    io.write_query_docids_tsv(gt, [("q1", [3]), ("q2", [7])])
    ranks = str(tmp_path / "ranks.tsv")
    with open(ranks, "w") as fw:
        fw.write("q1\t\t[3, 5]\t[0.9, 0.1]\n")
        fw.write("q2\t\t[5, 3]\t[0.9, 0.1]\n")
    main(["evaluate", "--gt_file", gt, "--ranks_file", ranks,
          "--pred_col", "2", "--recall_num", "1,2"])
    out = capsys.readouterr().out
    assert "RECALL1 0.5" in out
    assert "MRR2 0.5" in out


def test_search_cmd(tmp_path, rng, capsys):
    docs = rng.normal(size=(50, 16)).astype(np.float32)
    qs = docs[:4]
    dp = str(tmp_path / "docemb.bin")
    qp = str(tmp_path / "qemb.bin")
    io.write_embedding_memmap(dp, docs)
    io.write_embedding_memmap(qp, qs)
    cfgp = str(tmp_path / "cfg.json")
    from mevi_tpu.config import EncoderConfig, MEVIConfig, RQConfig
    cfg = MEVIConfig(rq=RQConfig(emb_size=16),
                     encoder=EncoderConfig(d_model=16))
    with open(cfgp, "w") as fw:
        fw.write(cfg.to_json())
    out_p = str(tmp_path / "res.tsv")
    main(["search", "--config", cfgp, "--doc_embeddings", dp,
          "--query_embeddings", qp, "--topk", "5", "--output", out_p])
    preds, scores, _ = io.parse_result_tsv(out_p,
                                           {"query": 0, "pred": 2,
                                            "score": 3})
    # each query is a corpus doc: top-1 should be itself
    for i in range(4):
        assert preds[str(i)][0] == i


def test_build_index_cmd(tmp_path, rng, capsys):
    emb = rng.normal(size=(200, 16)).astype(np.float32)
    ep = str(tmp_path / "docemb.bin")
    io.write_embedding_memmap(ep, emb)
    from mevi_tpu.config import EncoderConfig, MEVIConfig, RQConfig
    cfg = MEVIConfig(rq=RQConfig(subvector_num=2, subvector_bits=2,
                                 emb_size=16),
                     encoder=EncoderConfig(d_model=16))
    cfgp = str(tmp_path / "cfg.json")
    with open(cfgp, "w") as fw:
        fw.write(cfg.to_json())
    outd = str(tmp_path / "index")
    main(["build-index", "--config", cfgp, "--embeddings", ep,
          "--output_dir", outd, "--iters", "4"])
    codes = np.load(osp.join(outd, "rq_codes.npy"))
    cbs = np.load(osp.join(outd, "rq_codebooks.npy"))
    assert codes.shape == (200, 2)
    assert cbs.shape == (2, 4, 16)
    hist = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert hist["num_clusters"] == 16


def test_prepare_cmd(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "train.query.txt").write_text("1\tq one\n2\tq two\n")
    (raw / "qrels.train.tsv").write_text("1\t0\t10\t1\n2\t0\t20\t1\n")
    (raw / "dev.query.txt").write_text("3\tq three\n")
    (raw / "qrels.dev.tsv").write_text("3\t0\t30\t1\n3\t0\t31\t1\n")
    origin = tmp_path / "origin"
    main(["prepare", "--raw_dir", str(raw), "--origin_dir", str(origin)])
    rows = io.read_query_docids_tsv(str(origin / "train_mevi.tsv"))
    assert rows == [("q one", [10]), ("q two", [20])]
    dev = io.read_query_docids_tsv(str(origin / "dev_mevi_dedup.tsv"))
    assert dev == [("q three", [30, 31])]


def test_ensemble_cmd(tmp_path, rng, capsys):
    gt = str(tmp_path / "gt.tsv")
    io.write_query_docids_tsv(gt, [("q1", [0])])
    ance = str(tmp_path / "ance.tsv")
    with open(ance, "w") as fw:
        fw.write("q1\t\t[0, 1]\t[0.9, 0.8]\n")
    coarse = str(tmp_path / "coarse.tsv")
    io.write_coarse_results(coarse, [("q1", [[0, 0], [1, 1]], [0],
                                      [0.5, 0.3])])
    codes = np.array([[0, 0], [1, 1]], np.int32)
    mp = str(tmp_path / "codes.npy")
    np.save(mp, codes)
    main(["ensemble", "--gt_file", gt, "--ance_file", ance,
          "--coarse_file", coarse, "--mapping_file", mp,
          "--recall_num", "1,2"])
    out = capsys.readouterr().out
    assert "R@1=1.0" in out


def test_search_cmd_adc(tmp_path, rng, capsys):
    import jax
    import jax.numpy as jnp
    from mevi_tpu.ops import rq as rq_ops
    docs = rng.normal(size=(80, 16)).astype(np.float32)
    cbs, codes = rq_ops.rq_train(jnp.asarray(docs), 2, 4, iters=5,
                                 key=jax.random.PRNGKey(0))
    qs = docs[:3]
    dp = str(tmp_path / "docemb.bin")
    qp = str(tmp_path / "qemb.bin")
    io.write_embedding_memmap(dp, docs)
    io.write_embedding_memmap(qp, qs)
    np.save(str(tmp_path / "codes.npy"), np.asarray(codes))
    np.save(str(tmp_path / "cbs.npy"), np.asarray(cbs))
    from mevi_tpu.config import EncoderConfig, MEVIConfig, RQConfig
    cfg = MEVIConfig(rq=RQConfig(subvector_num=2, subvector_bits=2,
                                 emb_size=16),
                     encoder=EncoderConfig(d_model=16))
    cfgp = str(tmp_path / "cfg.json")
    with open(cfgp, "w") as fw:
        fw.write(cfg.to_json())
    out_p = str(tmp_path / "adc.tsv")
    main(["search", "--config", cfgp, "--doc_embeddings", dp,
          "--query_embeddings", qp, "--topk", "5",
          "--adc_codes", str(tmp_path / "codes.npy"),
          "--adc_codebooks", str(tmp_path / "cbs.npy"),
          "--output", out_p])
    preds, scores, _ = io.parse_result_tsv(
        out_p, {"query": 0, "pred": 2, "score": 3})
    assert len(preds) == 3 and all(len(v) == 5 for v in preds.values())
