"""Smoke coverage for the full-configuration quality pipeline
(scripts/quality_full.py) and the bench's trained-bundle discovery.

Round-3 lesson: the quality run's tower/eval stages had no CPU smoke
test, so a mid-flight death left an incomplete bundle and the bench
silently served the untrained pipeline.  These tests make that failure
mode loud: the tiny end-to-end run must produce EVERY artifact the
bench's ``_bundle_complete`` contract requires, and discovery must
reject a bundle missing ``tower_params.npz``.
"""

import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_quality_run(tmp_path_factory):
    """Run all four stages (data|train|tower|eval) at smoke geometry on
    CPU through the real script, once per test session."""
    workdir = str(tmp_path_factory.mktemp("qf_tiny"))
    out_p = osp.join(workdir, "QUALITY_tiny.json")
    env = dict(os.environ)
    env.update({
        "QF_TINY": "1", "QF_FORCE_CPU": "1",
        "QF_STAGE": "all", "QF_WORKDIR": workdir, "QF_OUT": out_p,
        "QF_NDOC": "400", "QF_UTT": "2", "QF_EPOCHS": "2",
        "QF_BATCH": "16", "QF_SCAN": "4",
        "QF_TOWER_STEPS": "16", "QF_TOWER_BATCH": "32",
        "QF_TOWER_SCAN": "4",
        "QF_NDEV": "64", "QF_EVAL_BATCH": "32",
        "QF_CAP": "64", "QF_POOL": "50",
        "JAX_PLATFORMS": "cpu",
    })
    # decouple from the outer test mesh: the script manages its own jax
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "scripts", "quality_full.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    return workdir, out_p


def test_quality_tiny_produces_complete_bundle(tiny_quality_run):
    """All artifacts the bench bundle contract needs must exist."""
    workdir, _ = tiny_quality_run
    for rel in ("spec.json", "codebooks.npy", "codes.npy",
                "tower_params.npz",
                osp.join("ckpts", "nci", "leaderboard.json")):
        assert osp.exists(osp.join(workdir, rel)), rel
    with open(osp.join(workdir, "ckpts", "nci",
                       "leaderboard.json")) as fr:
        board = json.load(fr)
    assert len(board) >= 1


def test_quality_tiny_metrics_json(tiny_quality_run):
    """The QUALITY json carries every headline field, sane ranges."""
    _, out_p = tiny_quality_run
    with open(out_p) as fr:
        q = json.load(fr)
    for k in ("coarse_hit@1", "coarse_hit@10", "fine_recall@1",
              "fine_recall@10", "fine_recall@100", "fine_mrr@10",
              "tower_exact_mips_recall@100", "ensemble_recall@100",
              "top_beam_level_acc", "top_beam_prefix_acc"):
        assert k in q, k
    assert 0.0 <= q["coarse_hit@10"] <= 1.0
    assert q["fine_recall@100"] >= q["fine_recall@1"] - 1e-9
    assert len(q["top_beam_level_acc"]) == 3   # tiny spec levels


def test_quality_tiny_bundle_discovered_by_bench(tiny_quality_run,
                                                 monkeypatch,
                                                 tmp_path):
    """bench._discover_bundle must pick up the complete tiny bundle
    when it is the newest quality_* dir."""
    workdir, _ = tiny_quality_run
    sys.path.insert(0, REPO)
    import bench
    base = tmp_path / "data"
    base.mkdir()
    os.symlink(workdir, base / "quality_zz_tiny")
    monkeypatch.delenv("BENCH_CKPT", raising=False)
    got = bench._discover_bundle(base=str(base))
    monkeypatch.delenv("BENCH_CKPT", raising=False)
    assert got is not None and osp.realpath(got) == osp.realpath(workdir)


def test_discover_bundle_rejects_incomplete(monkeypatch, tmp_path):
    """A bundle missing tower_params.npz (the round-3 failure) must be
    rejected; one missing the NCI leaderboard likewise."""
    sys.path.insert(0, REPO)
    import bench
    base = tmp_path / "data"
    cand = base / "quality_r99"
    (cand / "ckpts" / "nci").mkdir(parents=True)
    (cand / "spec.json").write_text("{}")
    (cand / "ckpts" / "nci" / "leaderboard.json").write_text("{}")
    monkeypatch.delenv("BENCH_CKPT", raising=False)
    assert bench._discover_bundle(base=str(base)) is None
    assert "BENCH_CKPT" not in os.environ
    # completing the bundle flips the verdict
    np.savez(cand / "tower_params.npz", x=np.zeros(1))
    assert bench._discover_bundle(base=str(base)) == str(cand)
    monkeypatch.delenv("BENCH_CKPT", raising=False)


def test_discover_bundle_env_override(monkeypatch, tmp_path):
    """BENCH_CKPT='' opts out; explicit path wins over discovery."""
    sys.path.insert(0, REPO)
    import bench
    monkeypatch.setenv("BENCH_CKPT", "")
    assert bench._discover_bundle(base=str(tmp_path)) is None
    monkeypatch.setenv("BENCH_CKPT", "/some/where")
    assert bench._discover_bundle(base=str(tmp_path)) == "/some/where"
