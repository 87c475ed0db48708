"""Bench per-rung sidecar caching (round-4 rc-124 resilience)."""

import importlib
import json
import sys


def _bench(tmp_path, monkeypatch):
    monkeypatch.setenv("BENCH_STAGE_DIR", str(tmp_path / "stages"))
    sys.path.insert(0, "/root/repo")
    import bench
    importlib.reload(bench)
    return bench


def test_sidecar_roundtrip_and_ladder_order(tmp_path, monkeypatch):
    bench = _bench(tmp_path, monkeypatch)
    attempts = [(8_841_823, "int8"), (1_000_000, "bf16")]
    assert bench._newest_sidecar(attempts) is None
    bench._save_sidecar(1_000_000, "bf16", {"value": 111.0})
    bench._save_sidecar(8_841_823, "int8", {"value": 222.0})
    # ladder order wins (headline rung first), not recency
    sc = bench._newest_sidecar(attempts)
    assert sc["result"]["value"] == 222.0
    assert bench._load_sidecar(1_000_000, "bf16")["result"]["value"] \
        == 111.0
    assert bench._load_sidecar(4_000_000, "int8") is None


def test_newest_sidecar_falls_back_to_any_rung(tmp_path, monkeypatch):
    bench = _bench(tmp_path, monkeypatch)
    bench._save_sidecar(500_000, "bf16", {"value": 5.0})
    # no ladder rung matches -> newest of any rung
    sc = bench._newest_sidecar([(8_841_823, "int8")])
    assert sc["result"]["value"] == 5.0


def test_emit_sidecar_flags_and_prints_json(tmp_path, monkeypatch,
                                            capsys):
    bench = _bench(tmp_path, monkeypatch)
    bench._save_sidecar(8_841_823, "int8", {
        "metric": "serving_queries_per_sec_per_chip", "value": 3362.0,
        "unit": "queries/s/chip", "vs_baseline": 123.0})
    sc = bench._newest_sidecar([(8_841_823, "int8")])
    bench._emit_sidecar(sc, "test reason")
    out = capsys.readouterr().out.strip().splitlines()
    obj = json.loads(out[-1])
    assert obj["value"] == 3362.0
    assert obj["from_sidecar"] is True
    assert obj["sidecar_reason"] == "test reason"
    assert obj["sidecar_age_s"] >= 0
