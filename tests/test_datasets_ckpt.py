"""Dataset iterators, hard-negative sampler, checkpoint manager."""

import jax.numpy as jnp
import numpy as np
import pytest

from mevi_tpu.data.datasets import (ClusterNegativeSampler, NCIDataset,
                                    TwinDataset, device_prefetch)
from mevi_tpu.train.checkpoints import ArtifactCache, CheckpointManager


def test_nci_dataset_batches(rng):
    ds = NCIDataset(
        query_ids=np.arange(40).reshape(10, 4).astype(np.int32),
        query_mask=np.ones((10, 4), np.int32),
        codes=rng.integers(0, 4, size=(10, 2)).astype(np.int32))
    batches = list(ds.batches(4, rng))
    assert len(batches) == 2
    assert batches[0]["query_ids"].shape == (4, 4)
    seen = np.concatenate([b["query_ids"][:, 0] for b in batches])
    assert len(set(seen.tolist())) == 8  # shuffled, no dup


def test_cluster_negative_sampler_in_cluster(rng):
    codes = np.zeros((20, 2), np.int32)
    codes[10:, 0] = 1                     # two clusters of 10
    s = ClusterNegativeSampler(codes, kary=4)
    negs = s.sample(3, 5, rng)
    assert len(negs) == 5
    assert (negs < 10).all() and (negs != 3).all()


def test_cluster_negative_sampler_singleton_fallback(rng):
    codes = np.array([[0, 0], [0, 1], [1, 0], [2, 2]], np.int32)
    s = ClusterNegativeSampler(codes, kary=4)
    negs = s.sample(0, 2, rng)             # cluster (0,0) is a singleton
    # hamming-1 fallback: (0,1) and (1,0) qualify, (2,2) does not
    assert set(negs.tolist()) <= {1, 2}


def test_twin_dataset_groups(rng):
    ndoc = 30
    codes = rng.integers(0, 2, size=(ndoc, 2)).astype(np.int32)
    ds = TwinDataset(
        query_ids=np.ones((8, 4), np.int32),
        query_mask=np.ones((8, 4), np.int32),
        pos_doc=rng.integers(0, ndoc, 8),
        doc_tokens=np.arange(ndoc * 6).reshape(ndoc, 6).astype(np.int32),
        doc_masks=np.ones((ndoc, 6), np.int32),
        sampler=ClusterNegativeSampler(codes, kary=2),
        n_neg=3)
    b = next(ds.batches(4, rng))
    assert b["doc_ids"].shape == (16, 6)
    assert b["doc_index"].shape == (4, 4)
    assert (b["doc_index"][:, 0] >= 0).all()


def test_device_prefetch_order(rng):
    it = ({"x": np.array([i])} for i in range(5))
    out = [int(b["x"][0]) for b in device_prefetch(it, size=2)]
    assert out == list(range(5))


def test_artifact_cache(tmp_path):
    c = ArtifactCache(str(tmp_path))
    assert not c.has("k1", "emb.npy")
    c.save_array("k1", "emb.npy", np.eye(3))
    assert c.has("k1", "emb.npy")
    np.testing.assert_array_equal(c.load_array("k1", "emb.npy"), np.eye(3))
    c.save_json("k1", "meta.json", {"a": 1})
    assert c.load_json("k1", "meta.json") == {"a": 1}


def test_checkpoint_manager_topk(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=2,
                            monitor="recall", mode="max")
    state = {"w": jnp.ones((2, 2))}
    assert mgr.save("e1", state, metric=0.5) is not None
    assert mgr.save("e2", state, metric=0.7) is not None
    assert mgr.save("e3", state, metric=0.2) is None     # below top-2
    assert mgr.save("e4", state, metric=0.9) is not None  # evicts e1
    assert mgr.best_tag() == "e4"
    restored = mgr.restore("e4", {"w": jnp.zeros((2, 2))})
    np.testing.assert_array_equal(np.array(restored["w"]), np.ones((2, 2)))
    import os.path as osp
    assert not osp.exists(str(tmp_path / "ck" / "e1"))


def test_checkpoint_manager_from_dir_meta(tmp_path):
    # the writer's monitor/mode must round-trip: a dev-recall board
    # re-opened as mode=min would return the WORST tag
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=2,
                            monitor="dev_hit10", mode="max")
    state = {"w": jnp.ones((2,))}
    mgr.save("e0", state, metric=0.3)
    mgr.save("e1", state, metric=0.8)
    re = CheckpointManager.from_dir(str(tmp_path / "ck"))
    assert (re.monitor, re.mode) == ("dev_hit10", "max")
    assert re.best_tag() == "e1"
    # pre-meta boards (no leaderboard.meta.json) fall back to loss/min
    import os
    os.remove(str(tmp_path / "ck" / "leaderboard.meta.json"))
    legacy = CheckpointManager.from_dir(str(tmp_path / "ck"))
    assert (legacy.monitor, legacy.mode) == ("loss", "min")
    assert legacy.best_tag() == "e0"


def test_checkpoint_manager_monitor_change_demotes_stale(tmp_path):
    """Re-opening a loss/min board as dev_hit10/max must not let the
    stale loss values (>1) permanently outrank hit@10 (<=1) entries
    (advisor r4): old tags are demoted to worst rank but stay
    restorable until new entries evict them."""
    d = str(tmp_path / "ck")
    old = CheckpointManager(d, keep=2, monitor="loss", mode="min")
    state = {"w": jnp.ones((2,))}
    old.save("s100", state, metric=2.31)
    old.save("s200", state, metric=1.97)
    new = CheckpointManager(d, keep=2, monitor="dev_hit10", mode="max")
    # stale tags still present (resume can find them)...
    assert new.best_tag() in ("s100", "s200")
    # ...but any new metric outranks them and pruning evicts stale first
    assert new.save("s300", state, metric=0.41) is not None
    assert new.save("s400", state, metric=0.55) is not None
    assert new.best_tag() == "s400"
    assert set(new._board) == {"s300", "s400"}
    import os.path as osp
    assert osp.exists(osp.join(d, "leaderboard.prev.json"))
    # same-monitor reopen does NOT demote
    again = CheckpointManager(d, keep=2, monitor="dev_hit10", mode="max")
    assert again.best_tag() == "s400"
    assert again._board["s400"] == 0.55


def test_file_negative_sampler(tmp_path, rng):
    from mevi_tpu.data.datasets import FileNegativeSampler
    from mevi_tpu.data import io
    p = str(tmp_path / "hn.tsv")
    io.write_hardneg_results(p, [("q1", [], [3, 4, 5], [2.0, 1.0, 0.5])])
    s = FileNegativeSampler.from_hardneg_tsv(p, num_docs=100)
    out = s.sample("q1", 4, 2, rng)
    assert set(out.tolist()) <= {3, 5}
    # unknown query -> random corpus fallback
    out2 = s.sample("zzz", 0, 3, rng)
    assert len(out2) == 3 and (out2 != 0).all()


def test_alternating_batches():
    from mevi_tpu.data.datasets import alternating_batches
    a = [{"x": i} for i in range(4)]
    b = [{"y": i} for i in range(2)]
    out = list(alternating_batches(a, b, (2, 1)))
    kinds = [k for k, _ in out]
    assert kinds == ["a", "a", "b", "a", "a", "b"]


def test_host_prefetch_order_and_errors():
    from mevi_tpu.data.datasets import host_prefetch

    assert list(host_prefetch(iter(range(10)), size=3)) == list(range(10))

    def boom():
        yield 1
        raise ValueError("worker died")

    out = []
    import pytest as _pytest
    with _pytest.raises(ValueError, match="worker died"):
        for x in host_prefetch(boom(), size=2):
            out.append(x)
    assert out == [1]


def test_host_prefetch_abandoned_consumer_stops_worker():
    """Breaking out of the generator mid-epoch must release the worker
    thread (it used to block forever on a full queue)."""
    import threading
    import time
    from mevi_tpu.data.datasets import host_prefetch

    n_before = threading.active_count()
    gen = host_prefetch(iter(range(1000)), size=2)
    assert next(gen) == 0
    gen.close()                      # triggers the finally -> stop event
    deadline = time.time() + 5.0
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before


def test_restore_tree_host_is_sharding_agnostic(tmp_path):
    # restore_tree_host must return plain host numpy arrays without
    # replaying the saved device assignment (a TPU-trained bundle must
    # restore in a CPU process — bench/eval on other hardware)
    from mevi_tpu.train.checkpoints import restore_tree_host
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=1)
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3),
                        "b": jnp.zeros((3,), jnp.int32)}}
    mgr.save("e1", state, metric=0.0)
    out = restore_tree_host(str(tmp_path / "ck" / "e1"))
    assert isinstance(out["params"]["w"], np.ndarray)
    np.testing.assert_array_equal(out["params"]["w"],
                                  np.arange(6.0).reshape(2, 3))
    assert out["params"]["b"].dtype == np.int32
