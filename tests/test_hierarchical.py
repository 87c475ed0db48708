"""Hierarchical k-means ids + prefix clusters + trie wiring
(the non-RQ NCI id space; reference consumed an external mapping and
only reshaped it — prepare_origin.py:12-28)."""

import json
import pickle

import numpy as np

from mevi_tpu.decode.trie import build_trie
from mevi_tpu.index.hierarchical import (hierarchical_kmeans_ids,
                                         ids_to_padded,
                                         prefix_cluster_docs)


def test_ids_cover_all_docs_and_are_unique(rng):
    emb = rng.normal(size=(200, 8)).astype(np.float32)
    ids = hierarchical_kmeans_ids(emb, k=4, c=5, iters=4)
    assert len(ids) == 200
    assert all(len(s) >= 1 for s in ids)
    assert len({tuple(s) for s in ids}) == 200   # ids are unique
    # leaf positions < c, internal codes < k
    for s in ids:
        assert all(0 <= x < 5 for x in s)


def test_prefix_clusters_match_bruteforce(rng):
    ids = [[0, 1], [0, 2], [0, 1, 3], [1], [1, 0]]
    m = prefix_cluster_docs(ids, layer=2)
    # prefix (0,): docs whose first-2 prefix starts with 0
    assert sorted(m[(0,)]) == [0, 1, 2]
    # (0, 1): docs with that 2-prefix; doc 0's FULL id == (0,1) is a
    # strict prefix of (0,1,...) keys -> complement adds it to itself? no:
    # doc 0 and doc 2 share the 2-prefix (0, 1)
    assert sorted(m[(0, 1)]) == [0, 2]
    # (1,): docs 3 and 4; doc 3's full id (1,) is the key itself
    assert sorted(m[(1,)]) == [3, 4]


def test_complement_adds_prefix_terminal_doc():
    # doc 0's full id (0,) is a strict prefix of key (0, 1): the
    # reference appends it to that key's list (prepare_origin.py:23-24)
    ids = [[0], [0, 1, 2], [0, 1, 3]]
    m = prefix_cluster_docs(ids, layer=2)
    assert m[(0,)] == [0, 1, 2]
    # reference order: the complement doc is appended at shallower j,
    # BEFORE the j == len(k) extend (prepare_origin.py:20-24)
    assert m[(0, 1)] == [0, 1, 2]


def test_trie_from_hier_ids(rng):
    emb = rng.normal(size=(64, 8)).astype(np.float32)
    ids = hierarchical_kmeans_ids(emb, k=3, c=4, iters=3)
    kary = 4
    child, terminal = build_trie(ids, kary)
    # every id walks the trie to a terminal node
    for seq in ids:
        node = 0
        for code in seq:
            node = int(child[node, code])
            assert node >= 0
        assert terminal[node]
    codes, lens = ids_to_padded(ids)
    assert codes.shape[0] == 64
    assert (lens >= 1).all()


def test_build_hier_cli(tmp_path, rng):
    from mevi_tpu.cli.main import main
    from mevi_tpu.data import io
    emb = rng.normal(size=(80, 16)).astype(np.float32)
    ep = str(tmp_path / "emb.bin")
    io.write_embedding_memmap(ep, emb)
    cfgp = str(tmp_path / "cfg.json")
    from mevi_tpu.config import EncoderConfig, MEVIConfig, RQConfig
    cfg = MEVIConfig(rq=RQConfig(subvector_num=2, subvector_bits=2,
                                 emb_size=16),
                     encoder=EncoderConfig(d_model=16))
    with open(cfgp, "w") as fw:
        fw.write(cfg.finalize().to_json())
    out = str(tmp_path / "hier")
    main(["build-hier", "--config", cfgp, "--embeddings", ep,
          "--output_dir", out, "--k", "3", "--c", "4",
          "--layers", "1,2", "--iters", "3"])
    import os.path as osp
    assert osp.exists(osp.join(out, "hier_trie.npz"))
    with open(osp.join(out, "doc_cluster_layer2.pkl"), "rb") as fr:
        m = pickle.load(fr)
    all_docs = {d for v in m.values() for d in v}
    assert len(all_docs) == 80          # every doc reachable
    trie = np.load(osp.join(out, "hier_trie.npz"))
    assert trie["child"].shape[1] == 4
