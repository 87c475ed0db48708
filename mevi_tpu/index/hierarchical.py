"""Hierarchical k-means document ids — the non-RQ NCI id space.

The reference consumes a pre-existing docid -> id-string mapping
(``--id_class bert_k30_c30_1``, built by the original NCI repo's
recursive k-means) and only reshapes it into prefix-cluster pickles
(``prepare_clus``, ``dataprocess/msmarco_passage/prepare_origin.py:
12-28``).  Here both halves are first-party:

* :func:`hierarchical_kmeans_ids` builds the ids from embeddings with
  the NCI scheme — recursively split into ``k`` clusters until a node
  holds <= ``c`` docs, then append each doc's position within its leaf —
  using the on-device k-means (``ops/kmeans``),
* :func:`prefix_cluster_docs` mirrors ``prepare_clus``: for a layer
  ``l``, map every id prefix (up to length ``l``) to the docs below it,
  with docs whose FULL id is a strict prefix of the key appended last
  (the reference's "complement" step),
* the ids feed :func:`mevi_tpu.decode.trie.build_trie` directly.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np


def hierarchical_kmeans_ids(emb: np.ndarray, k: int = 30, c: int = 30,
                            seed: int = 42, iters: int = 10,
                            ) -> List[List[int]]:
    """Variable-length hierarchical ids (NCI ``k{k}_c{c}`` scheme).

    Returns per-doc code lists; codes are in [0, max(k, c)).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.kmeans import kmeans_fit

    n = len(emb)
    ids: List[List[int]] = [[] for _ in range(n)]
    key = jax.random.PRNGKey(seed)
    stack: List[Tuple[np.ndarray, List[int]]] = [
        (np.arange(n, dtype=np.int64), [])]
    while stack:
        rows, prefix = stack.pop()
        if len(rows) <= c:
            for pos, r in enumerate(rows):
                ids[int(r)] = prefix + [pos]
            continue
        key, sub = jax.random.split(key)
        x = jnp.asarray(np.asarray(emb[rows], np.float32))
        centroids, assign = kmeans_fit(x, k, iters=iters, key=sub)
        assign = np.asarray(assign)
        for ci in range(k):
            members = rows[assign == ci]
            if len(members) == 0:
                continue
            stack.append((members, prefix + [ci]))
    return ids


def prefix_cluster_docs(ids: Sequence[Sequence[int]], layer: int,
                        ) -> Dict[Tuple[int, ...], List[int]]:
    """``prepare_clus`` semantics (``prepare_origin.py:12-28``) for one
    layer: every prefix key (length <= layer) maps to the docs whose id
    starts with it; a doc whose FULL id equals a strict prefix of
    another key is appended to that key's list."""
    full: Dict[Tuple[int, ...], int] = {}
    cluster: Dict[Tuple[int, ...], List[int]] = defaultdict(list)
    for d, seq in enumerate(ids):
        key = tuple(seq)[:layer]
        cluster[key].append(d)
        full[tuple(seq)] = d
    out: Dict[Tuple[int, ...], List[int]] = defaultdict(list)
    for key, docs in cluster.items():
        for j in range(1, len(key) + 1):
            out[key[:j]].extend(docs)
            if j != len(key) and key[:j] in full:
                out[key].append(full[key[:j]])
    for key, docs in out.items():
        assert len(set(docs)) == len(docs), key
    return dict(out)


def ids_to_padded(ids: Sequence[Sequence[int]],
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """(codes (n, max_len) int32 padded with -1, lengths (n,))."""
    n = len(ids)
    lens = np.asarray([len(s) for s in ids], np.int32)
    out = np.full((n, int(lens.max())), -1, np.int32)
    for i, s in enumerate(ids):
        out[i, :len(s)] = s
    return out, lens


def save_hier_artifacts(output_dir: str, ids: Sequence[Sequence[int]],
                        layers: Sequence[int], kary: int) -> None:
    """Write the reference-shaped pickles + the trie tables."""
    import os
    import os.path as osp
    import pickle

    from ..decode.trie import build_trie

    os.makedirs(output_dir, exist_ok=True)
    codes, lens = ids_to_padded(ids)
    np.save(osp.join(output_dir, "hier_codes.npy"), codes)
    np.save(osp.join(output_dir, "hier_lengths.npy"), lens)
    child, terminal = build_trie(ids, kary)
    np.savez(osp.join(output_dir, "hier_trie.npz"), child=child,
             terminal=terminal)
    for layer in layers:
        mapping = prefix_cluster_docs(ids, layer)
        with open(osp.join(output_dir,
                           f"doc_cluster_layer{layer}.pkl"), "wb") as fw:
            pickle.dump({k: [str(d) for d in v]
                         for k, v in mapping.items()}, fw)
