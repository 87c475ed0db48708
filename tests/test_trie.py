"""Trie-constrained beam search (non-RQ hierarchical ids)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mevi_tpu.decode.trie import build_trie, trie_beam_search
from mevi_tpu.models.nci import NCIDims, NCIT5
from mevi_tpu.models.t5 import T5Dims

KARY = 4


def test_build_trie():
    ids = [[0, 1], [0, 2], [3], [0, 1, 2]]
    child, term = build_trie(ids, KARY)
    # root children: 0 and 3
    assert child[0, 0] >= 0 and child[0, 3] >= 0
    assert child[0, 1] == -1
    n01 = child[child[0, 0], 1]
    assert term[n01]                      # [0,1] is a doc id
    assert term[child[0, 3]]              # [3]
    assert term[child[n01, 2]]            # [0,1,2]
    assert not term[child[0, 0]]          # [0] alone is not


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    t5 = T5Dims(vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_heads=4,
                num_layers=1, num_decoder_layers=1, dropout_rate=0.0)
    dims = NCIDims(t5=t5, kary=KARY, max_output_length=5,
                   adaptor_layer_num=1, adaptor_num_heads=4,
                   adaptor_d_ff=32)
    model = NCIT5(dims)
    ids = jnp.asarray(rng.integers(2, 60, (3, 6)).astype(np.int32))
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), ids, mask,
                        jnp.zeros((3, 5), jnp.int32))["params"]
    doc_ids = [[0, 1], [0, 2], [3], [0, 1, 2], [2, 2, 1], [1]]
    child, term = build_trie(doc_ids, KARY)
    return model, params, ids, mask, doc_ids, child, term


def brute_trie_scores(model, params, ids, mask, doc_ids, lp=0.8):
    """Score each id by summed step log-probs over slice∪eos, normalized."""
    from mevi_tpu.models.nci import NCIT5
    out = []
    K = KARY
    for seq in doc_ids:
        toks = jnp.zeros((ids.shape[0], 5), jnp.int32)
        for t, c in enumerate(seq):
            toks = toks.at[:, t + 1].set(c + t * K + 2)
        compact, _, _, _ = model.apply(
            {"params": params}, ids, mask, toks)
        logp = jax.nn.log_softmax(compact.astype(jnp.float32), -1)
        total = 0.0
        for t, c in enumerate(seq):
            total = total + logp[:, t, c]
        total = total + logp[:, len(seq), K]        # eos
        out.append(np.asarray(total) / (len(seq) + 1) ** lp)
    return np.stack(out, axis=1)                    # (b, n_ids)


def test_trie_beam_full_width_matches_brute(setup):
    model, params, ids, mask, doc_ids, child, term = setup
    nb = len(doc_ids)
    codes, lens, scores = trie_beam_search(
        model, params, ids, mask, jnp.asarray(child), jnp.asarray(term),
        num_beams=nb, max_steps=4)
    ref = brute_trie_scores(model, params, ids, mask, doc_ids)
    ref_order = np.argsort(-ref, axis=1, kind="stable")
    for q in range(ids.shape[0]):
        got = [tuple(c for c in row if c >= 0)
               for row in np.asarray(codes)[q]]
        want = [tuple(doc_ids[j]) for j in ref_order[q]]
        assert got == want, (q, got, want)
        np.testing.assert_allclose(np.asarray(scores)[q],
                                   np.sort(ref[q])[::-1], atol=1e-4)


def test_trie_beam_respects_constraints(setup):
    model, params, ids, mask, doc_ids, child, term = setup
    codes, lens, scores = trie_beam_search(
        model, params, ids, mask, jnp.asarray(child), jnp.asarray(term),
        num_beams=3, max_steps=4)
    valid = {tuple(s) for s in map(tuple, doc_ids)}
    for q in range(ids.shape[0]):
        for row in np.asarray(codes)[q]:
            seq = tuple(c for c in row if c >= 0)
            assert seq in valid, seq
