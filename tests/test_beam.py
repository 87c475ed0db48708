"""Fused beam search vs the exhaustive-scoring oracle (the reference's
own ``_generate_all`` idea, SURVEY.md §4 recommendation (b))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mevi_tpu.decode.beam import nci_beam_search
from mevi_tpu.decode.brute import (all_code_sequences, brute_force_topk,
                                   score_sequences)
from mevi_tpu.models.nci import NCIDims, NCIT5
from mevi_tpu.models.t5 import T5Dims

KARY, M = 3, 2
L = M + 2


@pytest.fixture(scope="module")
def setup():
    t5 = T5Dims(vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_heads=4,
                num_layers=1, num_decoder_layers=1, dropout_rate=0.0)
    dims = NCIDims(t5=t5, kary=KARY, max_output_length=L,
                   adaptor_layer_num=1, adaptor_num_heads=4,
                   adaptor_d_ff=32)
    model = NCIT5(dims)
    rng = np.random.default_rng(3)
    ids = jnp.array(rng.integers(2, 60, size=(3, 6)).astype(np.int32))
    mask = jnp.array((rng.random((3, 6)) < 0.9).astype(np.int32))
    mask = mask.at[:, 0].set(1)
    dec_in = jnp.zeros((3, L), jnp.int32)
    params = NCIT5(dims).init(jax.random.PRNGKey(7), ids, mask,
                              dec_in)["params"]
    return model, params, ids, mask


def test_full_width_beam_enumerates_all(setup):
    model, params, ids, mask = setup
    nb = KARY ** M
    codes, scores, _, _ = nci_beam_search(model, params, ids, mask, nb)
    ref_codes, ref_scores = brute_force_topk(model, params, ids, mask, nb)
    np.testing.assert_allclose(np.array(scores), ref_scores, atol=1e-5)
    assert (np.array(codes) == ref_codes).all()


def test_narrow_beam_top1_is_plausible(setup):
    # beam with width >= K is exact at depth 2 for the top-1 path's first
    # level; just check top-1 of a full-width beam equals oracle top-1 and
    # narrow beam returns valid codes with descending scores.
    model, params, ids, mask = setup
    codes, scores, enc, dec = nci_beam_search(model, params, ids, mask, 2)
    assert codes.shape == (3, 2, M)
    assert (np.array(codes) >= 0).all() and (np.array(codes) < KARY).all()
    s = np.array(scores)
    assert (s[:, 0] >= s[:, 1] - 1e-6).all()
    assert enc.shape[0] == 3 and dec.shape[0] == 6


def test_beam_scores_match_oracle_scores(setup):
    model, params, ids, mask = setup
    nb = 4
    codes, scores, _, _ = nci_beam_search(model, params, ids, mask, nb)
    # rescore the beam's sequences with the oracle scorer: must agree
    for q in range(3):
        seq_scores = np.array(score_sequences(
            model, params, ids[q:q + 1], mask[q:q + 1],
            jnp.array(np.array(codes)[q])))[0]
        np.testing.assert_allclose(np.array(scores)[q], seq_scores,
                                   atol=1e-5)


def test_beams_are_unique(setup):
    model, params, ids, mask = setup
    codes, _, _, _ = nci_beam_search(model, params, ids, mask, 5)
    codes = np.array(codes)
    for q in range(codes.shape[0]):
        seqs = {tuple(c) for c in codes[q]}
        assert len(seqs) == 5


def test_incremental_beam_matches_panel(setup):
    from mevi_tpu.decode.beam import nci_beam_search_incremental
    model, params, ids, mask = setup
    for nb in (2, 5):
        c1, s1, e1, _ = nci_beam_search(model, params, ids, mask, nb)
        c2, s2, e2 = nci_beam_search_incremental(model, params, ids,
                                                 mask, nb)
        assert (np.array(c1) == np.array(c2)).all()
        np.testing.assert_allclose(np.array(s1), np.array(s2), atol=1e-5)
        np.testing.assert_allclose(np.array(e1), np.array(e2), atol=1e-5)


@pytest.fixture(scope="module")
def setup_deep():
    """4-level model: levels 1..2 are table-skippable (M-2 = 2)."""
    KARY4, M4 = 4, 4
    t5 = T5Dims(vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_heads=4,
                num_layers=1, num_decoder_layers=2, dropout_rate=0.0)
    dims = NCIDims(t5=t5, kary=KARY4, max_output_length=M4 + 2,
                   adaptor_layer_num=2, adaptor_num_heads=4,
                   adaptor_d_ff=32)
    model = NCIT5(dims)
    rng = np.random.default_rng(5)
    ids = jnp.array(rng.integers(2, 60, size=(3, 6)).astype(np.int32))
    mask = jnp.ones_like(ids)
    dec_in = jnp.zeros((3, M4 + 2), jnp.int32)
    params = NCIT5(dims).init(jax.random.PRNGKey(11), ids, mask,
                              dec_in)["params"]
    return model, params, ids, mask


def test_pawa_prefix_tables_beam_exact(setup_deep):
    """The prefix-table fast path (net + delta matmul replaced by
    gathers for levels <= M-2) must reproduce the plain incremental
    beam's codes and scores."""
    from mevi_tpu.decode.beam import nci_beam_search_incremental
    from mevi_tpu.models.nci import NCIT5 as N
    model, params, ids, mask = setup_deep
    tables = model.apply({"params": params},
                         method=N.pawa_prefix_tables)
    assert set(tables["T"]) == {1, 2}
    assert tables["T"][2].shape[0] == 4 ** 2
    for nb in (3, 6):
        c1, s1, _ = nci_beam_search_incremental(model, params, ids,
                                                mask, nb)
        c2, s2, _ = nci_beam_search_incremental(
            model, params, ids, mask, nb, pawa_tables=tables)
        assert (np.array(c1) == np.array(c2)).all()
        np.testing.assert_allclose(np.array(s1), np.array(s2),
                                   atol=2e-5)


def test_pawa_prefix_tables_rejects_partial_coverage(setup_deep):
    """kary^(M-2) > max_entries must raise, not silently build tables
    that KeyError (or drop live entries) inside the beam (advisor r4):
    partial prefix coverage is all-or-nothing."""
    from mevi_tpu.models.nci import NCIT5 as N
    model, params, ids, mask = setup_deep
    with pytest.raises(ValueError, match="partial prefix"):
        model.apply({"params": params}, method=N.pawa_prefix_tables,
                    max_entries=4)          # kary=4, M=4 -> 4^2 > 4


def test_pawa_prefix_tables_panel_exact(setup_deep):
    """Tables path vs the panel oracle (independent formulation)."""
    from mevi_tpu.decode.beam import nci_beam_search_incremental
    from mevi_tpu.models.nci import NCIT5 as N
    model, params, ids, mask = setup_deep
    tables = model.apply({"params": params},
                         method=N.pawa_prefix_tables)
    c1, s1, _, _ = nci_beam_search(model, params, ids, mask, 4)
    c2, s2, _ = nci_beam_search_incremental(
        model, params, ids, mask, 4, pawa_tables=tables)
    assert (np.array(c1) == np.array(c2)).all()
    np.testing.assert_allclose(np.array(s1), np.array(s2), atol=2e-5)


@pytest.mark.parametrize("use_pawa,reserve", [(False, False),
                                              (True, True)])
def test_incremental_matches_panel_config_variants(use_pawa, reserve):
    """Panel/incremental identity for the non-default model configs:
    use_pawa=False (no adaptor entries at all) and reserve_decoder=True
    (memory = encoder states + the frozen ori_decoder token,
    nci.py build_memory)."""
    from mevi_tpu.decode.beam import nci_beam_search_incremental
    t5 = T5Dims(vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_heads=4,
                num_layers=1, num_decoder_layers=1, dropout_rate=0.0)
    dims = NCIDims(t5=t5, kary=KARY, max_output_length=L,
                   adaptor_layer_num=1, adaptor_num_heads=4,
                   adaptor_d_ff=32, use_pawa=use_pawa,
                   reserve_decoder=reserve)
    model = NCIT5(dims)
    rng = np.random.default_rng(13)
    ids = jnp.array(rng.integers(2, 60, size=(2, 5)).astype(np.int32))
    mask = jnp.array((rng.random((2, 5)) < 0.9).astype(np.int32))
    mask = mask.at[:, 0].set(1)
    params = NCIT5(dims).init(jax.random.PRNGKey(17), ids, mask,
                              jnp.zeros((2, L), jnp.int32))["params"]
    for nb in (2, 4):
        c1, s1, _, _ = nci_beam_search(model, params, ids, mask, nb)
        c2, s2, _ = nci_beam_search_incremental(model, params, ids,
                                                mask, nb)
        assert (np.array(c1) == np.array(c2)).all()
        np.testing.assert_allclose(np.array(s1), np.array(s2),
                                   atol=1e-5)
