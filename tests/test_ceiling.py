"""Data-ceiling bounds (mevi_tpu/eval/ceiling.py) on tiny synth specs."""

import numpy as np
import pytest

from mevi_tpu.data import synth
from mevi_tpu.eval import ceiling as C


def _spec(dropout):
    return synth.SynthSpec(ndoc=400, d=24, kary=4, levels=3, pool_n=16,
                           scales=(1.0, 0.4, 0.2), zipf=(1.0, 0.6, 0.3),
                           eps=0.05, seed=3, qlen=12, n_filler_vocab=32,
                           info_dropout=dropout)


def test_observed_info_roundtrip_clean():
    spec = _spec(0.0)
    draws = synth.make_draws(spec)
    rng = np.random.default_rng(0)
    gt = rng.integers(0, spec.ndoc, 64)
    tok = synth.query_tokens(spec, draws[gt], rng)
    obs = C.observed_info(spec, tok)
    assert (obs >= 0).all()
    np.testing.assert_array_equal(obs, C.doc_attrs(spec, draws)[gt])


def test_observed_info_marks_dropout():
    spec = _spec(0.5)
    draws = synth.make_draws(spec)
    rng = np.random.default_rng(1)
    gt = rng.integers(0, spec.ndoc, 256)
    tok = synth.query_tokens(spec, draws[gt], rng)
    obs = C.observed_info(spec, tok)
    frac = (obs < 0).mean()
    assert 0.4 < frac < 0.6           # ~info_dropout
    attrs = C.doc_attrs(spec, draws)[gt]
    ok = obs >= 0
    np.testing.assert_array_equal(obs[ok], attrs[ok])


def test_bayes_bounds_clean_vs_noisy():
    spec = _spec(0.0)
    import jax.numpy as jnp
    tab = synth.make_tables(spec)
    tables = (jnp.asarray(tab[0]), jnp.asarray(tab[1]))
    draws = synth.make_draws(spec)
    _, codes = synth.fit_rq_codes(spec, tables, draws, iters=2)
    rng = np.random.default_rng(2)
    gt = rng.integers(0, spec.ndoc, 128)
    tok = synth.query_tokens(spec, draws[gt], rng)
    b = C.bayes_bounds(spec, draws, codes, tok, gt)
    # clean queries: |C| = docs sharing EXACT draws (dup collisions at
    # this tiny geometry), recall@100 must be 1 and hit@10 ~1
    assert b["bayes_recall@100"] == 1.0
    assert b["p_all_observed"] == 1.0
    assert b["bayes_recall@1"] <= 1.0
    # noisy queries: bounds strictly ordered and below clean
    spec_n = _spec(0.4)
    tok_n = synth.query_tokens(spec_n, draws[gt],
                               np.random.default_rng(3))
    bn = C.bayes_bounds(spec_n, draws, codes, tok_n, gt)
    assert bn["bayes_recall@1"] <= bn["bayes_recall@10"] \
        <= bn["bayes_recall@100"] <= 1.0
    assert bn["bayes_recall@1"] < b["bayes_recall@1"] + 1e-9
    assert bn["mean_candidates"] > b["mean_candidates"]
    assert 0.0 < bn["bayes_mrr@10"] <= bn["bayes_recall@10"]
    assert bn["bayes_coarse_hit@10"] <= 1.0


def test_oracle_tower_clean_is_exact_doc_embedding():
    spec = _spec(0.0)
    tab = synth.make_tables(spec)
    draws = synth.make_draws(spec)
    rng = np.random.default_rng(4)
    gt = rng.integers(0, spec.ndoc, 64)
    tok = synth.query_tokens(spec, draws[gt], rng)
    obs = C.observed_info(spec, tok)
    q = C.oracle_tower_embeddings(spec, tab, obs)
    import jax.numpy as jnp
    d = np.asarray(synth.gen_rows(
        (jnp.asarray(tab[0]), jnp.asarray(tab[1])), jnp.asarray(draws[gt])))
    # q is the UNnormalized sum; direction must match the doc embedding
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    np.testing.assert_allclose(qn, d, atol=1e-5)


def test_ceiling_report_end_to_end():
    spec = _spec(0.25)
    import jax.numpy as jnp
    tab = synth.make_tables(spec)
    tables = (jnp.asarray(tab[0]), jnp.asarray(tab[1]))
    draws = synth.make_draws(spec)
    _, codes = synth.fit_rq_codes(spec, tables, draws, iters=2)
    rng = np.random.default_rng(5)
    gt = rng.integers(0, spec.ndoc, 96)
    tok = synth.query_tokens(spec, draws[gt], rng)
    rep = C.ceiling_report(spec, tab, draws, codes, tok, gt)
    for k in ("bayes_recall@100", "bayes_mrr@10", "bayes_coarse_hit@10",
              "oracle_tower_recall@100", "oracle_tower_mrr@10"):
        assert k in rep, k
        assert 0.0 <= rep[k] <= 1.0
    # the single-vector oracle cannot (statistically) beat Bayes; allow
    # small-sample slack
    assert rep["oracle_tower_recall@100"] <= rep["bayes_recall@100"] + 0.05
