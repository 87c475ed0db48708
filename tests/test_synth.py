"""Shared synthetic corpus + query language (data/synth.py)."""

import numpy as np

import jax.numpy as jnp

from mevi_tpu.data import synth


def tiny_spec(**kw):
    base = dict(ndoc=2000, d=32, kary=8, levels=3, pool_n=64,
                scales=(1.0, 0.4, 0.2), zipf=(1.0, 0.6, 0.3),
                eps=0.05, seed=3, qlen=16, n_filler_vocab=32)
    base.update(kw)
    return synth.SynthSpec(**base)


def test_spec_derivations():
    spec = tiny_spec()
    # pool_n = 64 = 8^2 -> 2 digits; info = 3 hierarchy + 2 digits
    assert spec.n_info == 5
    assert spec.vocab_size % 128 == 0
    assert spec.vocab_size >= 2 + 5 * 8 + 32
    assert tiny_spec().cache_dir() == spec.cache_dir()
    assert tiny_spec(seed=4).cache_dir() != spec.cache_dir()


def test_corpus_deterministic_and_unit_norm():
    spec = tiny_spec()
    ctrs, pool = synth.make_tables(spec)
    draws = synth.make_draws(spec)
    assert draws.shape == (spec.ndoc, 4)
    assert draws[:, 3].max() < spec.pool_n
    tables = (jnp.asarray(ctrs), jnp.asarray(pool))
    rows = np.asarray(synth.gen_rows(tables, jnp.asarray(draws[:100])))
    np.testing.assert_allclose(np.linalg.norm(rows, axis=1), 1.0,
                               rtol=1e-5)
    # same spec -> identical corpus
    d2 = synth.make_draws(tiny_spec())
    np.testing.assert_array_equal(draws, d2)


def test_query_tokens_information_complete():
    """The info tokens alone reconstruct (h1, h2, h3, row) — the query
    fully determines the document's embedding, hence its RQ code."""
    spec = tiny_spec()
    draws = synth.make_draws(spec)
    rng = np.random.default_rng(0)
    tok = synth.query_tokens(spec, draws[:50], rng)
    assert tok.shape == (50, spec.qlen)
    assert tok.min() >= 2 and tok.max() < spec.vocab_size
    pos = synth.info_positions(spec)
    vals = np.stack([tok[:, p] - 2 - j * spec.kary
                     for j, p in enumerate(pos)])
    assert (vals >= 0).all() and (vals < spec.kary).all()
    h = vals[:3]
    row = sum(vals[3 + i] * spec.kary ** i
              for i in range(spec._row_digits))
    np.testing.assert_array_equal(h.T, draws[:50, :3])
    np.testing.assert_array_equal(row, draws[:50, 3])
    # fresh fillers per call, same info
    tok2 = synth.query_tokens(spec, draws[:50],
                              np.random.default_rng(1))
    fill = np.ones(spec.qlen, bool)
    fill[pos] = False
    assert (tok2[:, pos] == tok[:, pos]).all()
    assert (tok2[:, fill] != tok[:, fill]).any()


def test_rq_fit_cache_and_sorted_fill(tmp_path):
    spec = tiny_spec()
    ctrs, pool = synth.make_tables(spec)
    tables = (jnp.asarray(ctrs), jnp.asarray(pool))
    draws = synth.make_draws(spec)
    cbs, codes = synth.fit_rq_codes(spec, tables, draws,
                                    cache_base=str(tmp_path),
                                    fit_sample=1000, iters=3)
    assert cbs.shape == (spec.levels, spec.kary, spec.d)
    assert codes.shape == (spec.ndoc, spec.levels)
    # cache hit returns identical arrays
    cbs2, codes2 = synth.fit_rq_codes(spec, tables, draws,
                                      cache_base=str(tmp_path))
    np.testing.assert_array_equal(codes, codes2)

    from mevi_tpu.utils.native import build_csr
    offsets, doc_ids = build_csr(codes, spec.kary)
    buf = synth.fill_sorted_matrix(spec, tables, draws, doc_ids,
                                   n_pad_rows=8, dtype=jnp.float32)
    want = np.asarray(synth.gen_rows(
        tables, jnp.asarray(draws[doc_ids[:64]])))
    np.testing.assert_allclose(np.asarray(buf[:64]), want, rtol=1e-5)
    assert (np.asarray(buf[spec.ndoc:]) == 0).all()

    # int8 variant
    buf8 = synth.fill_sorted_matrix(spec, tables, draws, doc_ids,
                                    n_pad_rows=8, dtype=jnp.int8,
                                    q_scale=126.0)
    got = np.asarray(buf8[:64]).astype(np.float32)
    np.testing.assert_allclose(got, np.round(want * 126.0), atol=1.0)


def test_fit_rq_codes_with_fixed_codebooks(tmp_path):
    """Serving a bundle over a larger corpus: assignment with the
    TRAINING codebooks (no refit) must agree with direct assignment."""
    import jax.numpy as jnp
    from mevi_tpu.ops import rq as rq_ops
    spec = tiny_spec()
    ctrs, pool = synth.make_tables(spec)
    tables = (jnp.asarray(ctrs), jnp.asarray(pool))
    draws = synth.make_draws(spec)
    cbs, codes = synth.fit_rq_codes(spec, tables, draws,
                                    cache_base=str(tmp_path / "a"),
                                    fit_sample=500, iters=2)
    import dataclasses
    big = dataclasses.replace(spec, ndoc=spec.ndoc * 2)
    draws_big = synth.make_draws(big)
    cbs2, codes_big = synth.fit_rq_codes(
        big, tables, draws_big, cache_base=str(tmp_path / "b"),
        codebooks=cbs)
    np.testing.assert_allclose(cbs2, cbs, rtol=1e-6)
    want = np.asarray(rq_ops.assign(
        synth.gen_rows(tables, jnp.asarray(draws_big[:500])),
        jnp.asarray(cbs), "rq", "l2"))
    np.testing.assert_array_equal(codes_big[:500], want)
