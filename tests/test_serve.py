"""Fused serving pipeline vs the individual stages; sharded vs single."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mevi_tpu import serve
from mevi_tpu.decode.beam import nci_beam_search
from mevi_tpu.eval.searcher import FineIndex, build_fine_index, fine_rerank
from mevi_tpu.models.nci import NCIDims, NCIT5
from mevi_tpu.models.t5 import T5Dims, T5Model
from mevi_tpu.parallel.mesh import make_mesh, shard_rows

KARY, M = 4, 2


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    t5 = T5Dims(vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_heads=4,
                num_layers=1, num_decoder_layers=1, dropout_rate=0.0)
    dims = NCIDims(t5=t5, kary=KARY, max_output_length=M + 2,
                   adaptor_layer_num=1, adaptor_num_heads=4,
                   adaptor_d_ff=32)
    nci = NCIT5(dims)
    qtower = T5Model(t5)
    ids = jnp.asarray(rng.integers(2, 60, size=(8, 6)).astype(np.int32))
    mask = jnp.ones_like(ids)
    nci_params = nci.init(jax.random.PRNGKey(0), ids, mask,
                          jnp.zeros((8, M + 2), jnp.int32))["params"]
    q_params = qtower.init(jax.random.PRNGKey(1), ids, mask,
                           jnp.zeros((8, 1), jnp.int32))["params"]
    emb = rng.normal(size=(256, 16)).astype(np.float32)
    codes = rng.integers(0, KARY, size=(256, M)).astype(np.int32)
    fine = build_fine_index(codes, emb, KARY)
    return nci, qtower, nci_params, q_params, ids, mask, fine


def test_fused_matches_stages(setup):
    nci, qtower, nci_params, q_params, ids, mask, fine = setup
    s, i, codes, bscores = serve.serve_batch(
        qtower, nci, q_params, nci_params, ids, mask,
        fine.offsets, fine.doc_ids, fine.sorted_emb,
        num_beams=3, cap=32, pool=20)
    # stages
    qemb = qtower.apply({"params": q_params}, ids, mask,
                        method=T5Model.first_token_rep)
    codes2, bscores2, _, _ = nci_beam_search(nci, nci_params, ids, mask,
                                             3)
    s2, i2, _ = fine_rerank(qemb, codes2, fine.offsets, fine.doc_ids,
                            fine.sorted_emb, KARY, 32, 20)
    assert (np.asarray(codes) == np.asarray(codes2)).all()
    np.testing.assert_allclose(np.asarray(s), np.asarray(s2), atol=1e-4)
    assert (np.asarray(i) == np.asarray(i2)).all()


def test_sharded_server_matches_fused(setup, mesh8):
    nci, qtower, nci_params, q_params, ids, mask, fine = setup
    s1, i1, c1, b1 = serve.serve_batch(
        qtower, nci, q_params, nci_params, ids, mask,
        fine.offsets, fine.doc_ids, fine.sorted_emb,
        num_beams=3, cap=32, pool=20)
    server = serve.make_sharded_server(qtower, nci, mesh8, num_beams=3,
                                       cap=32, pool=20)
    semb = shard_rows(np.asarray(fine.sorted_emb), mesh8)
    s2, i2, c2, b2 = server(q_params, nci_params, ids, mask,
                            fine.offsets, fine.doc_ids, semb)
    assert (np.asarray(c1) == np.asarray(c2)).all()
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-4)
    valid = np.asarray(i1) >= 0
    assert (np.asarray(i1) == np.asarray(i2))[valid].all()


def test_pallas_server_matches_fused(setup):
    nci, qtower, nci_params, q_params, ids, mask, fine = setup
    s1, i1, c1, b1 = serve.serve_batch(
        qtower, nci, q_params, nci_params, ids, mask,
        fine.offsets, fine.doc_ids, fine.sorted_emb,
        num_beams=3, cap=32, pool=20)
    server = serve.PallasServer(qtower, nci, q_params, nci_params, fine,
                                num_beams=3, cap=32, pool=20)
    s2, i2, c2, b2, ndoc = server.query(ids, mask)
    assert (np.asarray(c1) == c2).all()
    np.testing.assert_allclose(np.asarray(b1), b2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1), s2, atol=1e-3)
    valid = np.asarray(i1) >= 0
    assert (np.asarray(i1) == i2)[valid].all()
    assert (i2[~valid] == -1).all()
    assert (ndoc >= 0).all()


def test_pallas_server_beam_major_matches_fused(setup):
    """rank_mode='beam_major' pools identically in the fused one-jit
    server and the Pallas three-dispatch server."""
    nci, qtower, nci_params, q_params, ids, mask, fine = setup
    s1, i1, c1, b1 = serve.serve_batch(
        qtower, nci, q_params, nci_params, ids, mask,
        fine.offsets, fine.doc_ids, fine.sorted_emb,
        num_beams=3, cap=32, pool=20, rank="beam_major")
    server = serve.PallasServer(qtower, nci, q_params, nci_params, fine,
                                num_beams=3, cap=32, pool=20,
                                rank_mode="beam_major")
    s2, i2, c2, b2, ndoc = server.query(ids, mask)
    assert (np.asarray(c1) == c2).all()
    np.testing.assert_allclose(np.asarray(s1), s2, atol=1e-3)
    valid = np.asarray(i1) >= 0
    assert (np.asarray(i1) == i2)[valid].all()


def test_pallas_server_coarse_stage_signature(setup):
    """bench.py's stage-split calls ``server._coarse`` directly with
    every positional member attribute; a signature drift there crashed
    the whole round-4 bench ladder (every child rc=1).  Lock the
    contract: the call bench.py makes must work and agree with
    ``query``'s cidx."""
    nci, qtower, nci_params, q_params, ids, mask, fine = setup
    server = serve.PallasServer(qtower, nci, q_params, nci_params, fine,
                                num_beams=3, cap=32, pool=20)
    qemb, codes, scores, cidx, q_rep = server._coarse(
        server.q_params, server.nci_params, ids, mask,
        server.level_tables, server.pawa_tables)
    assert cidx.ndim == 1 and q_rep.shape[0] == cidx.shape[0]
    assert codes.shape[:2] == (ids.shape[0], 3)


def test_pallas_server_int8_corpus(setup, rng):
    """int8 index + folded dequant: same top docs, calibrated scores."""
    from mevi_tpu.index.build import quantize_int8
    nci, qtower, nci_params, q_params, ids, mask, fine = setup
    server_f = serve.PallasServer(qtower, nci, q_params, nci_params,
                                  fine, num_beams=3, cap=32, pool=20)
    sf, idf, _, _, _ = server_f.query(ids, mask)

    emb_q, scale = quantize_int8(np.asarray(fine.sorted_emb))
    fine_q = fine._replace(sorted_emb=jnp.asarray(emb_q))
    server_q = serve.PallasServer(qtower, nci, q_params, nci_params,
                                  fine_q, num_beams=3, cap=32, pool=20,
                                  inv_scale=1.0 / scale)
    sq, idq, _, _, _ = server_q.query(ids, mask)
    valid = idf >= 0
    # top docs agree and dequantized scores are calibrated
    assert (idf[:, 0] == idq[:, 0]).mean() >= 0.75
    np.testing.assert_allclose(sq[valid], sf[valid], rtol=0.1, atol=0.05)


def test_sharded_server_int8_corpus(setup, mesh8, rng):
    """The NQ-scale serving mode: int8 corpus row-sharded over the
    corpus axis — ranking must match the float sharded server."""
    from mevi_tpu.index.build import quantize_int8
    nci, qtower, nci_params, q_params, ids, mask, fine = setup
    server = serve.make_sharded_server(qtower, nci, mesh8, num_beams=3,
                                       cap=32, pool=20)
    semb_f = shard_rows(np.asarray(fine.sorted_emb), mesh8)
    s1, i1, c1, _ = server(q_params, nci_params, ids, mask,
                           fine.offsets, fine.doc_ids, semb_f)
    emb_q, _ = quantize_int8(np.asarray(fine.sorted_emb))
    semb_q = shard_rows(emb_q, mesh8)
    s2, i2, c2, _ = server(q_params, nci_params, ids, mask,
                           fine.offsets, fine.doc_ids, semb_q)
    assert (np.asarray(c1) == np.asarray(c2)).all()
    i1h, i2h = np.asarray(i1), np.asarray(i2)
    overlap = np.mean([
        len(set(i1h[b][i1h[b] >= 0]) & set(i2h[b][i2h[b] >= 0]))
        / max((i1h[b] >= 0).sum(), 1) for b in range(i1h.shape[0])])
    assert overlap >= 0.85, overlap
