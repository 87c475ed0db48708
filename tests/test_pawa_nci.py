"""PAWA adaptor parity vs torch nn.TransformerDecoder, and NCI logits
composition parity vs a literal transcription of the reference head math
(``modeling_t5.py:1647-1689``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mevi_tpu.models import convert
from mevi_tpu.models.nci import (NCIDims, NCIT5, codes_to_tokens,
                                 compact_labels, compact_to_full_logits,
                                 make_labels, tokens_to_codes)
from mevi_tpu.models.pawa import PawaAdaptor, PawaDims
from mevi_tpu.models.t5 import T5Dims

D = 16
PDIMS = PawaDims(d_model=D, num_heads=4, d_ff=32, num_layers=2,
                 dropout_rate=0.0)


def make_torch_decoder():
    torch.manual_seed(1)
    layer = torch.nn.TransformerDecoderLayer(
        d_model=D, nhead=4, dim_feedforward=32, dropout=0.0)
    return torch.nn.TransformerDecoder(layer, num_layers=2).eval()


def test_pawa_matches_torch_transformer_decoder(rng):
    dec = make_torch_decoder()
    sd = convert.hf_module_state_dict(dec)
    params = convert.convert_pawa(sd, 2)
    mem = rng.normal(size=(1, 1, D)).astype(np.float32)
    params["memory_embedding"] = mem

    tgt = rng.normal(size=(3, 5, D)).astype(np.float32)
    L = 5
    causal = torch.triu(torch.ones(L, L) * float("-inf"), diagonal=1)
    with torch.no_grad():
        # torch is seq-first: (L, B, D); memory broadcast to (1, B, D)
        t_tgt = torch.tensor(tgt).transpose(0, 1)
        t_mem = torch.tensor(np.broadcast_to(mem, (3, 1, D)).copy()
                             ).transpose(0, 1)
        ref = dec(t_tgt, t_mem, tgt_mask=causal).transpose(0, 1).numpy()

    model = PawaAdaptor(PDIMS)
    ours = model.apply({"params": params}, jnp.array(tgt))
    np.testing.assert_allclose(np.array(ours), ref, atol=3e-5)


def np_reference_head(seq, h_a, A_kernel, W, kary, L):
    """modeling_t5.py:1647-1689 in numpy: full-vocab logits with the
    position-validity mask applied."""
    B = seq.shape[0]
    V = W.shape[0]
    d = seq.shape[-1]
    # adaptor_weight[b,l,dd,v] = sum_i h_a[b,l,i] * A_kernel[i, dd*V + v]
    aw = (h_a.reshape(-1, d) @ A_kernel).reshape(B, L, d, V)
    head = aw + W.T[None, None]
    logits = np.einsum("bld,bldv->blv", seq, head)
    # select_valid_embedding: position t allows slice(t) ∪ {eos}
    mask = np.full((L, V), -1e9, np.float32)
    for t in range(L):
        mask[t, 2 + t * kary: 2 + (t + 1) * kary] = 0.0
        mask[t, 1] = 0.0
    return logits + mask[None]


def test_nci_compact_logits_match_reference_composition(rng):
    kary, M = 4, 3
    L = M + 2
    t5 = T5Dims(vocab_size=48, d_model=D, d_kv=4, d_ff=32, num_heads=4,
                num_layers=1, num_decoder_layers=1, dropout_rate=0.0)
    dims = NCIDims(t5=t5, kary=kary, max_output_length=L,
                   adaptor_layer_num=2, adaptor_num_heads=4,
                   adaptor_d_ff=32)
    model = NCIT5(dims)
    ids = jnp.array(rng.integers(2, 40, size=(2, 7)).astype(np.int32))
    mask = jnp.ones_like(ids)
    codes = rng.integers(0, kary, size=(2, M)).astype(np.int32)
    labels, dec_in = make_labels(jnp.array(codes), kary, L)
    params = model.init(jax.random.PRNGKey(0), ids, mask, dec_in)["params"]

    compact, enc_h, dec_h, _ = model.apply(
        {"params": params}, ids, mask, dec_in)

    # reference composition from the same intermediates
    seq = np.array(dec_h) * (D ** -0.5)
    dec_embeds = np.array(params["decode_embeddings"]["embedding"])[
        np.array(dec_in)]
    pawa_out = PawaAdaptor(dims.pawa_dims()).apply(
        {"params": params["pawa"]}, jnp.array(dec_embeds))
    W = np.array(params["decode_embeddings"]["embedding"])
    A = np.array(params["adaptor_kernel"])
    ref_full = np_reference_head(seq, np.array(pawa_out), A, W, kary, L)
    # last position: EOS only (the __init__ logit_mask row, line 1306)
    ref_full[:, L - 1, 2:] = -1e9

    ours_full = np.array(compact_to_full_logits(compact, dims))
    # compare on the valid sets only (fill values differ by construction)
    valid = ref_full > -1e8
    assert (valid == (ours_full > -1e8)).all()
    np.testing.assert_allclose(ours_full[valid], ref_full[valid],
                               atol=3e-4)


def test_code_token_roundtrip():
    codes = jnp.array([[0, 3, 1], [2, 2, 0]], jnp.int32)
    toks = codes_to_tokens(codes, kary=4)
    assert toks.tolist() == [[2, 9, 11], [4, 8, 10]]
    back = tokens_to_codes(toks, kary=4)
    assert (np.array(back) == np.array(codes)).all()


def test_make_labels_layout():
    codes = jnp.array([[1, 2]], jnp.int32)
    labels, dec_in = make_labels(codes, kary=4, max_output_length=4)
    assert labels.tolist() == [[3, 8, 1, 0]]
    assert dec_in.tolist() == [[0, 3, 8, 1]]
    comp = compact_labels(codes, NCIDims(kary=4, max_output_length=4))
    assert comp.tolist() == [[1, 2, 4, -100]]


def test_convert_nci_checkpoint_assembles_reference_dict(rng):
    """The full reference NCI lightning checkpoint (T5 + decode
    embeddings + PAWA TransformerDecoder + adaptor linear) converts into
    a params tree NCIT5 accepts, with the pieces wired to the right
    modules (``try_load_ckpt``'s source layout, ``MEVI/main.py:191-249``)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax
    import jax.numpy as jnp
    from mevi_tpu.models.nci import NCIDims, NCIT5
    from mevi_tpu.models.t5 import T5Dims

    D, H, FF, KARY, L = 16, 2, 32, 4, 4
    V = KARY * L + 2
    t5cfg = transformers.T5Config(
        vocab_size=64, d_model=D, d_kv=D // H, d_ff=FF, num_heads=H,
        num_layers=1, num_decoder_layers=1, dropout_rate=0.0,
        feed_forward_proj="relu")
    torch.manual_seed(0)
    hf = transformers.T5Model(t5cfg).eval()
    sd = {k: v for k, v in hf.state_dict().items()}

    dec_layer = torch.nn.TransformerDecoderLayer(
        d_model=D, nhead=H, dim_feedforward=FF, batch_first=True)
    adaptor = torch.nn.TransformerDecoder(dec_layer, num_layers=1).eval()
    for k, v in adaptor.state_dict().items():
        sd[f"adaptor.{k}"] = v
    sd["decode_embeddings.weight"] = torch.randn(V, D)
    sd["adaptor_linear.weight"] = torch.randn(D * V, D)
    sd["adaptor_embeddings"] = torch.randn(1, D)
    sd = {k: v.detach().numpy() for k, v in sd.items()}

    params = convert.convert_nci_checkpoint(sd, 1, 1, adaptor_layers=1)
    np.testing.assert_allclose(params["adaptor_kernel"],
                               sd["adaptor_linear.weight"].T)
    np.testing.assert_allclose(
        params["pawa"]["memory_embedding"].reshape(-1),
        sd["adaptor_embeddings"].reshape(-1))
    np.testing.assert_allclose(params["decode_embeddings"]["embedding"],
                               sd["decode_embeddings.weight"])

    dims = NCIDims(t5=T5Dims(vocab_size=64, d_model=D, d_kv=D // H,
                             d_ff=FF, num_heads=H, num_layers=1,
                             num_decoder_layers=1, dropout_rate=0.0),
                   kary=KARY, max_output_length=L, adaptor_layer_num=1,
                   adaptor_num_heads=H, adaptor_d_ff=FF)
    model = NCIT5(dims)
    ref = model.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 6), jnp.int32),
                     jnp.ones((1, 6), jnp.int32),
                     jnp.zeros((1, L), jnp.int32))["params"]
    # identical tree structure (same leaves, same shapes)
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, params)
    assert jax.tree_util.tree_structure(ref_shapes) == \
        jax.tree_util.tree_structure(got_shapes)
    assert jax.tree.leaves(ref_shapes) == jax.tree.leaves(got_shapes)

    logits, _, _, _ = model.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.ones((2, 6), jnp.int32), jnp.ones((2, 6), jnp.int32),
        jnp.zeros((2, L), jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()
