"""Numerical parity of the flax T5 vs HF torch T5 (random small weights).

This is the converter-fidelity test (SURVEY.md §7.3 hard part 3): if a
random-weight HF T5Model converts losslessly, real T5-ANCE checkpoints do
too.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mevi_tpu.models import convert
from mevi_tpu.models.t5 import T5Dims, T5Model

DIMS = dict(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_heads=4,
            num_layers=2, num_decoder_layers=2)


@pytest.fixture(scope="module")
def pair():
    cfg = transformers.T5Config(
        vocab_size=DIMS["vocab_size"], d_model=DIMS["d_model"],
        d_kv=DIMS["d_kv"], d_ff=DIMS["d_ff"], num_heads=DIMS["num_heads"],
        num_layers=DIMS["num_layers"],
        num_decoder_layers=DIMS["num_decoder_layers"],
        dropout_rate=0.0, feed_forward_proj="relu")
    torch.manual_seed(0)
    hf = transformers.T5Model(cfg).eval()
    sd = convert.hf_module_state_dict(hf)
    params = convert.convert_t5_model(sd, DIMS["num_layers"],
                                      DIMS["num_decoder_layers"])
    dims = T5Dims(dropout_rate=0.0, **DIMS)
    model = T5Model(dims)
    return hf, model, {"params": params}


def test_encoder_parity(pair, rng):
    hf, model, variables = pair
    ids = rng.integers(2, 100, size=(3, 11)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[:, 8:] = 0
    with torch.no_grad():
        ref = hf.encoder(input_ids=torch.tensor(ids.astype(np.int64)),
                         attention_mask=torch.tensor(mask.astype(np.int64))
                         ).last_hidden_state.numpy()
    ours = model.apply(variables, jnp.array(ids), jnp.array(mask),
                       method=T5Model.encode)
    np.testing.assert_allclose(np.array(ours), ref, atol=2e-5)


def test_full_model_token0_parity(pair, rng):
    hf, model, variables = pair
    ids = rng.integers(2, 100, size=(2, 9)).astype(np.int32)
    mask = np.ones_like(ids)
    dec_ids = np.zeros((2, 1), np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids.astype(np.int64)),
                 attention_mask=torch.tensor(mask.astype(np.int64)),
                 decoder_input_ids=torch.tensor(dec_ids)
                 ).last_hidden_state.numpy()
    _, dec = model.apply(variables, jnp.array(ids), jnp.array(mask),
                         jnp.array(dec_ids.astype(np.int32)))
    np.testing.assert_allclose(np.array(dec), ref, atol=2e-5)


def test_multi_step_decoder_parity(pair, rng):
    hf, model, variables = pair
    ids = rng.integers(2, 100, size=(2, 7)).astype(np.int32)
    mask = np.ones_like(ids)
    dec_ids = rng.integers(0, 100, size=(2, 5)).astype(np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids.astype(np.int64)),
                 attention_mask=torch.tensor(mask.astype(np.int64)),
                 decoder_input_ids=torch.tensor(dec_ids)
                 ).last_hidden_state.numpy()
    _, dec = model.apply(variables, jnp.array(ids), jnp.array(mask),
                         jnp.array(dec_ids.astype(np.int32)))
    np.testing.assert_allclose(np.array(dec), ref, atol=2e-5)


def test_init_nci_from_pretrained_t5(pair, rng):
    import jax
    from mevi_tpu.models import convert
    from mevi_tpu.models.nci import NCIDims, NCIT5
    hf, model, variables = pair
    sd = convert.hf_module_state_dict(hf)
    dims = NCIDims(t5=T5Dims(dropout_rate=0.0, **DIMS), kary=4,
                   max_output_length=4, adaptor_layer_num=1,
                   adaptor_num_heads=4, adaptor_d_ff=32)
    nci = NCIT5(dims)
    ids = jnp.zeros((1, 5), jnp.int32)
    fresh = nci.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids),
                     jnp.zeros((1, 4), jnp.int32))["params"]
    grafted = convert.init_nci_from_pretrained_t5(
        fresh, sd, DIMS["num_layers"])
    # encoder output equals the HF encoder
    import numpy as np
    qids = rng.integers(2, 100, size=(2, 6)).astype(np.int32)
    mask = np.ones_like(qids)
    ours = nci.apply({"params": grafted}, jnp.asarray(qids),
                     jnp.asarray(mask), method=NCIT5.encode)
    import torch
    with torch.no_grad():
        ref = hf.encoder(input_ids=torch.tensor(qids.astype(np.int64)),
                         attention_mask=torch.tensor(
                             mask.astype(np.int64))
                         ).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)
    # decode side untouched
    np.testing.assert_array_equal(
        np.asarray(grafted["decode_embeddings"]["embedding"]),
        np.asarray(fresh["decode_embeddings"]["embedding"]))
