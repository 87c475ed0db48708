"""Flax BERT vs HF torch BertModel parity (random small weights)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mevi_tpu.models import convert
from mevi_tpu.models.bert import BertDims, BertEncoderModel

DIMS = dict(vocab_size=120, d_model=32, num_layers=2, num_heads=4,
            d_ff=64, max_position_embeddings=48, type_vocab_size=2)


@pytest.fixture(scope="module")
def pair():
    cfg = transformers.BertConfig(
        vocab_size=DIMS["vocab_size"], hidden_size=DIMS["d_model"],
        num_hidden_layers=DIMS["num_layers"],
        num_attention_heads=DIMS["num_heads"],
        intermediate_size=DIMS["d_ff"],
        max_position_embeddings=DIMS["max_position_embeddings"],
        type_vocab_size=DIMS["type_vocab_size"],
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        hidden_act="gelu")
    torch.manual_seed(0)
    hf = transformers.BertModel(cfg).eval()
    sd = convert.hf_module_state_dict(hf)
    params = convert.convert_bert_model(sd, DIMS["num_layers"])
    model = BertEncoderModel(BertDims(dropout_rate=0.0, **DIMS))
    return hf, model, {"params": params}


def test_bert_hidden_parity(pair, rng):
    hf, model, variables = pair
    ids = rng.integers(1, 100, size=(3, 13)).astype(np.int64)
    mask = np.ones_like(ids)
    mask[:, 10:] = 0
    types = np.zeros_like(ids)
    types[:, 5:] = 1
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask),
                 token_type_ids=torch.tensor(types)
                 ).last_hidden_state.numpy()
    ours = model.apply(variables, jnp.array(ids.astype(np.int32)),
                       jnp.array(mask.astype(np.int32)),
                       jnp.array(types.astype(np.int32)))
    np.testing.assert_allclose(np.array(ours), ref, atol=3e-5)


def test_cls_rep(pair, rng):
    hf, model, variables = pair
    ids = rng.integers(1, 100, size=(2, 8)).astype(np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)
                 ).last_hidden_state[:, 0, :].numpy()
    ours = model.apply(variables, jnp.array(ids.astype(np.int32)),
                       jnp.array(mask.astype(np.int32)),
                       method=BertEncoderModel.cls_rep)
    np.testing.assert_allclose(np.array(ours), ref, atol=3e-5)


def test_ar2_split():
    sd = {"ctx_model.embeddings.word_embeddings.weight": np.zeros(2),
          "question_model.embeddings.word_embeddings.weight": np.ones(2)}
    towers = convert.split_ar2_checkpoint(sd)
    assert (towers["passage"]["embeddings.word_embeddings.weight"]
            == 0).all()
    assert (towers["query"]["embeddings.word_embeddings.weight"]
            == 1).all()
