"""Checkpoint converters: HF/torch state dicts -> mevi_tpu flax params.

Covers the reference's model zoo (``document_encoder.py:134-198``,
``main.py:191-264``):

* HF ``T5Model`` / ``T5ForConditionalGeneration`` (T5-ANCE, docT5query),
* HF ``BertModel`` / ``ErnieModel`` (coCondenser, AR2),
* AR2 DPR-style ``.pkl``/``.pt`` dicts with ``ctx_model.`` /
  ``question_model.`` prefixes (``document_encoder.py:156-178``),
* NCI fine-tuned checkpoints saved by this framework (orbax — no
  conversion needed) or by the reference (torch lightning; converted via
  the same T5 mapping plus NCI extras).

All converters take ``{name: np.ndarray}`` dicts so torch is only needed
by the caller that loads the file.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

Array = np.ndarray
SD = Mapping[str, Array]


def _t(w: Array) -> Array:
    """torch Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def _attn(sd: SD, prefix: str, cross: bool = False,
          with_bias_table: bool = False) -> Dict:
    hf = "EncDecAttention" if cross else "SelfAttention"
    out = {
        "q": {"kernel": _t(sd[f"{prefix}.{hf}.q.weight"])},
        "k": {"kernel": _t(sd[f"{prefix}.{hf}.k.weight"])},
        "v": {"kernel": _t(sd[f"{prefix}.{hf}.v.weight"])},
        "o": {"kernel": _t(sd[f"{prefix}.{hf}.o.weight"])},
    }
    if with_bias_table:
        out["relative_attention_bias"] = {
            "embedding": sd[f"{prefix}.{hf}.relative_attention_bias.weight"]}
    return out


def _ff(sd: SD, prefix: str, gated: bool) -> Dict:
    if gated:
        return {
            "wi_0": {"kernel": _t(sd[f"{prefix}.wi_0.weight"])},
            "wi_1": {"kernel": _t(sd[f"{prefix}.wi_1.weight"])},
            "wo": {"kernel": _t(sd[f"{prefix}.wo.weight"])},
        }
    return {
        "wi": {"kernel": _t(sd[f"{prefix}.wi.weight"])},
        "wo": {"kernel": _t(sd[f"{prefix}.wo.weight"])},
    }


def convert_t5_stack(sd: SD, side: str, num_layers: int,
                     gated: bool = False) -> Dict:
    """HF T5 encoder/decoder stack -> T5Stack params."""
    is_dec = side == "decoder"
    out = {}
    for i in range(num_layers):
        p = f"{side}.block.{i}"
        block = {
            "self_attn": _attn(sd, f"{p}.layer.0",
                               with_bias_table=(i == 0)),
            "self_norm": {"weight": sd[f"{p}.layer.0.layer_norm.weight"]},
        }
        if is_dec:
            block["cross_attn"] = _attn(sd, f"{p}.layer.1", cross=True)
            block["cross_norm"] = {
                "weight": sd[f"{p}.layer.1.layer_norm.weight"]}
            ff_layer = 2
        else:
            ff_layer = 1
        block["ff"] = _ff(sd, f"{p}.layer.{ff_layer}.DenseReluDense", gated)
        block["ff_norm"] = {
            "weight": sd[f"{p}.layer.{ff_layer}.layer_norm.weight"]}
        out[f"block_{i}"] = block
    out["final_norm"] = {"weight": sd[f"{side}.final_layer_norm.weight"]}
    return out


def convert_t5_model(sd: SD, num_layers: int, num_decoder_layers: int,
                     gated: bool = False) -> Dict:
    """HF ``T5Model`` -> :class:`mevi_tpu.models.t5.T5Model` params."""
    return {
        "shared": {"embedding": np.asarray(sd["shared.weight"])},
        "encoder": convert_t5_stack(sd, "encoder", num_layers, gated),
        "decoder": convert_t5_stack(sd, "decoder", num_decoder_layers,
                                    gated),
    }


def convert_t5_encoder_model(sd: SD, num_layers: int,
                             gated: bool = False) -> Dict:
    return {
        "shared": {"embedding": np.asarray(sd["shared.weight"])},
        "encoder": convert_t5_stack(sd, "encoder", num_layers, gated),
    }


# --------------------------------------------------------------------------
# PAWA adaptor (torch nn.TransformerDecoder layout)
# --------------------------------------------------------------------------

def _mha(sd: SD, prefix: str) -> Dict:
    return {
        "in_proj_kernel": _t(sd[f"{prefix}.in_proj_weight"]),
        "in_proj_bias": np.asarray(sd[f"{prefix}.in_proj_bias"]),
        "out_proj": {"kernel": _t(sd[f"{prefix}.out_proj.weight"]),
                     "bias": np.asarray(sd[f"{prefix}.out_proj.bias"])},
    }


def convert_pawa(sd: SD, num_layers: int,
                 prefix: str = "") -> Dict:
    """torch ``nn.TransformerDecoder`` (+ memory embedding) ->
    :class:`mevi_tpu.models.pawa.PawaAdaptor` params.

    ``prefix`` points at the decoder ('adaptor.' in reference NCI
    checkpoints); the memory embedding key is ``adaptor_embeddings``.
    """
    out = {}
    for i in range(num_layers):
        p = f"{prefix}layers.{i}"
        out[f"layer_{i}"] = {
            "self_attn": _mha(sd, f"{p}.self_attn"),
            "cross_attn": _mha(sd, f"{p}.multihead_attn"),
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "norm3": _ln(sd, f"{p}.norm3"),
            "linear1": _dense(sd, f"{p}.linear1"),
            "linear2": _dense(sd, f"{p}.linear2"),
        }
    return out


def convert_nci_checkpoint(sd: SD, num_layers: int,
                           num_decoder_layers: int,
                           adaptor_layers: int = 4,
                           reserve_decoder: bool = False,
                           gated: bool = False) -> Dict:
    """Reference NCI lightning checkpoint ('model.' prefix stripped) ->
    :class:`mevi_tpu.models.nci.NCIT5` params."""
    out = {
        "shared": {"embedding": np.asarray(sd["shared.weight"])},
        "encoder": convert_t5_stack(sd, "encoder", num_layers, gated),
        "decoder": convert_t5_stack(sd, "decoder", num_decoder_layers,
                                    gated),
        "decode_embeddings": {
            "embedding": np.asarray(sd["decode_embeddings.weight"])},
    }
    if "adaptor_linear.weight" in sd:
        pawa = convert_pawa(sd, adaptor_layers, prefix="adaptor.")
        pawa["memory_embedding"] = np.asarray(
            sd["adaptor_embeddings"]).reshape(1, 1, -1)
        out["pawa"] = pawa
        out["adaptor_kernel"] = _t(sd["adaptor_linear.weight"])
    if reserve_decoder:
        out["ori_decoder"] = convert_t5_stack(sd, "ori_decoder", 12, gated)
    return out


# --------------------------------------------------------------------------
# BERT / ERNIE
# --------------------------------------------------------------------------

def _ln(sd: SD, prefix: str) -> Dict:
    # HF uses LayerNorm.{weight,bias} or LayerNorm.{gamma,beta} in old ckpts
    for w, b in ((f"{prefix}.weight", f"{prefix}.bias"),
                 (f"{prefix}.gamma", f"{prefix}.beta")):
        if w in sd:
            return {"scale": np.asarray(sd[w]), "bias": np.asarray(sd[b])}
    raise KeyError(prefix)


def _dense(sd: SD, prefix: str) -> Dict:
    return {"kernel": _t(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def convert_bert_model(sd: SD, num_layers: int) -> Dict:
    """HF ``BertModel``/``ErnieModel`` -> models.bert.BertEncoderModel.

    ERNIE checkpoints use the same tensor layout with an ``ernie.``/plain
    prefix; pass a pre-stripped dict.
    """
    emb = "embeddings"
    out = {
        "embeddings": {
            "word": {"embedding": np.asarray(
                sd[f"{emb}.word_embeddings.weight"])},
            "position": {"embedding": np.asarray(
                sd[f"{emb}.position_embeddings.weight"])},
            "token_type": {"embedding": np.asarray(
                sd[f"{emb}.token_type_embeddings.weight"])},
            "norm": _ln(sd, f"{emb}.LayerNorm"),
        },
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        out[f"layer_{i}"] = {
            "attn": {
                "query": _dense(sd, f"{p}.attention.self.query"),
                "key": _dense(sd, f"{p}.attention.self.key"),
                "value": _dense(sd, f"{p}.attention.self.value"),
                "out": _dense(sd, f"{p}.attention.output.dense"),
                "norm": _ln(sd, f"{p}.attention.output.LayerNorm"),
            },
            "ff_intermediate": _dense(sd, f"{p}.intermediate.dense"),
            "ff_out": _dense(sd, f"{p}.output.dense"),
            "ff_norm": _ln(sd, f"{p}.output.LayerNorm"),
        }
    return out


def split_ar2_checkpoint(sd: SD) -> Dict[str, Dict[str, Array]]:
    """AR2/DPR dict with ``ctx_model.`` / ``question_model.`` prefixes ->
    two plain BERT state dicts (``document_encoder.py:160-178``)."""
    towers = {"ctx_model.": {}, "question_model.": {}}
    for k, v in sd.items():
        for prefix, bucket in towers.items():
            if k.startswith(prefix):
                bucket[k[len(prefix):]] = v
    return {"passage": towers["ctx_model."],
            "query": towers["question_model."]}


def init_nci_from_pretrained_t5(nci_params: Dict, t5_sd: SD,
                                num_layers: int,
                                gated: bool = False) -> Dict:
    """Graft a pretrained T5's shared embedding + encoder into freshly
    initialized NCI params (``--pretrain_encoder``,
    ``main_models.py:1390-1397``: only ``shared.``/``encoder.`` weights
    copy over; the decode side stays fresh)."""
    out = dict(nci_params)
    out["shared"] = {"embedding": np.asarray(t5_sd["shared.weight"])}
    out["encoder"] = convert_t5_stack(t5_sd, "encoder", num_layers,
                                      gated)
    return out


def load_torch_state_dict(path: str) -> Dict[str, Array]:
    """Load a torch checkpoint file into numpy (host-side helper)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("model_dict", "state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else
            np.asarray(v) for k, v in obj.items()
            if hasattr(v, "shape")}


def hf_module_state_dict(model) -> Dict[str, Array]:
    return {k: v.detach().cpu().numpy()
            for k, v in model.state_dict().items()}
