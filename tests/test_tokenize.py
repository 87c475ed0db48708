"""Host tokenization: HashTokenizer stub contract, passage styles,
tokenizer-guard semantics (``prepare_passage_tokenized.py`` formats)."""

import numpy as np
import pytest

from mevi_tpu.data.tokenize import (HashTokenizer, get_tokenizer,
                                    tokenize_passages, tokenize_queries)


def test_hash_tokenizer_deterministic_and_bounded():
    tok = HashTokenizer(vocab_size=512)
    a = tok(["hello world", "hello world"], max_length=8)
    np.testing.assert_array_equal(a["input_ids"][0], a["input_ids"][1])
    assert a["input_ids"].max() < 512
    assert a["input_ids"].min() >= 0
    # same word -> same id; case-insensitive
    b = tok(["Hello hello"], max_length=8)
    ids = b["input_ids"][0][b["attention_mask"][0] > 0]
    assert ids[0] == ids[1]
    # eos appended, mask covers tokens
    assert ids[-1] == tok.eos_id


def test_hash_tokenizer_truncation_and_padding():
    tok = HashTokenizer()
    enc = tok(["a b c d e f g h"], max_length=4, truncation=True,
              padding="max_length")
    assert enc["input_ids"].shape == (1, 4)
    assert enc["attention_mask"][0].sum() == 4
    enc = tok(["a"], max_length=6)
    assert enc["attention_mask"][0].sum() == 2      # word + eos
    assert (enc["input_ids"][0][2:] == tok.pad_id).all()


def test_hash_tokenizer_batch_decode_roundtrip_nonempty():
    tok = HashTokenizer()
    enc = tok(["some passage text"], max_length=8)
    out = tok.batch_decode(enc["input_ids"], skip_special_tokens=True)
    assert len(out) == 1 and out[0].strip()


def test_tokenize_passages_styles():
    tok = HashTokenizer()
    rows = [("Title A", "content one"), ("", "content two")]
    t_ance, m_ance = tokenize_passages(rows, tok, "ance", length=16)
    assert t_ance.shape == (2, 16) and t_ance.dtype == np.int64
    # ance prepends "Title: .. Text: .."; ar2 encodes (title, text) pairs
    t_ar2, _ = tokenize_passages(rows, tok, "ar2", length=16)
    assert not (t_ance == t_ar2).all()
    # identical content tokenizes identically
    t2, _ = tokenize_passages(rows, tok, "ance", length=16)
    np.testing.assert_array_equal(t_ance, t2)


def test_tokenize_queries_shape_dtype():
    tok = HashTokenizer()
    ids, mask = tokenize_queries(["what is x", "who"], tok, length=8)
    assert ids.shape == (2, 8) and ids.dtype == np.int32
    assert mask[1].sum() < mask[0].sum()


def test_get_tokenizer_guard(monkeypatch):
    # unknown style resolves to an HF name; without the fallback flag a
    # load failure must raise, with it we get the stub
    import mevi_tpu.data.tokenize as T

    def boom(*a, **kw):
        raise OSError("offline")

    import transformers
    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained",
                        boom)
    with pytest.raises(RuntimeError):
        get_tokenizer("ance", allow_hash_fallback=False)
    tok = get_tokenizer("ance", allow_hash_fallback=True)
    assert isinstance(tok, HashTokenizer)
