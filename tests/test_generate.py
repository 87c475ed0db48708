"""KV-cached generation: greedy parity vs HF torch T5 generate, cache
consistency vs full-panel decode, sampling sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mevi_tpu.decode.generate import generate
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
        dropout_rate=0.0, feed_forward_proj="relu",
        decoder_start_token_id=0, eos_token_id=1, pad_token_id=0,
        tie_word_embeddings=True)
    torch.manual_seed(0)
    hf = transformers.T5ForConditionalGeneration(cfg).eval()
    sd = convert.hf_module_state_dict(hf)
    params = convert.convert_t5_model(sd, DIMS["num_layers"],
                                      DIMS["num_decoder_layers"])
    model = T5Model(T5Dims(dropout_rate=0.0, **DIMS))
    return hf, model, params


def test_greedy_matches_hf(pair, rng):
    hf, model, params = pair
    ids = rng.integers(2, 100, size=(3, 9)).astype(np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = hf.generate(torch.tensor(ids),
                          attention_mask=torch.tensor(mask),
                          max_length=12, do_sample=False, num_beams=1)
    out = generate(model, params, jnp.asarray(ids, jnp.int32),
                   jnp.asarray(mask, jnp.int32), jax.random.PRNGKey(0),
                   max_length=11, do_sample=False)
    out = np.asarray(out)
    ref = ref.numpy()[:, 1:]  # strip decoder start token
    for b in range(3):
        # compare up to (and including) the first EOS
        end = np.argmax(ref[b] == 1) + 1 if (ref[b] == 1).any() \
            else ref.shape[1]
        assert (out[b][:end] == ref[b][:end]).all(), (b, out[b], ref[b])


def test_cached_decode_matches_panel(pair, rng):
    """decode_step with KV cache == full-panel decode at every prefix."""
    hf, model, params = pair
    ids = rng.integers(2, 100, size=(2, 7)).astype(np.int32)
    mask = np.ones_like(ids)
    dec = rng.integers(2, 100, size=(2, 5)).astype(np.int32)
    dec[:, 0] = 0
    enc = model.apply({"params": params}, jnp.asarray(ids),
                      jnp.asarray(mask), method=T5Model.encode)
    panel = model.apply({"params": params}, jnp.asarray(dec), enc,
                        jnp.asarray(mask), method=T5Model.decode)

    bound = model.bind({"params": params})
    cross = bound.decoder.project_cross_kvs(enc)
    cache = bound.decoder.init_cache(2, 5)
    from mevi_tpu.models.t5 import extend_mask
    em = extend_mask(jnp.asarray(mask))
    outs = []
    for t in range(5):
        emb = bound.shared(jnp.asarray(dec[:, t:t + 1]))
        h, cache = bound.decoder.decode_step(emb, t, cache, cross, em)
        outs.append(np.asarray(h)[:, 0])
    stepped = np.stack(outs, axis=1)
    np.testing.assert_allclose(stepped, np.asarray(panel), atol=2e-5)


def test_sampling_variability(pair, rng):
    hf, model, params = pair
    ids = rng.integers(2, 100, size=(1, 6)).astype(np.int32)
    mask = np.ones_like(ids)
    out = generate(model, params, jnp.asarray(ids), jnp.asarray(mask),
                   jax.random.PRNGKey(3), max_length=10,
                   num_return_sequences=8, do_sample=True)
    out = np.asarray(out)
    assert out.shape == (8, 10)
    # sampled sequences should not all be identical
    assert len({tuple(r) for r in out}) > 1
    # after an EOS, only pad
    for r in out:
        if (r == 1).any():
            e = np.argmax(r == 1)
            assert (r[e + 1:] == 0).all()


def test_topk_topp_filtering():
    from mevi_tpu.decode.generate import _filter_logits
    logits = jnp.asarray(np.log(np.array([[0.5, 0.3, 0.15, 0.05]],
                                         np.float32)))
    f = np.asarray(_filter_logits(logits, top_k=2, top_p=1.0))
    assert (f[0, 2:] < -1e8).all() and (f[0, :2] > -1e8).all()
    f = np.asarray(_filter_logits(logits, top_k=0, top_p=0.75))
    # cumulative-exclusive < 0.75 keeps ids 0 and 1 (0.5, then 0.5<0.75)
    assert (f[0, :2] > -1e8).all()
    assert (f[0, 3] < -1e8)


def test_doc2query_repair_loop(tmp_path, rng):
    """--repair regenerates queries for docs with empty/duplicate rows
    (complement_qg10.py semantics)."""
    import torch
    import transformers
    from mevi_tpu.cli.main import main

    t5cfg = transformers.T5Config(
        vocab_size=32128, d_model=16, d_kv=4, d_ff=32, num_heads=4,
        num_layers=1, num_decoder_layers=1, dropout_rate=0.0,
        feed_forward_proj="relu")
    torch.manual_seed(0)
    hf = transformers.T5Model(t5cfg).eval()
    ck = str(tmp_path / "qg.pt")
    torch.save(hf.state_dict(), ck)

    corpus = tmp_path / "corpus.tsv"
    corpus.write_text("0\tT0\tsome passage text here\n"
                      "1\tT1\tanother different passage\n")
    # doc 0 has 2 good rows; doc 1 has dup + empty -> needs regeneration
    qg = tmp_path / "qg.tsv"
    qg.write_text("good q one\t0\nsecond q\t0\n"
                  "dup\t1\ndup\t1\n   \t1\n")
    out = str(tmp_path / "qg_fixed.tsv")
    main(["doc2query", "--checkpoint", ck, "--corpus", str(corpus),
          "--output", out, "--n_gen_query", "2", "--num_layers", "1",
          "--d_model", "16", "--d_kv", "4", "--d_ff", "32",
          "--num_heads", "4",
          "--batch", "2", "--query_max_len", "4", "--doc_max_len", "8",
          "--repair", str(qg), "--repair_rounds", "2",
          "--allow_hash_tokenizer"])
    rows = [line.split("\t") for line in
            open(out).read().strip().split("\n")]
    per_doc = {}
    for q, d in rows:
        per_doc.setdefault(int(d), []).append(q)
    # doc 0 untouched, doc 1 got regenerated rows (dedup kept 1 'dup')
    assert per_doc[0] == ["good q one", "second q"]
    assert len(per_doc[1]) >= 1
    assert all(q.strip() for qs in per_doc.values() for q in qs)
