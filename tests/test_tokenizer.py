"""BPE tokenizer: golden-value and property tests.

Golden ids were produced with the OpenAI CLIP tokenizer over the public
``bpe_simple_vocab_16e6`` merges; tests needing that asset skip when it is not
on the search path. The synthetic-merges tests run everywhere.
"""

import numpy as np
import pytest

from hgr_tpu.text import Tokenizer, bytes_to_unicode
from hgr_tpu.text.bpe import load_merges


def _full_tokenizer():
    try:
        return Tokenizer()
    except FileNotFoundError:
        pytest.skip("CLIP BPE vocab asset not available")


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_golden_clip_ids():
    t = _full_tokenizer()
    assert t.vocab_size == 49408
    assert (t.sot_id, t.eot_id) == (49406, 49407)
    assert t.encode("a photo of a dog.") == [320, 1125, 539, 320, 1929, 269]
    tok = t.tokenize(["a photo of a dog."])
    assert tok.shape == (1, 77)
    assert list(tok[0, :8]) == [49406, 320, 1125, 539, 320, 1929, 269, 49407]
    assert (tok[0, 8:] == 0).all()


def test_case_and_whitespace_normalization():
    t = _full_tokenizer()
    assert t.encode("A  Photo of a DOG.") == t.encode("a photo of a dog.")


def test_roundtrip_decode():
    t = _full_tokenizer()
    # byte-level BPE marks word ends with "</w>" -> every token becomes
    # space-separated on decode, including punctuation
    assert t.decode(t.encode("a photo of a siamese cat.")).strip() == (
        "a photo of a siamese cat ."
    )


def test_truncate_and_overflow():
    t = _full_tokenizer()
    long = "dog " * 100
    with pytest.raises(RuntimeError):
        t.tokenize([long])
    tok = t.tokenize([long], truncate=True)
    assert tok.shape == (1, 77)
    assert tok[0, -1] == t.eot_id


def test_synthetic_merges():
    # tiny merge table: 'l'+'o', 'lo'+'w</w>'
    merges = [("l", "o"), ("lo", "w</w>")]
    t = Tokenizer(merges=merges)
    ids = t.encode("low")
    assert [t.decoder[i] for i in ids] == ["low</w>"]
    ids = t.encode("lol")
    assert [t.decoder[i] for i in ids] == ["lo", "l</w>"]


def test_load_merges_slice_size():
    try:
        merges = load_merges()
    except FileNotFoundError:
        pytest.skip("CLIP BPE vocab asset not available")
    assert len(merges) == 49152 - 256 - 2


def test_token_bank_truncation_exact():
    """TreeModel truncates the token bank past the longest EOT (rounded to a
    multiple of 16). Causal mask + EOT pooling make dropped positions
    mathematically unreachable; the only residual difference is XLA picking
    size-dependent GEMM kernels (~1e-6 fp32 noise), so compare tightly."""
    import jax
    import jax.numpy as jnp

    from hgr_tpu.config import Config
    from hgr_tpu.hierarchy import synthetic_hierarchy
    from hgr_tpu.models.clip import clip_init, encode_text, get_config
    from hgr_tpu.tree_model import TreeModel, synthetic_tokens

    hier = synthetic_hierarchy(3, 3, 2, 0)
    cfg = Config(arch="TEST-RN", dtype="float32")
    tm = TreeModel.build(cfg, hier, pad_multiple=16)
    ccfg = get_config("TEST-RN")
    # bank truncated to a 16-multiple covering the longest prompt
    T = tm.node_tokens.shape[1]
    assert T < ccfg.context_length and T % 16 == 0
    assert int(tm.node_tokens.argmax(axis=1).max()) < T

    full = synthetic_tokens(hier.num_nodes, ccfg.context_length,
                            ccfg.vocab_size, seed=cfg.seed)
    params = clip_init(jax.random.PRNGKey(0), ccfg)
    f_full = encode_text(params, ccfg, jnp.asarray(full), dtype=jnp.float32)
    f_trunc = encode_text(
        params, ccfg, jnp.asarray(tm.node_tokens[: hier.num_nodes]),
        dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(f_full), np.asarray(f_trunc), atol=1e-5, rtol=1e-5
    )
