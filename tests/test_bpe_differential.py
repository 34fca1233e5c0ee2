"""Differential fuzz: our from-scratch BPE vs the EXECUTED reference
tokenizer (``/root/reference/clip/simple_tokenizer.py``), loaded by path and
run as an oracle (the same pattern as the executed-torch encoder oracles).

The reference imports ftfy, which this environment lacks; a stub with
``fix_text = identity`` is installed and the fuzz corpus is restricted to
already-clean text (printable ASCII + precomposed unicode), where
``ftfy.fix_text`` is the identity — exactly the regime of real class names.
The golden-ids test (``test_tokenizer.py``) pins a handful of cases; this
one sweeps hundreds of adversarial ones (casing, punctuation runs,
contractions, numerals, accents, long words, whitespace soup).
"""

import importlib.util
import os
import random
import string
import sys
import types

import pytest

REF = "/root/reference/clip/simple_tokenizer.py"
VOCAB = "/root/reference/clip/bpe_simple_vocab_16e6.txt.gz"


@pytest.fixture(scope="module")
def pair():
    if not (os.path.exists(REF) and os.path.exists(VOCAB)):
        pytest.skip("reference tokenizer not available")
    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules["ftfy"] = stub
    spec = importlib.util.spec_from_file_location("ref_simple_tokenizer", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ref = mod.SimpleTokenizer(VOCAB)

    from hgr_tpu.text.bpe import Tokenizer

    return ref, Tokenizer(VOCAB)


CORPUS = [
    "a photo of a dog.",
    "Tree   with    many spaces",
    "it's-a-me, mario!!!",
    "don't stop; won't stop",
    "ImageNet-21K zero-shot",
    "naïve café déjà-vu",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    "x" * 200,
    "MixedCASE WoRdS",
    "numbers 1234567890 42nd 3.14159",
    "under_scores and-hyphens and/slashes",
    "(parenthetical) [bracketed] {braced}",
    "trailing space ",
    " leading space",
    "\ttabs\tand\nnewlines\n",
    "!!!???...,,,;;;:::",
    "'quoted' \"double\" `tick`",
]


def test_differential_corpus(pair):
    ref, ours = pair
    for text in CORPUS:
        assert ours.encode(text) == ref.encode(text), repr(text)


def test_differential_fuzz(pair):
    ref, ours = pair
    rng = random.Random(0)
    alphabet = (
        string.ascii_letters + string.digits + string.punctuation + "  éüñàß"
    )
    for _ in range(300):
        n = rng.randint(0, 40)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        assert ours.encode(text) == ref.encode(text), repr(text)


def test_tokenize_assembly_matches_reference(pair):
    """Full tokenize() contract (SOT/EOT, zero pad, truncate-with-EOT) —
    the reference assembly lives in clip/clip.py:188-224; its tokenizer ids
    come from the shared fixture."""
    ref, ours = pair
    sot = ref.encoder["<|startoftext|>"]
    eot = ref.encoder["<|endoftext|>"]

    def ref_tokenize(texts, context_length=77, truncate=False):
        import numpy as np

        out = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, t in enumerate(texts):
            ids = [sot] + ref.encode(t) + [eot]
            if len(ids) > context_length:
                if not truncate:
                    raise RuntimeError(t)
                ids = ids[:context_length]
                ids[-1] = eot
            out[i, : len(ids)] = ids
        return out

    import numpy as np

    texts = ["a photo of a dog.", "x" * 300, "short", ""]
    got = ours.tokenize(texts, context_length=77, truncate=True)
    want = ref_tokenize(texts, truncate=True)
    np.testing.assert_array_equal(got, want)

    with pytest.raises(RuntimeError):
        ours.tokenize(["y" * 300], context_length=20, truncate=False)
