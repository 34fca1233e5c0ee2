"""Byte-level BPE tokenizer (CLIP-compatible), written from scratch.

Implements the standard CLIP text tokenization (byte-level BPE over a 49,152
token vocabulary with ``</w>`` end-of-word markers and ``<|startoftext|>`` /
``<|endoftext|>`` specials), matching the behaviour of the reference's
tokenizer (``clip/simple_tokenizer.py``, ``clip/clip.py:188-224``) so that a
converted OpenAI checkpoint sees identical token ids.

The merges file (``bpe_simple_vocab_16e6.txt.gz``) is an OpenAI asset not
vendored here; pass its path explicitly, set ``$HGR_TPU_BPE_VOCAB``, or rely on
the default search paths. For unit tests a tiny synthetic merge table can be
passed via ``merges=``.

Text cleanup: the reference uses ftfy + html unescape + lowercase + whitespace
collapse; ftfy is optional here (most class-name inputs are already clean
ASCII) — when missing we fall back to html unescape + NFC normalization.
"""

from __future__ import annotations

import gzip
import html
import os
import unicodedata
from functools import lru_cache
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np
import regex as re

CONTEXT_LENGTH = 77
SOT = "<|startoftext|>"
EOT = "<|endoftext|>"

_DEFAULT_VOCAB_PATHS = (
    os.environ.get("HGR_TPU_BPE_VOCAB", ""),
    os.path.join(os.path.dirname(__file__), "bpe_simple_vocab_16e6.txt.gz"),
    "/root/reference/clip/bpe_simple_vocab_16e6.txt.gz",
)

_WORD_RE = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2 style reversible byte <-> printable-unicode mapping."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _clean(text: str) -> str:
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        text = unicodedata.normalize("NFC", text)
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text.strip())
    return text.lower()


def load_merges(vocab_path: Optional[str] = None) -> List[Tuple[str, str]]:
    """Load the BPE merge list from a (gzipped) text file.

    Uses the same slice of the file as CLIP: entries ``1 .. 49152-256-2`` (the
    first line is a version header; the vocab budget is 49,152 minus 512 byte
    tokens minus 2 specials).
    """
    path = vocab_path
    if path is None:
        for cand in _DEFAULT_VOCAB_PATHS:
            if cand and os.path.exists(cand):
                path = cand
                break
    if path is None or not os.path.exists(path):
        raise FileNotFoundError(
            "BPE vocab file not found; set $HGR_TPU_BPE_VOCAB or pass vocab_path"
        )
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        data = f.read().decode("utf-8")
    lines = data.split("\n")
    lines = lines[1 : 49152 - 256 - 2 + 1]
    return [tuple(line.split()) for line in lines]  # type: ignore[misc]


class Tokenizer:
    """CLIP byte-level BPE tokenizer."""

    def __init__(
        self,
        vocab_path: Optional[str] = None,
        merges: Optional[Sequence[Tuple[str, str]]] = None,
    ):
        if merges is None:
            merges = load_merges(vocab_path)
        merges = [tuple(m) for m in merges]
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        vocab: List[str] = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += [SOT, EOT]
        self.encoder: Dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        self.decoder: Dict[int, str] = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks: Dict[Tuple[str, str], int] = {m: i for i, m in enumerate(merges)}
        self._cache: Dict[str, str] = {SOT: SOT, EOT: EOT}
        self.sot_id = self.encoder[SOT]
        self.eot_id = self.encoder[EOT]

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    def _bpe(self, token: str) -> str:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word: Tuple[str, ...] = tuple(token[:-1]) + (token[-1] + "</w>",)
        if len(word) == 1:
            out = word[0]
            self._cache[token] = out
            return out
        while True:
            pairs = set(zip(word[:-1], word[1:]))
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == first
                    and word[i + 1] == second
                ):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
            if len(word) == 1:
                break
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for tok in _WORD_RE.findall(_clean(text)):
            b = "".join(self.byte_encoder[x] for x in tok.encode("utf-8"))
            ids.extend(self.encoder[piece] for piece in self._bpe(b).split(" "))
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.decoder[i] for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def tokenize(
        self,
        texts: Sequence[str] | str,
        context_length: int = CONTEXT_LENGTH,
        truncate: bool = False,
    ) -> np.ndarray:
        """``[len(texts), context_length]`` int32 token matrix with SOT/EOT,
        zero-padded — the same contract as the reference ``clip.tokenize``
        (``clip/clip.py:188-224``)."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot_id] + self.encode(t) + [self.eot_id]
            if len(ids) > context_length:
                if truncate:
                    ids = ids[:context_length]
                    ids[-1] = self.eot_id
                else:
                    raise RuntimeError(
                        f"input {t!r} is too long for context length {context_length}"
                    )
            out[i, : len(ids)] = ids
        return out
