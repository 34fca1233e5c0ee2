"""Baseline 'materials': word embeddings + classifier-weight extraction.

Behavioural rebuild of ``baseline/DGP/materials/`` helpers:

- :func:`load_glove` / :class:`GloVe` — GloVe txt loading with the
  reference's sub-word fallback lookup (``materials/glove.py``): a missing
  multi-word name averages its word vectors; a missing word tries
  hyphen/concatenation splits, else zeros.
- :func:`wnid_vectors` — per-wnid embedding matrix from class names
  (``make_induced_graph.py:30-43`` + ``pick_vectors``,
  ``baseline/DGP/utils.py:34-50``: missing entries become zero vectors).
- :func:`fc_vectors_from_torch_resnet` — split the fc rows out of a
  torchvision resnet50 checkpoint (``materials/process_resnet.py``): the
  regression targets for GCN stage A (weight rows + bias column).

Everything is gated on the external assets (GloVe txt / torch checkpoint)
and usable offline; nothing here touches the accelerator.
"""

from __future__ import annotations

import json
from typing import Dict, Optional, Sequence

import numpy as np


class GloVe:
    """Word -> vector store with the reference's fallback lookup."""

    def __init__(self, vectors: Dict[str, np.ndarray], dim: int):
        self.vectors = vectors
        self.dim = dim

    @classmethod
    def from_txt(cls, path: str, dim_hint: int = 300) -> "GloVe":
        vecs: Dict[str, np.ndarray] = {}
        dim = dim_hint
        with open(path, encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip().split(" ")
                if len(parts) < 2:
                    continue
                word = parts[0]
                v = np.asarray(parts[1:], dtype=np.float32)
                dim = len(v)
                vecs[word] = v
        return cls(vecs, dim)

    def __getitem__(self, word: str) -> Optional[np.ndarray]:
        word = word.lower()
        if word in self.vectors:
            return self.vectors[word]
        # sub-word fallback: split on '-' then try concatenation halves
        if "-" in word:
            parts = [p for p in word.split("-") if p]
            got = [self.vectors[p] for p in parts if p in self.vectors]
            if got:
                return np.mean(got, axis=0)
        for i in range(1, len(word)):
            a, b = word[:i], word[i:]
            if a in self.vectors and b in self.vectors:
                return (self.vectors[a] + self.vectors[b]) / 2
        return None

    def name_vector(self, name: str) -> np.ndarray:
        """Average of word vectors of a (multi-word) class name; zeros when
        nothing resolves (pick_vectors semantics)."""
        words = name.replace("_", " ").replace(",", " ").split()
        got = [v for v in (self[w] for w in words) if v is not None]
        if not got:
            return np.zeros(self.dim, np.float32)
        return np.mean(got, axis=0).astype(np.float32)


def wnid_vectors(
    glove: GloVe, wnids: Sequence[str], names: Dict[str, str]
) -> np.ndarray:
    """[len(wnids), dim] embedding matrix; unknown names -> zero rows."""
    return np.stack([glove.name_vector(names.get(w, w)) for w in wnids])


def fc_vectors_from_torch_resnet(path: str, normalize: bool = True) -> np.ndarray:
    """Extract [1000, 2049] fc weight rows + bias column from a torchvision
    resnet50 checkpoint — the GCN regression targets
    (``materials/process_resnet.py``; bias column usage
    ``evaluate_imagenet.py:83-86``)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    w = sd["fc.weight"].detach().float().numpy()          # [1000, 2048]
    b = sd["fc.bias"].detach().float().numpy()[:, None]   # [1000, 1]
    fc = np.concatenate([w, b], axis=1)
    if normalize:
        fc = fc / np.maximum(np.linalg.norm(fc, axis=1, keepdims=True), 1e-12)
    return fc.astype(np.float32)


def inject_fc(resnet_params, fc_vectors: np.ndarray):
    """Fix a (GCN-predicted) classifier into the standard ResNet-50 head —
    the reference's ``train_resnet_fit.py:43-57`` refit setup. ``fc_vectors``
    is [C, 2049] (weights + bias column); returns params with the new fc and
    the convention that features get a ones column appended (handled by
    :func:`logits_with_bias_column`)."""
    import jax.numpy as jnp

    p = dict(resnet_params)
    p["fc"] = {
        "w": jnp.asarray(fc_vectors[:, :-1].T),   # [2048, C]
        "b": jnp.asarray(fc_vectors[:, -1]),      # [C]
    }
    return p


def tr_word_vectors(feats: np.ndarray) -> np.ndarray:
    """The reference's "Tr" (CLIP-text-feature) node-embedding preprocessing:
    ``cat((pred, pred, ones), 1)`` then L2-normalize
    (``train_gcn_dense_trans.py:70-77``). The doubling + ones column pads the
    CLIP feature to the dimensionality convention the dense-graph GCN weights
    were sized for."""
    f = np.asarray(feats, np.float32)
    out = np.concatenate([f, f, np.ones((f.shape[0], 1), np.float32)], axis=1)
    return out / np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)


def fc_vectors_from_json(path: str, normalize: bool = True) -> np.ndarray:
    """Load the reference's ``fc-weights.json`` (``[[wnid, vector], ...]``,
    consumed at ``train_gcn_dense_trans.py:57-68``) -> [N, D] float32."""
    with open(path) as f:
        rows = json.load(f)
    fc = np.asarray([r[1] for r in rows], np.float32)
    if normalize:
        fc = fc / np.maximum(np.linalg.norm(fc, axis=1, keepdims=True), 1e-12)
    return fc


def logits_with_bias_column(features: np.ndarray, pred_vectors: np.ndarray):
    """DGP stage-B scoring: [B, 2048] features + ones column against
    [N, 2049] predicted classifiers (``evaluate_imagenet.py:83-89``)."""
    import jax.numpy as jnp

    f = jnp.asarray(features)
    ones = jnp.ones((f.shape[0], 1), f.dtype)
    fb = jnp.concatenate([f, ones], axis=1)
    return fb @ jnp.asarray(pred_vectors).T


def suppress_seen(table, seen, value: float = 1e-7):
    """The DGP ZSL protocol's seen-class suppression: seen-class columns are
    set to ``value`` — NOT removed (``evaluate_21kp.py:93-95``,
    ``evaluate_imagenet.py`` same; there "seen" is the first-n column block,
    here ``seen`` is an int n or a [N] bool mask since our node order
    interleaves). 1e-7 is a reachable value for fc logits, so a seen class
    can still out-score the unseen set when every unseen logit is negative —
    faithful semantics, the same family of quirk as the eval engine's
    ``metrics.FILL``."""
    import jax.numpy as jnp

    t = jnp.asarray(table)
    if np.ndim(seen) == 0:
        seen = jnp.arange(t.shape[1]) < int(seen)
    else:
        seen = jnp.asarray(seen, bool)
    return jnp.where(seen[None, :], jnp.asarray(value, t.dtype), t)
