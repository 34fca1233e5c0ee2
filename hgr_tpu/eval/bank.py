"""Class-embedding bank: all node prompts -> one [N_pad, D] device array.

Equivalent of the reference's ``update_classifier`` (``model/clip_tree.py:
318-325``), which encodes 18,278 prompts in two ad-hoc halves; here the
encode runs as a ``lax.scan`` over fixed-size chunks inside ONE jit (so XLA
pipelines the chunks and nothing syncs with the host), L2-normalizes, and
returns a bank padded to a multiple of the model-axis shard size so it
shards evenly over the ``model`` mesh axis.

The pad rows are zero vectors: their cosine logits are 0 and every consumer
masks them out via the train/test masks anyway.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import l2_normalize


def pad_to(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def pad_tokens(tokens: np.ndarray, n_pad: int) -> np.ndarray:
    """Pad the [N, T] token matrix with all-zero rows to n_pad."""
    n, t = tokens.shape
    out = np.zeros((n_pad, t), dtype=tokens.dtype)
    out[:n] = tokens
    return out


def build_bank(
    params,
    tokens: jnp.ndarray,           # [N_pad, T] int32, N_pad % chunk == 0
    encode_text_fn: Callable,      # (params, [C, T]) -> [C, D]
    chunk: int = 512,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Encode all node prompts into a normalized [N_pad, D] bank."""
    n_pad, t = tokens.shape
    assert n_pad % chunk == 0, f"N_pad {n_pad} not divisible by chunk {chunk}"
    chunks = tokens.reshape(n_pad // chunk, chunk, t)

    def step(_, tk):
        feats = encode_text_fn(params, tk)
        return None, l2_normalize(feats).astype(out_dtype)

    _, feats = jax.lax.scan(step, None, chunks)
    return feats.reshape(n_pad, -1)


def build_bank_ids(
    params,
    n_pad: int,
    text_fn: Callable,             # (params, ids [C]) -> normalized [C, D]
    chunk: int = 512,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Bank builder for variant text paths (e.g. CoOp): iterate class-id
    chunks through ``text_fn`` under one jit'd scan."""
    assert n_pad % chunk == 0
    ids = jnp.arange(n_pad, dtype=jnp.int32).reshape(n_pad // chunk, chunk)

    def step(_, idx):
        return None, text_fn(params, idx).astype(out_dtype)

    _, feats = jax.lax.scan(step, None, ids)
    return feats.reshape(n_pad, -1)


def bank_logits(img_feats: jnp.ndarray, bank: jnp.ndarray) -> jnp.ndarray:
    """[B, D] image features (unnormalized) x [N_pad, D] bank -> [B, N_pad]
    raw cosine logits in fp32 (the reference's eval ``forward`` applies no
    logit scale, ``model/clip_tree.py:328-332``)."""
    feats = l2_normalize(img_feats)
    return jnp.einsum(
        "bd,nd->bn", feats, bank, preferred_element_type=jnp.float32
    )
