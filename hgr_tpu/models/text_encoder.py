"""CLIP text encoder: token embedding -> causal transformer -> EOT pooling.

Behavioural equivalent of the reference ``CLIP.encode_text``
(``clip/model.py:339-352``): learned positional embeddings, causal mask, final
LayerNorm, pooling at the EOT token (argmax of token ids since EOT has the
highest id), matmul with ``text_projection``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import Params, causal_mask, layer_norm, layer_norm_init
from .transformer import transformer_apply, transformer_init


def text_encoder_init(
    key,
    vocab_size: int,
    context_length: int,
    width: int,
    layers: int,
    embed_dim: int,
) -> Params:
    kt, kp, ktr, kproj = jax.random.split(key, 4)
    return {
        "token_embedding": 0.02 * jax.random.normal(kt, (vocab_size, width)),
        "positional_embedding": 0.01 * jax.random.normal(kp, (context_length, width)),
        "transformer": transformer_init(ktr, width, layers),
        "ln_final": layer_norm_init(width),
        "text_projection": (width ** -0.5) * jax.random.normal(kproj, (width, embed_dim)),
    }


def text_encoder_apply(
    p: Params,
    tokens: jnp.ndarray,  # [B, T] int32
    num_heads: int,
    dtype=jnp.bfloat16,
    attn_fn=None,
    remat: bool = False,
) -> jnp.ndarray:
    T = tokens.shape[1]
    x = p["token_embedding"].astype(dtype)[tokens]
    x = x + p["positional_embedding"][:T].astype(dtype)
    mask = jnp.asarray(causal_mask(T))
    x = transformer_apply(
        p["transformer"], x, num_heads, mask=mask, attn_fn=attn_fn, remat=remat
    )
    x = layer_norm(p["ln_final"], x)
    # EOT pooling: highest token id in each row is the EOT token
    eot = jnp.argmax(tokens, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return pooled @ p["text_projection"].astype(dtype)
