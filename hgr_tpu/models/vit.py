"""Vision Transformer image encoder (CLIP ViT-B family).

Behavioural equivalent of the reference ``VisionTransformer``
(``clip/model.py:202-236``): conv patchify, class token, learned positional
embeddings, pre/post LayerNorm, projection to the shared embedding dim.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import Params, conv2d, layer_norm, layer_norm_init
from .transformer import transformer_apply, transformer_init


def vit_init(
    key,
    input_resolution: int,
    patch_size: int,
    width: int,
    layers: int,
    output_dim: int,
) -> Params:
    kc, kcls, kp, ktr, kproj = jax.random.split(key, 5)
    scale = width ** -0.5
    n_patches = (input_resolution // patch_size) ** 2
    return {
        "conv1": {"w": scale * jax.random.normal(kc, (patch_size, patch_size, 3, width))},
        "class_embedding": scale * jax.random.normal(kcls, (width,)),
        "positional_embedding": scale * jax.random.normal(kp, (n_patches + 1, width)),
        "ln_pre": layer_norm_init(width),
        "transformer": transformer_init(ktr, width, layers),
        "ln_post": layer_norm_init(width),
        "proj": scale * jax.random.normal(kproj, (width, output_dim)),
    }


def vit_apply(
    p: Params,
    x: jnp.ndarray,  # [B, H, W, 3]
    patch_size: int,
    num_heads: int,
    dtype=jnp.bfloat16,
    attn_fn=None,
    remat: bool = False,
) -> jnp.ndarray:
    x = x.astype(dtype)
    x = conv2d(p["conv1"], x, stride=patch_size)  # [B, g, g, width]
    B, g1, g2, width = x.shape
    x = x.reshape(B, g1 * g2, width)
    cls = jnp.broadcast_to(p["class_embedding"].astype(dtype), (B, 1, width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["positional_embedding"].astype(dtype)
    x = layer_norm(p["ln_pre"], x)
    x = transformer_apply(p["transformer"], x, num_heads, attn_fn=attn_fn, remat=remat)
    x = layer_norm(p["ln_post"], x[:, :1])[:, 0]
    return x @ p["proj"].astype(dtype)
