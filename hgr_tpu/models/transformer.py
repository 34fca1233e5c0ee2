"""Pre-LN residual transformer stack shared by the text encoder and the ViT.

Mirrors the behaviour of the reference's ``Transformer`` /
``ResidualAttentionBlock`` (``clip/model.py:153-199``) — QuickGELU MLP,
packed-QKV attention, optional causal mask — with the reference's init scheme
(``clip/model.py:302-315``) so from-scratch training matches, and with the
blocks stacked along a leading axis + ``jax.lax.scan`` so XLA compiles ONE
block body regardless of depth (compile time and code size stay flat, and the
scan carries ride in registers/VMEM).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .layers import (
    Params,
    layer_norm,
    layer_norm_init,
    linear,
    mha,
    mha_init,
    quick_gelu,
)


def block_init(key, width: int, layers: int) -> Params:
    """One residual block's params (used standalone; stacking is below)."""
    ka, kao, kf, kp = jax.random.split(key, 4)
    attn_std = width ** -0.5
    proj_std = (width ** -0.5) * ((2 * layers) ** -0.5)
    fc_std = (2 * width) ** -0.5
    p = mha_init(ka, width)
    p["qkv"]["w"] = attn_std * jax.random.normal(ka, (width, 3 * width))
    p["out"]["w"] = proj_std * jax.random.normal(kao, (width, width))
    return {
        "attn": p,
        "ln_1": layer_norm_init(width),
        "mlp": {
            "c_fc": {
                "w": fc_std * jax.random.normal(kf, (width, 4 * width)),
                "b": jnp.zeros((4 * width,), jnp.float32),
            },
            "c_proj": {
                "w": proj_std * jax.random.normal(kp, (4 * width, width)),
                "b": jnp.zeros((width,), jnp.float32),
            },
        },
        "ln_2": layer_norm_init(width),
    }


def transformer_init(key, width: int, layers: int) -> Params:
    keys = jax.random.split(key, layers)
    blocks = [block_init(k, width, layers) for k in keys]
    # stack along a leading "layer" axis for lax.scan
    return {"blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)}


def block_apply(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    attn_fn=None,
) -> jnp.ndarray:
    kw = {} if attn_fn is None else {"attn_fn": attn_fn}
    x = x + mha(p["attn"], layer_norm(p["ln_1"], x), num_heads, mask, **kw)
    h = layer_norm(p["ln_2"], x)
    h = quick_gelu(linear(p["mlp"]["c_fc"], h))
    return x + linear(p["mlp"]["c_proj"], h)


def transformer_apply(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    attn_fn=None,
    remat=False,
    unroll: int = 1,
) -> jnp.ndarray:
    """Run the stacked blocks with ``lax.scan``.

    ``remat=True`` wraps the block in ``jax.checkpoint`` so the backward pass
    rematerializes activations (HBM for FLOPs — the standard TPU trade).
    ``remat`` may also name a ``jax.checkpoint_policies`` policy (e.g.
    ``"dots_with_no_batch_dims_saveable"``) for selective checkpointing:
    matmul outputs are saved, only cheap elementwise ops recompute in the
    backward — most of full remat's memory saving at a fraction of its
    recompute cost.

    ``unroll`` is passed to ``lax.scan``: >1 replicates the block body per
    scan iteration, letting XLA overlap/pipeline consecutive blocks at the
    cost of code size. (Each replica stays individually checkpointed when
    ``remat`` is on.)
    """
    def body(block_p, h):
        return block_apply(block_p, h, num_heads, mask, attn_fn)

    if isinstance(remat, str):
        body = jax.checkpoint(body, policy=getattr(jax.checkpoint_policies, remat))
    elif remat:
        body = jax.checkpoint(body)

    def step(h, block_p):
        return body(block_p, h), None

    out, _ = jax.lax.scan(step, x, p["blocks"], unroll=unroll)
    return out
