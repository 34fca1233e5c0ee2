"""Pallas fused attention for the CLIP encoders (TPU).

The reference relies on torch's ``nn.MultiheadAttention`` (cuDNN) —
``clip/model.py:178,66-90``. Here the whole softmax-attention for one
(batch, head) pair runs in a single Pallas program: scores, fp32 softmax and
the value contraction stay in VMEM, so the [T, T] score matrix never touches
HBM. CLIP sequences are short (77 text / 50..577 image tokens), so one
program per (batch*head) with the full sequence resident is the right shape:
at T=77, Dh=64 the working set is ~100KB — far under the ~16MB VMEM budget.

Use via ``mha(..., attn_fn=pallas_attention)`` (see models/layers.py); the
XLA path remains the default on CPU/tests. Outside jit the wrapper pads T up
to the fp32 sublane multiple (8) with masked slots.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import attention_scores


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    # blocks: q/k/v [1, T, Dh]; mask [T, T] additive fp32; out [1, T, Dh]
    q = q_ref[0].astype(jnp.float32)  # pre-scaled by Dh^-0.5 in the wrapper
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                          # [T, T]
    scores = scores + mask_ref[:]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_attention_padded(q, k, v, mask, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, T, Dh = q.shape
    grid = (B * H,)

    def reshape(t):
        return t.reshape(B * H, T, Dh)

    out = pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, Dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T, Dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, T, Dh), q.dtype),
        interpret=interpret,
    )(reshape(q), reshape(k), reshape(v), mask)
    return out.reshape(B, H, T, Dh)


def pallas_attention(
    q: jnp.ndarray,                   # [B, H, T, Dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,  # [T, T] additive or None
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for :func:`models.layers.attention_scores`."""
    B, H, T, Dh = q.shape
    # softmax scale uses the TRUE head dim; the kernel sees padded shapes
    q = q * (Dh ** -0.5)
    pad_t = (-T) % 8
    pad_d = (-Dh) % 128
    Tp, Dp = T + pad_t, Dh + pad_d
    m = jnp.zeros((Tp, Tp), jnp.float32)
    if mask is not None:
        m = m.at[:T, :T].set(mask.astype(jnp.float32))
    if pad_t:
        # padded key slots must never receive attention weight
        m = m.at[:, T:].set(-1e9)
    if pad_t or pad_d:
        pads = ((0, 0), (0, 0), (0, pad_t), (0, pad_d))
        q, k, v = (jnp.pad(t, pads) for t in (q, k, v))
    out = _pallas_attention_padded(q, k, v, m, interpret=interpret)
    return out[:, :, :T, :Dh]


def reference_attention(q, k, v, mask=None):
    """XLA fallback (identical math, models/layers.py)."""
    return attention_scores(q, k, v, mask)
