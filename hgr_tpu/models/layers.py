"""Functional building blocks shared by the CLIP encoders.

Pure ``init``/``apply`` functions over nested-dict parameter pytrees — no
module framework. Conventions (TPU/XLA-native, not torch):

- activations are ``[B, T, D]`` / images ``[B, H, W, C]`` (NHWC)
- linear weights are ``[in, out]`` (``y = x @ w + b``)
- conv weights are ``[kh, kw, cin, cout]`` (HWIO)
- compute dtype is configurable (bf16 by default); LayerNorm and softmax
  accumulate in fp32, mirroring the fp16-safe LayerNorm of the reference
  (``clip/model.py:153-159``) under bf16 instead of fp16.

BatchNorm is inference-mode only (frozen running stats, trainable affine):
the reference permanently runs its CLIP model in ``eval()`` even while
fine-tuning (``model/clip_tree.py:45``, ``main.py:46`` ``open_eval=True``), so
batch statistics are never updated — which maps exactly onto a stateless
frozen-stats BN here.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def _normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.normal(key, shape, dtype)


def linear_init(key, d_in: int, d_out: int, std: Optional[float] = None) -> Params:
    if std is None:
        std = d_in ** -0.5
    wk, _ = jax.random.split(key)
    return {
        "w": _normal(wk, (d_in, d_out), std),
        "b": jnp.zeros((d_out,), jnp.float32),
    }


def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def conv_init(key, kh: int, kw: int, cin: int, cout: int) -> Params:
    # He-uniform fan-in, matching torch Conv2d default init scale
    fan_in = kh * kw * cin
    bound = math.sqrt(1.0 / fan_in)
    return {"w": jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32, -bound, bound)}


def bn_init(dim: int) -> Params:
    return {
        "scale": jnp.ones((dim,), jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
        "mean": jnp.zeros((dim,), jnp.float32),
        "var": jnp.ones((dim,), jnp.float32),
    }


def mha_init(key, d_model: int, d_out: Optional[int] = None) -> Params:
    """Packed-QKV multi-head attention params (torch ``nn.MultiheadAttention``
    packing, so OpenAI checkpoints convert losslessly)."""
    d_out = d_out or d_model
    k1, k2 = jax.random.split(key)
    std = d_model ** -0.5
    return {
        "qkv": {"w": _normal(k1, (d_model, 3 * d_model), std), "b": jnp.zeros((3 * d_model,), jnp.float32)},
        "out": {"w": _normal(k2, (d_model, d_out), std), "b": jnp.zeros((d_out,), jnp.float32)},
    }


# ---------------------------------------------------------------------------
# apply fns
# ---------------------------------------------------------------------------

def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """fp32-internal LayerNorm (bf16-safe), output in input dtype."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mean).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def conv2d(p: Params, x: jnp.ndarray, stride: int = 1, padding: int = 0) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def batch_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode BN folded into one fused multiply-add."""
    inv = jax.lax.rsqrt(p["var"] + eps) * p["scale"]
    return (x * inv.astype(x.dtype)) + (p["bias"] - p["mean"] * inv).astype(x.dtype)


def avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


def attention_scores(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference (XLA) scaled-dot-product attention over ``[B, H, T, Dh]``.

    fp32 softmax accumulation; ``mask`` is additive ``[Tq, Tk]``.
    """
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def mha(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    attn_fn=attention_scores,
) -> jnp.ndarray:
    """Packed-QKV self-attention on ``[B, T, D]``."""
    B, T, D = x.shape
    qkv = linear(p["qkv"], x)  # [B, T, 3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, T, num_heads, D // num_heads).transpose(0, 2, 1, 3)

    out = attn_fn(heads(q), heads(k), heads(v), mask)  # [B, H, T, Dh]
    out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
    return linear(p["out"], out)


def causal_mask(T: int) -> np.ndarray:
    """Additive causal mask, ``0`` on/below diagonal, ``-inf`` above
    (reference ``clip/model.py:324-330``)."""
    m = np.full((T, T), -np.inf, dtype=np.float32)
    return np.triu(m, k=1)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)
