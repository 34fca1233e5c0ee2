"""Modified ResNet image encoder (CLIP's RN50 family), NHWC / TPU-native.

Behavioural equivalent of the reference ``ModifiedResNet``
(``clip/model.py:94-150``): 3-conv stem with avgpool, anti-aliased strided
bottlenecks (avgpool before the stride-1 conv), and an attention-pool head.

TPU-native choices vs the reference:
- NHWC layout + HWIO conv weights (XLA's native TPU conv layout)
- the attention pool computes attention for the single mean-token query only
  ([B,1,D] q against [B,HW+1,D] k/v) instead of full (HW+1)x(HW+1)
  self-attention discarded down to row 0 as torch's
  ``F.multi_head_attention_forward`` does (``clip/model.py:66-90``) — exactly
  the same output, ~50x fewer attention FLOPs.
- BatchNorm is frozen-stats (see layers.py).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from .layers import (
    Params,
    avg_pool,
    batch_norm,
    bn_init,
    conv2d,
    conv_init,
    linear,
    linear_init,
)

EXPANSION = 4


def bottleneck_init(key, inplanes: int, planes: int, stride: int) -> Params:
    k1, k2, k3, kd = jax.random.split(key, 4)
    p: Params = {
        "conv1": conv_init(k1, 1, 1, inplanes, planes),
        "bn1": bn_init(planes),
        "conv2": conv_init(k2, 3, 3, planes, planes),
        "bn2": bn_init(planes),
        "conv3": conv_init(k3, 1, 1, planes, planes * EXPANSION),
        "bn3": bn_init(planes * EXPANSION),
    }
    if stride > 1 or inplanes != planes * EXPANSION:
        p["downsample"] = {
            "conv": conv_init(kd, 1, 1, inplanes, planes * EXPANSION),
            "bn": bn_init(planes * EXPANSION),
        }
    return p


def bottleneck_apply(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    out = jax.nn.relu(batch_norm(p["bn1"], conv2d(p["conv1"], x)))
    out = jax.nn.relu(batch_norm(p["bn2"], conv2d(p["conv2"], out, padding=1)))
    if stride > 1:
        out = avg_pool(out, stride)
    out = batch_norm(p["bn3"], conv2d(p["conv3"], out))
    if "downsample" in p:
        idn = x
        if stride > 1:
            idn = avg_pool(idn, stride)
        idn = batch_norm(p["downsample"]["bn"], conv2d(p["downsample"]["conv"], idn))
    else:
        idn = x
    return jax.nn.relu(out + idn)


def attnpool_init(key, spacial_dim: int, embed_dim: int, output_dim: int) -> Params:
    kp, kq, kk, kv, kc = jax.random.split(key, 5)
    std = embed_dim ** -0.5
    return {
        "positional_embedding": std
        * jax.random.normal(kp, (spacial_dim * spacial_dim + 1, embed_dim)),
        "q": linear_init(kq, embed_dim, embed_dim, std),
        "k": linear_init(kk, embed_dim, embed_dim, std),
        "v": linear_init(kv, embed_dim, embed_dim, std),
        "c": linear_init(kc, embed_dim, output_dim, std),
    }


def attnpool_apply(p: Params, x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """x: [B, H, W, C] -> [B, output_dim] (mean-token-query attention pool)."""
    B, H, W, C = x.shape
    tokens = x.reshape(B, H * W, C)
    mean = tokens.mean(axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1)  # [B, HW+1, C]
    tokens = tokens + p["positional_embedding"].astype(tokens.dtype)

    q = linear(p["q"], tokens[:, :1])  # only the mean-token query matters
    k = linear(p["k"], tokens)
    v = linear(p["v"], tokens)
    Dh = C // num_heads

    def heads(t, T):
        return t.reshape(B, T, num_heads, Dh).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q, 1), heads(k, H * W + 1), heads(v, H * W + 1)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * (Dh ** -0.5), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(vh.dtype), vh)
    out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)
    return linear(p["c"], out)[:, 0]


def resnet_init(
    key,
    layers: Sequence[int],
    output_dim: int,
    heads: int,
    input_resolution: int = 224,
    width: int = 64,
) -> Params:
    keys = jax.random.split(key, 8)
    p: Params = {
        "conv1": conv_init(keys[0], 3, 3, 3, width // 2),
        "bn1": bn_init(width // 2),
        "conv2": conv_init(keys[1], 3, 3, width // 2, width // 2),
        "bn2": bn_init(width // 2),
        "conv3": conv_init(keys[2], 3, 3, width // 2, width),
        "bn3": bn_init(width),
    }
    inplanes = width
    for li, (blocks, planes, kk) in enumerate(
        zip(layers, [width, width * 2, width * 4, width * 8], keys[3:7]), start=1
    ):
        stride = 1 if li == 1 else 2
        bkeys = jax.random.split(kk, blocks)
        blist: List[Params] = [bottleneck_init(bkeys[0], inplanes, planes, stride)]
        inplanes = planes * EXPANSION
        for b in range(1, blocks):
            blist.append(bottleneck_init(bkeys[b], inplanes, planes, 1))
        p[f"layer{li}"] = blist
    embed_dim = width * 32
    p["attnpool"] = attnpool_init(
        keys[7], input_resolution // 32, embed_dim, output_dim
    )
    return p


def s2d_stem_conv1(w: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """conv1 (3x3, stride 2, pad 1, in=3) re-expressed as a 2x2 stride-1
    conv over a 2x2 space-to-depth view of the input — bit-identical math
    (`tests/test_ops.py::test_s2d_stem_matches_conv1`), but 12 input
    channels instead of 3, the standard TPU ResNet-stem transform for
    better MXU tiling of the stem GEMM.

    Derivation: output (i, j) reads input rows 2i-1..2i+1 (pad 1); under
    2x2 blocking those rows live in block-rows i-1..i, so the kernel
    becomes 2x2 over blocks with padding (1, 0). The 3x3 taps sit at
    offsets 1..3 of the blocks' 4-row window, so the kernel is zero-padded
    to 4x4 at offset (1, 1) then regrouped to [2, 2, 4*Cin, Cout] in the
    same (dh, dw, c) channel order as the space-to-depth input."""
    B, H, W, C = x.shape
    cout = w.shape[-1]
    xs = (
        x.reshape(B, H // 2, 2, W // 2, 2, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, H // 2, W // 2, 4 * C)
    )
    w4 = jnp.zeros((4, 4, C, cout), w.dtype).at[1:4, 1:4].set(w)
    w2 = (
        w4.reshape(2, 2, 2, 2, C, cout)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(2, 2, 4 * C, cout)
    )
    return jax.lax.conv_general_dilated(
        xs,
        w2.astype(xs.dtype),
        window_strides=(1, 1),
        padding=[(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def resnet_apply(
    p: Params,
    x: jnp.ndarray,  # [B, H, W, 3]
    layers: Sequence[int],
    heads: int,
    dtype=jnp.bfloat16,
    s2d_stem: bool = False,
) -> jnp.ndarray:
    x = x.astype(dtype)
    if s2d_stem:
        x = jax.nn.relu(batch_norm(p["bn1"], s2d_stem_conv1(p["conv1"]["w"], x)))
    else:
        x = jax.nn.relu(
            batch_norm(p["bn1"], conv2d(p["conv1"], x, stride=2, padding=1))
        )
    x = jax.nn.relu(batch_norm(p["bn2"], conv2d(p["conv2"], x, padding=1)))
    x = jax.nn.relu(batch_norm(p["bn3"], conv2d(p["conv3"], x, padding=1)))
    x = avg_pool(x, 2)
    for li, blocks in enumerate(layers, start=1):
        for b in range(blocks):
            stride = 2 if (li > 1 and b == 0) else 1
            x = bottleneck_apply(p[f"layer{li}"][b], x, stride)
    return attnpool_apply(p["attnpool"], x, heads)
