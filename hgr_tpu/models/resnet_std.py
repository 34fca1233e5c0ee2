"""Standard (torchvision-style) ResNet-50, NHWC — the frozen feature
extractor used by the DGP/CNZSL/FREE baselines.

Behavioural equivalent of the reference's vendored torchvision-style ResNet
(``baseline/DGP/models/resnet.py``; used frozen at
``baseline/FREE/train_free.py:171-186``, ``baseline/CNZSL/cnzsl.py``):
7x7/2 conv stem + maxpool, post-activation bottlenecks, global average pool
-> 2048-d features (``base`` mode) or fc logits. Weight layout converts from
a torchvision ``state_dict`` via :func:`convert_torch_resnet`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .layers import Params, batch_norm, bn_init, conv2d, conv_init

LAYERS_50 = (3, 4, 6, 3)
EXP = 4


def _block_init(key, cin: int, planes: int, stride: int) -> Params:
    k1, k2, k3, kd = jax.random.split(key, 4)
    p: Params = {
        "conv1": conv_init(k1, 1, 1, cin, planes),
        "bn1": bn_init(planes),
        "conv2": conv_init(k2, 3, 3, planes, planes),
        "bn2": bn_init(planes),
        "conv3": conv_init(k3, 1, 1, planes, planes * EXP),
        "bn3": bn_init(planes * EXP),
    }
    if stride != 1 or cin != planes * EXP:
        p["downsample"] = {
            "conv": conv_init(kd, 1, 1, cin, planes * EXP),
            "bn": bn_init(planes * EXP),
        }
    return p


def _bn_eval(p: Params, x, path: str):
    return batch_norm(p, x)


def _block_apply(p: Params, x, stride: int, bn=_bn_eval, path: str = ""):
    out = jax.nn.relu(bn(p["bn1"], conv2d(p["conv1"], x), f"{path}/bn1"))
    out = jax.nn.relu(
        bn(p["bn2"], conv2d(p["conv2"], out, stride=stride, padding=1),
           f"{path}/bn2")
    )
    out = bn(p["bn3"], conv2d(p["conv3"], out), f"{path}/bn3")
    if "downsample" in p:
        idn = bn(
            p["downsample"]["bn"],
            conv2d(p["downsample"]["conv"], x, stride=stride),
            f"{path}/downsample/bn",
        )
    else:
        idn = x
    return jax.nn.relu(out + idn)


def resnet50_init(key, num_classes: int = 1000) -> Params:
    keys = jax.random.split(key, 6)
    p: Params = {
        "conv1": conv_init(keys[0], 7, 7, 3, 64),
        "bn1": bn_init(64),
    }
    cin = 64
    for li, (blocks, planes) in enumerate(
        zip(LAYERS_50, (64, 128, 256, 512)), start=1
    ):
        bkeys = jax.random.split(keys[li], blocks)
        stride = 1 if li == 1 else 2
        blist = [_block_init(bkeys[0], cin, planes, stride)]
        cin = planes * EXP
        for b in range(1, blocks):
            blist.append(_block_init(bkeys[b], cin, planes, 1))
        p[f"layer{li}"] = blist
    p["fc"] = {
        "w": 0.01 * jax.random.normal(keys[5], (2048, num_classes)),
        "b": jnp.zeros((num_classes,)),
    }
    return p


def _max_pool_3x3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )


def resnet50_features(p: Params, x: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[B, H, W, 3] -> pooled [B, 2048] features (the baselines' frozen
    extractor output, e.g. ``baseline/CNZSL/cnzsl.py`` feature_encoder)."""
    x = x.astype(dtype)
    x = jax.nn.relu(batch_norm(p["bn1"], conv2d(p["conv1"], x, stride=2, padding=3)))
    x = _max_pool_3x3s2(x)
    for li, blocks in enumerate(LAYERS_50, start=1):
        for b in range(blocks):
            stride = 2 if (li > 1 and b == 0) else 1
            x = _block_apply(p[f"layer{li}"][b], x, stride)
    return x.mean(axis=(1, 2))


def resnet50_logits(p: Params, x: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    f = resnet50_features(p, x, dtype)
    return f @ p["fc"]["w"].astype(f.dtype) + p["fc"]["b"].astype(f.dtype)


def bn_train(bp: Params, y: jnp.ndarray, momentum: float = 0.1):
    """Train-mode BatchNorm: normalize with the BIASED batch variance,
    update running stats with the UNBIASED one at ``momentum`` — exactly
    ``torch.nn.BatchNorm2d.train()`` semantics (pinned by
    ``tests/test_refit.py`` against torch). Returns
    ``(out, {"mean", "var"})`` with the momentum-folded running stats."""
    yf = y.astype(jnp.float32)
    mean = yf.mean(axis=(0, 1, 2))
    var = yf.var(axis=(0, 1, 2))  # biased: what torch normalizes with
    inv = jax.lax.rsqrt(var + 1e-5) * bp["scale"]
    out = (y * inv.astype(y.dtype)) + (bp["bias"] - mean * inv).astype(y.dtype)
    n = y.shape[0] * y.shape[1] * y.shape[2]
    unbiased = var * (n / max(n - 1, 1))
    return out, {
        "mean": (1 - momentum) * bp["mean"] + momentum * mean,
        "var": (1 - momentum) * bp["var"] + momentum * unbiased,
    }


def resnet50_features_train(
    p: Params, x: jnp.ndarray, dtype=jnp.bfloat16, momentum: float = 0.1
):
    """Train-mode forward: BN normalizes with BATCH statistics and the
    momentum-updated running stats are returned — torch ``BatchNorm2d``
    train semantics (normalize with biased batch var, update running var
    with the unbiased one, default momentum 0.1). The reference's stage-A'
    refit trains the backbone in exactly this mode
    (``baseline/DGP/train_resnet_fit.py:55`` ``model.train()``).

    Returns ``(features [B, 2048], bn_stats)`` where ``bn_stats`` maps
    slash-paths (e.g. ``layer2/0/downsample/bn``) to
    ``{"mean": ..., "var": ...}`` — apply with :func:`apply_bn_stats`.
    """
    stats: Dict[str, Any] = {}

    def bn(bp, y, path):
        out, stats[path] = bn_train(bp, y, momentum)
        return out

    x = x.astype(dtype)
    x = jax.nn.relu(
        bn(p["bn1"], conv2d(p["conv1"], x, stride=2, padding=3), "bn1")
    )
    x = _max_pool_3x3s2(x)
    for li, blocks in enumerate(LAYERS_50, start=1):
        for b in range(blocks):
            stride = 2 if (li > 1 and b == 0) else 1
            x = _block_apply(
                p[f"layer{li}"][b], x, stride, bn=bn,
                path=f"layer{li}/{b}",
            )
    return x.mean(axis=(1, 2)), stats


def apply_bn_stats(p: Params, stats: Dict[str, Any]) -> Params:
    """Fold :func:`resnet50_features_train`'s running-stat updates back into
    a param tree (pure: returns a new tree; ``mean``/``var`` buffers only)."""
    out = jax.tree_util.tree_map(lambda v: v, p)  # shallow-ish copy
    for path, upd in stats.items():
        node = out
        parts = path.split("/")
        for part in parts[:-1]:
            key = int(part) if part.isdigit() else part
            node = node[key]
        bp = dict(node[parts[-1]])
        bp["mean"], bp["var"] = upd["mean"], upd["var"]
        node[parts[-1]] = bp
    return out


def convert_torch_resnet(sd: Dict[str, Any]) -> Params:
    """torchvision resnet50 state_dict -> this param tree."""

    def n_(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().float().numpy()
        return np.asarray(x, np.float32)

    def conv(name):
        return {"w": jnp.asarray(n_(sd[f"{name}.weight"]).transpose(2, 3, 1, 0))}

    def bn(name):
        return {
            "scale": jnp.asarray(n_(sd[f"{name}.weight"])),
            "bias": jnp.asarray(n_(sd[f"{name}.bias"])),
            "mean": jnp.asarray(n_(sd[f"{name}.running_mean"])),
            "var": jnp.asarray(n_(sd[f"{name}.running_var"])),
        }

    p: Params = {"conv1": conv("conv1"), "bn1": bn("bn1")}
    for li, blocks in enumerate(LAYERS_50, start=1):
        blist = []
        for b in range(blocks):
            base = f"layer{li}.{b}"
            bp: Params = {
                "conv1": conv(f"{base}.conv1"),
                "bn1": bn(f"{base}.bn1"),
                "conv2": conv(f"{base}.conv2"),
                "bn2": bn(f"{base}.bn2"),
                "conv3": conv(f"{base}.conv3"),
                "bn3": bn(f"{base}.bn3"),
            }
            if f"{base}.downsample.0.weight" in sd:
                bp["downsample"] = {
                    "conv": conv(f"{base}.downsample.0"),
                    "bn": bn(f"{base}.downsample.1"),
                }
            blist.append(bp)
        p[f"layer{li}"] = blist
    if "fc.weight" in sd:
        p["fc"] = {
            "w": jnp.asarray(n_(sd["fc.weight"]).T),
            "b": jnp.asarray(n_(sd["fc.bias"])),
        }
    return p
