"""OpenAI CLIP checkpoint (torch state_dict) -> hgr_tpu parameter pytree.

Handles the layout differences between the reference's torch modules
(``clip/model.py``) and this framework's TPU-native conventions:

- conv weights OIHW -> HWIO
- linear weights [out, in] -> [in, out]
- ``nn.MultiheadAttention`` packed ``in_proj_weight`` [3D, D] -> ``qkv.w`` [D, 3D]
- transformer blocks stacked along a leading layer axis (for ``lax.scan``)
- BatchNorm running stats kept (frozen-stats BN)

Also provides :func:`sniff_config`, the equivalent of the reference's
shape-sniffing ``build_model`` (``clip/model.py:395-432``), so a raw
state_dict can be loaded without knowing its architecture name.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from .clip import CLIPConfig
from .layers import Params


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def _conv(sd, name) -> Params:
    return {"w": jnp.asarray(_np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0))}


def _linear(sd, name) -> Params:
    return {
        "w": jnp.asarray(_np(sd[f"{name}.weight"]).T),
        "b": jnp.asarray(_np(sd[f"{name}.bias"])),
    }


def _ln(sd, name) -> Params:
    return {
        "scale": jnp.asarray(_np(sd[f"{name}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{name}.bias"])),
    }


def _bn(sd, name) -> Params:
    return {
        "scale": jnp.asarray(_np(sd[f"{name}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{name}.bias"])),
        "mean": jnp.asarray(_np(sd[f"{name}.running_mean"])),
        "var": jnp.asarray(_np(sd[f"{name}.running_var"])),
    }


def _block(sd, name) -> Params:
    return {
        "attn": {
            "qkv": {
                "w": jnp.asarray(_np(sd[f"{name}.attn.in_proj_weight"]).T),
                "b": jnp.asarray(_np(sd[f"{name}.attn.in_proj_bias"])),
            },
            "out": _linear(sd, f"{name}.attn.out_proj"),
        },
        "ln_1": _ln(sd, f"{name}.ln_1"),
        "mlp": {
            "c_fc": _linear(sd, f"{name}.mlp.c_fc"),
            "c_proj": _linear(sd, f"{name}.mlp.c_proj"),
        },
        "ln_2": _ln(sd, f"{name}.ln_2"),
    }


def _stack_blocks(sd, prefix: str, n: int) -> Params:
    import jax

    blocks = [_block(sd, f"{prefix}.resblocks.{i}") for i in range(n)]
    return {"blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)}


def _bottleneck(sd, name) -> Params:
    p: Params = {
        "conv1": _conv(sd, f"{name}.conv1"),
        "bn1": _bn(sd, f"{name}.bn1"),
        "conv2": _conv(sd, f"{name}.conv2"),
        "bn2": _bn(sd, f"{name}.bn2"),
        "conv3": _conv(sd, f"{name}.conv3"),
        "bn3": _bn(sd, f"{name}.bn3"),
    }
    if f"{name}.downsample.0.weight" in sd:
        p["downsample"] = {
            "conv": _conv(sd, f"{name}.downsample.0"),
            "bn": _bn(sd, f"{name}.downsample.1"),
        }
    return p


def sniff_config(sd: Mapping[str, Any]) -> CLIPConfig:
    """Infer the architecture from state_dict shapes (reference
    ``build_model``, ``clip/model.py:395-419``)."""
    is_vit = "visual.proj" in sd
    embed_dim = _np(sd["text_projection"]).shape[1]
    context_length = _np(sd["positional_embedding"]).shape[0]
    vocab_size = _np(sd["token_embedding.weight"]).shape[0]
    transformer_width = _np(sd["ln_final.weight"]).shape[0]
    transformer_layers = len(
        {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}
    )
    if is_vit:
        vision_width = _np(sd["visual.conv1.weight"]).shape[0]
        vision_layers = len(
            {k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks")}
        )
        patch = _np(sd["visual.conv1.weight"]).shape[-1]
        grid = round((_np(sd["visual.positional_embedding"]).shape[0] - 1) ** 0.5)
        resolution = patch * grid
        return CLIPConfig(
            embed_dim=embed_dim,
            image_resolution=resolution,
            vision_layers=(vision_layers,),
            vision_width=vision_width,
            vision_patch_size=patch,
            context_length=context_length,
            vocab_size=vocab_size,
            transformer_width=transformer_width,
            transformer_heads=transformer_width // 64,
            transformer_layers=transformer_layers,
        )
    counts = [
        len(
            {
                k.split(".")[2]
                for k in sd
                if k.startswith(f"visual.layer{i}")
            }
        )
        for i in (1, 2, 3, 4)
    ]
    vision_width = _np(sd["visual.layer1.0.conv1.weight"]).shape[0]
    grid = round((_np(sd["visual.attnpool.positional_embedding"]).shape[0] - 1) ** 0.5)
    resolution = grid * 32
    return CLIPConfig(
        embed_dim=embed_dim,
        image_resolution=resolution,
        vision_layers=tuple(counts),
        vision_width=vision_width,
        context_length=context_length,
        vocab_size=vocab_size,
        transformer_width=transformer_width,
        transformer_heads=transformer_width // 64,
        transformer_layers=transformer_layers,
    )


def convert_state_dict(sd: Mapping[str, Any], cfg: CLIPConfig) -> Params:
    """Convert a torch CLIP state_dict into this framework's param pytree."""
    if cfg.is_vit:
        visual: Params = {
            "conv1": _conv(sd, "visual.conv1"),
            "class_embedding": jnp.asarray(_np(sd["visual.class_embedding"])),
            "positional_embedding": jnp.asarray(_np(sd["visual.positional_embedding"])),
            "ln_pre": _ln(sd, "visual.ln_pre"),
            "transformer": _stack_blocks(sd, "visual.transformer", cfg.vision_layers[0]),
            "ln_post": _ln(sd, "visual.ln_post"),
            "proj": jnp.asarray(_np(sd["visual.proj"])),
        }
    else:
        visual = {
            "conv1": _conv(sd, "visual.conv1"),
            "bn1": _bn(sd, "visual.bn1"),
            "conv2": _conv(sd, "visual.conv2"),
            "bn2": _bn(sd, "visual.bn2"),
            "conv3": _conv(sd, "visual.conv3"),
            "bn3": _bn(sd, "visual.bn3"),
            "attnpool": {
                "positional_embedding": jnp.asarray(
                    _np(sd["visual.attnpool.positional_embedding"])
                ),
                "q": _linear(sd, "visual.attnpool.q_proj"),
                "k": _linear(sd, "visual.attnpool.k_proj"),
                "v": _linear(sd, "visual.attnpool.v_proj"),
                "c": _linear(sd, "visual.attnpool.c_proj"),
            },
        }
        for li, blocks in enumerate(cfg.vision_layers, start=1):
            visual[f"layer{li}"] = [
                _bottleneck(sd, f"visual.layer{li}.{b}") for b in range(blocks)
            ]

    return {
        "visual": visual,
        "text": {
            "token_embedding": jnp.asarray(_np(sd["token_embedding.weight"])),
            "positional_embedding": jnp.asarray(_np(sd["positional_embedding"])),
            "transformer": _stack_blocks(sd, "transformer", cfg.transformer_layers),
            "ln_final": _ln(sd, "ln_final"),
            "text_projection": jnp.asarray(_np(sd["text_projection"])),
        },
        "logit_scale": jnp.asarray(_np(sd["logit_scale"])),
    }


def load_torch_checkpoint(path: str):
    """Load an OpenAI CLIP ``.pt`` checkpoint file -> (cfg, params).

    Accepts both TorchScript archives and plain state_dicts, like the
    reference loader (``clip/clip.py:112-130``).
    """
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    cfg = sniff_config(sd)
    return cfg, convert_state_dict(sd, cfg)
