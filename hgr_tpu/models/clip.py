"""CLIP container: dual encoders + logit scale, model zoo configs.

Behavioural equivalent of the reference ``CLIP`` (``clip/model.py:239-352``)
and its shape-sniffing ``build_model`` (``clip/model.py:395-432``): here the
architectures are explicit configs instead (RN50/RN101/RN50x4/RN50x16,
ViT-B/32, ViT-B/16 — the reference's 6-model zoo at ``clip/clip.py:25-32``),
plus tiny configs for tests and synthetic benchmarks.

All apply fns are pure: ``encode_image(params, cfg, images)`` etc.; wrap in
``jax.jit``/``pjit`` at the call site.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .layers import Params, l2_normalize
from .resnet import resnet_apply, resnet_init
from .text_encoder import text_encoder_apply, text_encoder_init
from .vit import vit_apply, vit_init


@dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 1024
    # vision
    image_resolution: int = 224
    vision_layers: Tuple[int, ...] = (3, 4, 6, 3)  # tuple => ModifiedResNet; int-like 1-tuple? see vit flag
    vision_width: int = 64
    vision_patch_size: int = 0  # 0 => ResNet, >0 => ViT
    # text
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12

    @property
    def is_vit(self) -> bool:
        return self.vision_patch_size > 0

    @property
    def vision_heads(self) -> int:
        if self.is_vit:
            return self.vision_width // 64
        return self.vision_width * 32 // 64


# Model zoo (hyperparameters of the public OpenAI checkpoints).
CONFIGS: Dict[str, CLIPConfig] = {
    "RN50": CLIPConfig(),
    "RN101": CLIPConfig(
        embed_dim=512, vision_layers=(3, 4, 23, 3), transformer_width=512
    ),
    "RN50x4": CLIPConfig(
        embed_dim=640,
        image_resolution=288,
        vision_layers=(4, 6, 10, 6),
        vision_width=80,
        transformer_width=640,
        transformer_heads=10,
    ),
    "RN50x16": CLIPConfig(
        embed_dim=768,
        image_resolution=384,
        vision_layers=(6, 8, 18, 8),
        vision_width=96,
        transformer_width=768,
        transformer_heads=12,
    ),
    "ViT-B/32": CLIPConfig(
        embed_dim=512,
        vision_layers=(12,),
        vision_width=768,
        vision_patch_size=32,
        transformer_width=512,
    ),
    "ViT-B/16": CLIPConfig(
        embed_dim=512,
        vision_layers=(12,),
        vision_width=768,
        vision_patch_size=16,
        transformer_width=512,
    ),
    # tiny configs for tests / CPU-runnable benchmarks
    "TEST-RN": CLIPConfig(
        embed_dim=64,
        image_resolution=32,
        vision_layers=(1, 1, 1, 1),
        vision_width=16,
        context_length=77,
        vocab_size=512,
        transformer_width=32,
        transformer_heads=2,
        transformer_layers=2,
    ),
    "TEST-ViT": CLIPConfig(
        embed_dim=64,
        image_resolution=32,
        vision_layers=(2,),
        vision_width=64,
        vision_patch_size=8,
        context_length=77,
        vocab_size=512,
        transformer_width=32,
        transformer_heads=2,
        transformer_layers=2,
    ),
}


def get_config(name: str) -> CLIPConfig:
    try:
        return CONFIGS[name]
    except KeyError:
        raise KeyError(f"unknown arch {name!r}; options: {sorted(CONFIGS)}")


def clip_init(key, cfg: CLIPConfig) -> Params:
    kv, kt = jax.random.split(key)
    if cfg.is_vit:
        visual = vit_init(
            kv,
            cfg.image_resolution,
            cfg.vision_patch_size,
            cfg.vision_width,
            cfg.vision_layers[0],
            cfg.embed_dim,
        )
    else:
        visual = resnet_init(
            kv,
            cfg.vision_layers,
            cfg.embed_dim,
            cfg.vision_heads,
            cfg.image_resolution,
            cfg.vision_width,
        )
    return {
        "visual": visual,
        "text": text_encoder_init(
            kt,
            cfg.vocab_size,
            cfg.context_length,
            cfg.transformer_width,
            cfg.transformer_layers,
            cfg.embed_dim,
        ),
        # ln(1/0.07), same init as the reference (clip/model.py:291)
        "logit_scale": jnp.asarray(math.log(1.0 / 0.07), jnp.float32),
    }


# CLIP preprocessing constants (reference clip/clip.py:76-77); used by the
# on-device normalization of raw-uint8 batches.
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def encode_image(
    p: Params,
    cfg: CLIPConfig,
    images: jnp.ndarray,  # [B, H, W, 3] pre-normalized float, or raw uint8
    dtype=jnp.bfloat16,
    attn_fn=None,
    remat: bool = False,
) -> jnp.ndarray:
    if images.dtype == jnp.uint8:
        # raw host->device edge (pipeline raw_uint8 mode): normalize on
        # device, fused by XLA into the stem conv's input pipeline. Static
        # dtype branch — resolved at trace time, no runtime cond. Arithmetic
        # in f32 so results match the host-normalized float path bit-for-bit
        # up to the usual compute-dtype cast.
        mean = jnp.asarray(CLIP_MEAN, jnp.float32) * 255.0
        scale = 1.0 / (jnp.asarray(CLIP_STD, jnp.float32) * 255.0)
        images = ((images.astype(jnp.float32) - mean) * scale).astype(dtype)
    if cfg.is_vit:
        return vit_apply(
            p["visual"],
            images,
            cfg.vision_patch_size,
            cfg.vision_heads,
            dtype=dtype,
            attn_fn=attn_fn,
            remat=remat,
        )
    return resnet_apply(
        p["visual"], images, cfg.vision_layers, cfg.vision_heads, dtype=dtype
    )


def encode_text(
    p: Params,
    cfg: CLIPConfig,
    tokens: jnp.ndarray,  # [B, T] int32
    dtype=jnp.bfloat16,
    attn_fn=None,
    remat: bool = False,
) -> jnp.ndarray:
    return text_encoder_apply(
        p["text"],
        tokens,
        cfg.transformer_heads,
        dtype=dtype,
        attn_fn=attn_fn,
        remat=remat,
    )


def cosine_logits(
    img_feats: jnp.ndarray, txt_feats: jnp.ndarray, logit_scale: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Normalized cosine logits [B, N]; optionally scaled by exp(logit_scale)."""
    a = l2_normalize(img_feats)
    b = l2_normalize(txt_feats)
    logits = jnp.einsum("bd,nd->bn", a, b, preferred_element_type=jnp.float32)
    if logit_scale is not None:
        logits = logits * jnp.exp(logit_scale)
    return logits
