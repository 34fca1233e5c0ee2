from .clip import (
    CLIPConfig,
    CONFIGS,
    clip_init,
    cosine_logits,
    encode_image,
    encode_text,
    get_config,
)
from .layers import l2_normalize

__all__ = [
    "CLIPConfig",
    "CONFIGS",
    "clip_init",
    "cosine_logits",
    "encode_image",
    "encode_text",
    "get_config",
    "l2_normalize",
]
