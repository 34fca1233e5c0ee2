"""Model zoo API: the reference's ``clip.available_models()`` / ``clip.load``
surface (``clip/clip.py:25-185``) adapted to a zero-egress world.

The reference downloads sha256-verified TorchScript checkpoints from OpenAI.
Here ``load`` takes a local checkpoint path (converted on the fly from the
torch format via ``models/convert.py``) or initializes randomly; the expected
sha256 digests of the official checkpoints are kept so a provided file can
still be verified.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import jax

from .clip import CLIPConfig, CONFIGS, clip_init, get_config

# sha256 prefixes of the official OpenAI checkpoint files, from their
# published URLs (clip/clip.py:25-32 embeds these digests in the URL path)
OFFICIAL_SHA256 = {
    "RN50": "afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762",
    "RN101": "8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599",
    "RN50x4": "7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd",
    "RN50x16": "52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa",
    "ViT-B/32": "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af",
    "ViT-B/16": "5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f",
}


def available_models() -> List[str]:
    """Names of the supported architectures (reference ``clip/clip.py:35``)."""
    return [k for k in CONFIGS if not k.startswith("TEST")]


def verify_checkpoint(path: str, name: str) -> bool:
    """sha256-check a local checkpoint against the official digest."""
    want = OFFICIAL_SHA256.get(name)
    if want is None:
        return False
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest() == want


def load(
    name: str,
    checkpoint: Optional[str] = None,
    seed: int = 0,
    verify: bool = False,
) -> Tuple[CLIPConfig, dict]:
    """-> (cfg, params). With ``checkpoint`` set, converts the torch file
    (TorchScript archive or plain state_dict); otherwise random init."""
    cfg = get_config(name)
    if checkpoint:
        if verify and not verify_checkpoint(checkpoint, name):
            raise ValueError(
                f"checkpoint {checkpoint} does not match the official "
                f"{name} sha256"
            )
        from .convert import load_torch_checkpoint

        ck_cfg, params = load_torch_checkpoint(checkpoint)
        return ck_cfg, params
    return cfg, clip_init(jax.random.PRNGKey(seed), cfg)
