"""Real-image feature extraction for baseline (stage-B) evaluation.

The reference's DGP/CNZSL/FREE evaluation featurizes every eval batch
through the frozen ResNet-50 — ``feat = cnn(data)`` at
``baseline/DGP/evaluate_imagenet.py:84`` (run in fp16, ``:201``), after the
torchvision eval transform Resize(256) + CenterCrop(224) + ImageNet
normalization (``train_resnet_fit.py:32-41``; the eval dataset file is
missing upstream, the training file pins the constants). This module is the
TPU-native equivalent:

- :func:`load_backbone` — frozen weights from a torch checkpoint
  (``models/resnet_std.convert_torch_resnet``) or an Orbax pytree.
- :func:`make_featurizer` — one jitted uint8-[B, R, R, 3] -> [B, 2048] step:
  center-crop (the Resize(256)+CenterCrop(224) geometry: the loader's
  short-side resize to R=256 followed by a centered 224 crop is pixelwise
  the same), ImageNet-normalize, ResNet-50 forward. Normalization fuses
  into the first conv under jit; uint8 ships 4x less H2D than float32.
- :class:`FeatureFile` — precomputed per-class feature rows (.npz keyed by
  wnid), for corpora featurized once ahead of time (producer:
  ``tools/export_image_feats.py``), and as real TRAINING features for the
  CNZSL/FREE stages that consume seen-class features
  (``baseline/CNZSL/cnzsl.py`` feature loading, ``train_free.py:246-247``).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def load_backbone(path: str):
    """Frozen ResNet-50 params from ``path``.

    - ``*.pt`` / ``*.pth`` — a torch checkpoint (state_dict or module), the
      reference's ``--cnn`` input (``evaluate_imagenet.py:198-202``);
    - anything else — an Orbax pytree directory holding the param tree
      (saved via ``utils.checkpoint.save_pytree``).
    """
    if path.endswith((".pt", ".pth")):
        import torch

        from ..models.resnet_std import convert_torch_resnet

        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        return convert_torch_resnet(sd)
    from ..utils.checkpoint import load_pytree

    return load_pytree(path)


def preprocess_for_backbone(images, crop: int):
    """``[B, R, R, 3]`` uint8 or [0,1]-float -> ImageNet-normalized fp32
    center-crop of size ``crop``.

    Composed with the standard loader at resolution R=256 (short-side
    bicubic resize + centered 256 crop), ``crop=224`` selects pixelwise the
    same pixels as torchvision's Resize(256)+CenterCrop(224) — the
    reference's stage-B eval transform (``train_resnet_fit.py:32-41``);
    pinned by ``tests/test_baseline_runner.py::
    test_featurizer_preprocess_matches_torchvision_eval_transform``.
    """
    import jax.numpy as jnp

    from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD, crop_origin

    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    r = x.shape[1]
    if crop < r:
        # torchvision's half-to-even origin, NOT floor — differs by 1 px
        # when (r - crop) % 4 == 3 (e.g. resolution 227 / crop 224)
        off = crop_origin(r, crop)
        x = x[:, off : off + crop, off : off + crop, :]
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def make_featurizer(params, crop: int = 224, dtype=None):
    """Jitted ``[B, R, R, 3] uint8/float -> [B, 2048]`` frozen-feature step.

    ``crop < R`` reproduces torchvision's Resize(256)+CenterCrop(224): load
    images at resolution 256 through the standard loader (short-side resize
    + center crop to 256) and crop the central 224 here — the composition
    selects the identical pixels (see :func:`preprocess_for_backbone`).
    ``dtype`` defaults to bfloat16 (the MXU path; the reference runs this
    exact stage in fp16, same family).
    """
    import jax

    import jax.numpy as jnp

    from ..models.resnet_std import resnet50_features

    if dtype is None:
        dtype = jnp.bfloat16

    @jax.jit
    def feats(images):
        x = preprocess_for_backbone(images, crop)
        return resnet50_features(params, x, dtype=dtype).astype(jnp.float32)

    return feats


class FeatureFile:
    """Precomputed per-class features: an ``.npz`` of wnid -> [n_i, D] rows,
    row i aligned with the class's manifest path i. The accept-precomputed
    counterpart to on-the-fly CNN featurization (the reference's CNZSL/FREE
    consume exactly such per-class feature matrices)."""

    def __init__(self, path: str):
        self._z = np.load(path)
        self.dim = int(self._z[self._z.files[0]].shape[1])

    def rows(self, wnid: str) -> np.ndarray:
        if wnid not in self._z:
            raise KeyError(f"feature file has no class {wnid!r}")
        return np.asarray(self._z[wnid], np.float32)

    def take(self, wnid: str, idxs) -> np.ndarray:
        return self.rows(wnid)[np.asarray(idxs, np.int64)]


def with_bias_column(feats: np.ndarray, proto_dim: int) -> np.ndarray:
    """Append the DGP ones column when the classifier space is one wider
    than the feature space (``evaluate_imagenet.py:85``:
    ``torch.cat([feat, ones], 1)`` against [N, 2049] predicted fc rows)."""
    feats = np.asarray(feats, np.float32)
    if proto_dim == feats.shape[1] + 1:
        return np.concatenate(
            [feats, np.ones((feats.shape[0], 1), np.float32)], axis=1
        )
    return feats


def export_image_features(
    grouped: Dict[str, list],
    image_root: str,
    backbone_params,
    out_path: str,
    resolution: int = 256,
    crop: int = 224,
    batch: int = 64,
    num_threads: int = 8,
    num_procs: int = 0,
    dtype=None,
) -> str:
    """Featurize every image of ``grouped`` once -> ``.npz`` FeatureFile.

    The ahead-of-time counterpart of the reference's per-run ``cnn(data)``
    re-featurization: any corpus read more than once (CNZSL/FREE training
    epochs, repeated eval sweeps) pays the CNN exactly once.
    """
    from ..data.pipeline import FileImageSource, GroupedTestLoader

    feats_fn = make_featurizer(backbone_params, crop=crop, dtype=dtype)
    src = FileImageSource(resolution, image_root=image_root)
    loader = GroupedTestLoader(
        grouped,
        {c: i for i, c in enumerate(grouped)},
        src,
        batch,
        num_threads=num_threads,
        num_procs=num_procs,
    )
    names = list(grouped.keys())
    out: Dict[str, list] = {c: [] for c in names}
    try:
        for b in loader:
            f = np.asarray(feats_fn(b.images))
            out[names[b.target]].append(f[np.asarray(b.valid)])
    finally:
        loader.close()
    arrays = {c: np.concatenate(v, axis=0) for c, v in out.items() if v}
    np.savez(out_path, **arrays)
    return out_path
