"""hgr_tpu — a TPU-native framework for large-scale hierarchical zero-shot
image classification.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
WilliamYi96/HGR-Net (ECCV 2022): CLIP RN50/ViT encoders, WordNet-hierarchy-aware
"OM" contrastive fine-tuning, and 18,278-way zero-shot evaluation with flat
Hit@k and hierarchical TOR/POR/path metrics, designed TPU-first:

- functional core: pure ``init``/``apply`` functions over parameter pytrees
- one 2-D device mesh ``(data, model)``; the class-embedding bank and the
  [B, 18278] logit matmul shard over ``model``, images over ``data``
- static shapes + padding/masking everywhere so XLA tiles onto the MXU
- kernel choices settled by on-chip measurement: depth-sorted one-pass
  level argmax in the eval hot path; Pallas fused attention kept opt-in
  (XLA wins at CLIP sequence lengths — docs/SCALING.md "Negative results")
- bf16 compute with fp32 master params and optimizer state (replacing the
  reference's manual fp16<->fp32 swap dance, reference utils.py:98-123)

Top-level API::

    from hgr_tpu import Config, Hierarchy, TreeModel, ZeroShotClassifier
"""

__version__ = "0.1.0"

from .config import Config  # noqa: E402

__all__ = ["Config", "Hierarchy", "TreeModel", "ZeroShotClassifier"]


def __getattr__(name):
    # lazy imports so `import hgr_tpu` stays light (no jax init)
    if name == "Hierarchy":
        from .hierarchy import Hierarchy

        return Hierarchy
    if name == "TreeModel":
        from .tree_model import TreeModel

        return TreeModel
    if name == "ZeroShotClassifier":
        from .serve import ZeroShotClassifier

        return ZeroShotClassifier
    raise AttributeError(name)
