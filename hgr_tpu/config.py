"""Single dataclass config with CLI overrides.

Preserves the reference's flag names, defaults, and semantics
(``main.py:14-70``) while replacing per-entry-point argparse sprawl with one
typed config. Extra TPU-native knobs (mesh shape, dtype, pallas toggles) live
in their own section.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field, fields
from typing import List, Optional


def _parse_bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("true", "1", "yes"):
        return True
    if v.lower() in ("false", "0", "no"):
        return False
    raise argparse.ArgumentTypeError(f"expected bool, got {v!r}")


@dataclass
class Config:
    # experiment (reference main.py:16-21)
    exp_name: str = "HGR"
    folder: str = "adaptive"
    print_freq: int = 1000
    debug: bool = False
    test_after_train: bool = False
    # accepted for reference-command compatibility (main.py:18 selects
    # `cuda:{device}`); meaningless on TPU — device placement is JAX's, and
    # multi-chip layout comes from --mesh_data/--mesh_model
    device: int = 0

    # model (main.py:24)
    arch: str = "RN50"

    # imagenet split selection (main.py:27-31)
    template: str = "TEMPLATES_SIMPLE"  # reference declared TEMPLATES_STANDARD but
    # hard-coded TEMPLATES_SIMPLE in the model (clip_tree.py:52); here the flag
    # is honoured, defaulting to the behaviour the reference actually had.
    model_train: str = "all"
    model_test: str = "rest"
    data_train: str = "train"
    data_test: str = "rest"

    # data (main.py:34-43)
    graph_path: str = "data/process_results/graph_edges_cls.json"
    split_path: str = "data/process_results/splits_for_tree.json"
    num_workers: int = 12
    # decode worker PROCESSES (0 = thread pool). The thread pool serializes
    # per-image Python on the GIL; set this ~= host cores on many-core hosts
    # to scale decode like the reference's 12-process DataLoader
    # (imagenet_group.py:105). See data/mp_decode.py + docs/SCALING.md.
    num_proc_workers: int = 0
    # ahead-of-time decode cache root (data/decode_cache.py): per split, a
    # one-time pass decodes the manifest into a uint8 memmap under
    # {decode_cache}/{split}; later runs replay rows at memcpy speed
    # (measured 61x less host CPU than JPEG decode — docs/SCALING.md)
    decode_cache: str = ""
    # retain only the N newest clip_{epoch} checkpoints on disk (0 = keep
    # every epoch, the reference behaviour); pruning is crash-safe — only
    # committed checkpoints beyond the newest N are removed
    keep_checkpoints: int = 0
    batch_size: int = 256
    test_batch_size: int = 512
    k_shots: int = -1
    serial_batches: bool = True
    n_episodes: int = -1
    data_split_train: str = "train"
    data_split_test: str = "zsl_test"
    hops_path: str = ""  # optional splits_for_hops.json; merges hop2/hop3/... keys
    max_test_batches: int = -1  # cap eval batches (quick validation runs)
    image_root: str = ""  # prefix joined to manifest-relative image paths
    trace_dir: str = ""  # capture a jax profiler trace (xprof) of early
    # train steps into this directory (utils/profiling.TraceWindow)

    # train (main.py:46-62)
    open_eval: bool = True  # reference: True keeps the model in eval() during
    # fine-tuning (frozen BN stats, main.py:77-79); this framework's BN is
    # frozen-stats by construction, so False (train-mode BN) is intentionally
    # not supported — the reference never exercises it either
    train: bool = True
    lr: float = 3e-7
    w_lr: float = 1e-4
    epochs: int = 10
    wd: float = 0.0
    warmup_length: int = 0
    num_compare: int = 256
    weights: str = "adaptive"  # equal|increasing|decreasing|adaptive|nl_increasing|nl_decreasing
    training_method: str = "OM"  # flat|hierarchical|OM
    sample_strategy: str = "topk"  # random|simi|topk|near_simi|brothers
    k: int = 1
    out_ratio: float = 0.25
    in_ratio: float = 0.5
    weighting: str = "both"  # in|out|both
    scale: float = 1.0
    grad_clip: float = 1.0
    accum_steps: int = 1  # gradient accumulation (optax.MultiSteps)
    seed: int = 0

    # resume (main.py:65-69)
    fetch: bool = False
    fetch_path: str = ""
    load: bool = False
    load_path: str = "none"
    from_epoch: int = -1
    resume: bool = False  # full resume: params + optimizer state + step from
    # {save_path}/clip_{from_epoch} (the reference only restores weights —
    # SURVEY appendix item 7)

    # ---- CoOp learned-prompt variant (model/clip_coop.py, model/CoOp.py) --
    coop: bool = False
    n_ctx: int = 16                    # learned context vectors (CoOp.py:89)
    class_token_position: str = "end"  # end|middle|front (CoOp.py:106-160)
    coop_train: str = "clip"  # which leaves train: ctx|clip|both; the
    # reference tree_coop freezes the prompt learner and trains CLIP
    # (clip_coop.py:72-76); standard CoOp is "ctx"
    exclu_bro: bool = False   # exclude siblings from topk negatives
    # (clip_coop.py:111-115)

    # ---- synthetic mode (no ImageNet tree needed) -----------------------
    synthetic: bool = False
    synthetic_branching: int = 3
    synthetic_levels: int = 4
    synthetic_extra_edges: int = 5
    synthetic_images_per_class: int = 8

    # ---- TPU-native additions -------------------------------------------
    mesh_data: int = -1   # -1: all devices on the data axis
    mesh_model: int = 1   # shards of the class bank / logits
    dtype: str = "bfloat16"        # activation/compute dtype
    param_dtype: str = "float32"   # master params + optimizer state
    pallas_attention: bool = False # fused-attention kernel; OFF by default:
    # at CLIP's tiny sequence lengths (50-77 tokens) XLA's batched GEMMs beat
    # per-(batch,head) pallas programs (~1.5-1.8x, measured on v5e)
    remat: bool = True             # rematerialize encoder activations in backward
    # (required at reference scale: the non-remat OM backward over ~1.8k
    # deduped prompts exceeds compile-time memory on v5e)
    vocab_path: str = ""           # BPE merges file; "" = default search paths
    names_path: str = ""           # wnid -> class-name JSON (WordNet offline export)
    donate: bool = True

    def __post_init__(self):
        _check = {
            "weights": ("equal", "increasing", "decreasing", "adaptive",
                        "nl_increasing", "nl_decreasing"),
            "training_method": ("flat", "hierarchical", "OM"),
            "sample_strategy": ("random", "simi", "topk", "near_simi", "brothers"),
            "weighting": ("in", "out", "both"),
            "dtype": ("bfloat16", "float32"),
            "coop_train": ("ctx", "clip", "both"),
            "class_token_position": ("end", "middle", "front"),
        }
        for name, options in _check.items():
            v = getattr(self, name)
            if v not in options:
                raise ValueError(
                    f"--{name} {v!r} is not one of {options}"
                )

    @property
    def save_path(self) -> str:
        """Reference path convention ``{folder}/{exp_name}/{weights}_{out}_{in}/``
        (``model/clip_tree.py:24``)."""
        return f"{self.folder}/{self.exp_name}/{self.weights}_{self.out_ratio}_{self.in_ratio}"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_args(cls, argv: Optional[List[str]] = None) -> "Config":
        parser = argparse.ArgumentParser(description="HGR (TPU)")
        for f in fields(cls):
            if f.type == "bool" or isinstance(f.default, bool):
                # accept BOTH "--load True/False" (this CLI's style) and the
                # reference's bare store_true style "--load" / "--fetch"
                # (reference main.py:64-66), so its README commands run
                # verbatim
                parser.add_argument(
                    f"--{f.name}", type=_parse_bool, default=f.default,
                    nargs="?", const=True,
                )
            else:
                parser.add_argument(
                    f"--{f.name}", type=type(f.default), default=f.default
                )
        ns = parser.parse_args(argv)
        return cls(**vars(ns))
