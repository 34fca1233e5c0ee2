"""Serving API: batched zero-shot classification against the class bank.

The deployment-facing surface (the reference stops at an eval script): build
the classifier bank once, then classify image batches at full device speed —
flat top-k labels with cosine scores, plus hierarchical root-path prediction
via the same depth-sorted one-pass argmax the evaluator uses.

    clf = ZeroShotClassifier(tm)           # tm: a built TreeModel w/ params
    clf.refresh_bank()                     # re-encode prompts (e.g. after FT)
    ids, scores = clf.classify(images, k=5)
    paths = clf.predict_paths(images)      # [B, n_levels] global node ids
    wnids = clf.classify_files(paths_on_disk, k=5)
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .eval.bank import bank_logits
from .eval.metrics import NEG
from .ops.bank_topk import level_argmax_sorted


class ZeroShotClassifier:
    """Batched zero-shot inference over a TreeModel's class bank.

    ``candidates``: "test" restricts predictions to unseen classes (the
    reference's zero-shot protocol), "train" to candidate classes, "all" to
    every real node.
    """

    def __init__(self, tm, candidates: str = "all"):
        self.tm = tm
        n = tm.hier.num_nodes
        real = np.zeros(tm.n_pad, bool)
        real[:n] = True
        mask = {
            "all": real,
            "test": tm.test_mask & real,
            "train": tm.train_mask & real,
        }[candidates]
        self._mask_sorted = jnp.asarray(mask[tm.depth_order])
        self._order = jnp.asarray(tm.depth_order)
        self._train_sorted = jnp.asarray(tm.train_mask[tm.depth_order])
        self.bank_sorted: Optional[jnp.ndarray] = None

    def refresh_bank(self, params=None) -> None:
        """(Re-)encode all node prompts into the depth-sorted bank."""
        bank = self.tm.update_classifier(params)
        self.bank_sorted = self.tm.sort_bank(bank)

    @functools.cached_property
    def _classify(self):
        order, mask = self._order, self._mask_sorted

        def fn(params, bank_sorted, images, k):
            feats = self.tm.encode_image_fn(params, images)
            logits = bank_logits(feats, bank_sorted)
            masked = jnp.where(mask[None, :], logits, NEG)
            vals, idx = jax.lax.top_k(masked, k)
            return order[idx], vals

        return jax.jit(fn, static_argnums=(3,))

    @functools.cached_property
    def _paths(self):
        order = self._order
        offsets = self.tm.level_offsets
        train_s = self._train_sorted

        def fn(params, bank_sorted, images):
            feats = self.tm.encode_image_fn(params, images)
            logits = bank_logits(feats, bank_sorted)
            # serving returns the best IN-LEVEL node per level; the metric
            # engines additionally apply the reference's -1 fill rule
            # (eval/metrics.FILL), which only converts matches to misses —
            # it never produces a better node to show a user
            preds_s, _vals = level_argmax_sorted(logits, offsets, train_s)
            return order[preds_s][:-1].T  # [B, n_levels], drop the TOR slot

        return jax.jit(fn)

    def classify(
        self, images, k: int = 5
    ) -> Tuple[np.ndarray, np.ndarray]:
        """[B, H, W, 3] float32 -> (node ids [B, k], cosine scores [B, k])."""
        if self.bank_sorted is None:
            self.refresh_bank()
        ids, vals = self._classify(
            self.tm.params, self.bank_sorted, jnp.asarray(images), k
        )
        return np.asarray(ids), np.asarray(vals)

    def predict_paths(self, images) -> np.ndarray:
        """Per-level constrained argmax -> [B, n_levels] global node ids
        (the hierarchical prediction the POR/path metrics score)."""
        if self.bank_sorted is None:
            self.refresh_bank()
        return np.asarray(
            self._paths(self.tm.params, self.bank_sorted, jnp.asarray(images))
        )

    def classify_files(
        self, paths: Sequence[str], k: int = 5, batch: int = 64,
        image_root: str = "", num_threads: int = 8, num_procs: int = 0,
    ) -> List[List[Tuple[str, float]]]:
        """Decode files (native C++ fast path) and classify; returns per-image
        [(wnid, score), ...] lists. ``num_procs > 0`` decodes in worker
        PROCESSES (data/mp_decode.py) — the scaling path for many-core
        serving hosts, same as the eval loaders' ``--num_proc_workers``."""
        from .data import FileImageSource

        src = FileImageSource(self.tm.clip_cfg.image_resolution, image_root)
        names = self.tm.hier.names
        out: List[List[Tuple[str, float]]] = []
        from concurrent.futures import ThreadPoolExecutor

        mp_pool = None
        if num_procs > 0:
            from .data.mp_decode import ProcessDecodePool

            mp_pool = ProcessDecodePool(
                self.tm.clip_cfg.image_resolution, batch,
                image_root=image_root, num_workers=num_procs,
            )
        try:
            with ThreadPoolExecutor(max_workers=num_threads) as pool:
                for s in range(0, len(paths), batch):
                    chunk = list(paths[s : s + batch])
                    if mp_pool is not None:
                        # a missing/corrupt file falls back to itself (fails
                        # loudly) — serving has no "class's first image"
                        imgs = list(mp_pool.decode_pairs(
                            [(p, p) for p in chunk]
                        ))
                    else:
                        imgs = list(
                            pool.map(lambda p: src.load("", [p], 0), chunk)
                        )
                    # keep the source dtype: raw uint8 batches are normalized
                    # ON DEVICE by encode_image (models/clip.py) — an astype
                    # to float here would silently skip that normalization
                    arr = np.stack(imgs)
                    ids, vals = self.classify(arr, k)
                    for row_ids, row_vals in zip(ids, vals):
                        out.append(
                            [(names[int(i)], float(v))
                             for i, v in zip(row_ids, row_vals)]
                        )
        finally:
            if mp_pool is not None:
                mp_pool.close()
        return out


def main(argv=None) -> None:
    """CLI serving entry: ``python -m hgr_tpu.serve IMG [IMG ...] [flags]``.

    Serving-specific flags are parsed here; every other flag is forwarded to
    the standard :class:`~hgr_tpu.config.Config` parser, so model/checkpoint
    selection works exactly as in ``main.py`` (``--arch``, ``--graph_path``,
    ``--load --load_path`` / ``--from_epoch``, ``--synthetic True`` for a
    weightless smoke run, ...). Emits one JSON line per image:
    ``{"image": ..., "topk": [{"wnid", "name", "score"}, ...]}``.

    The reference stops at batch eval scripts (``main.py:104-222``); this is
    new deployment surface, sharing the jitted bank/top-k path the evaluator
    uses.
    """
    import argparse
    import json as _json

    parser = argparse.ArgumentParser(
        "hgr_tpu.serve",
        description="Zero-shot classify image files against the class bank.",
    )
    parser.add_argument("images", nargs="+", help="image files to classify")
    parser.add_argument("--k", type=int, default=5, help="top-k to emit")
    parser.add_argument(
        "--candidates", default="all", choices=["all", "test", "train"],
        help="restrict predictions (the reference ZSL protocol uses 'test')",
    )
    parser.add_argument("--image_root", default="", dest="serve_image_root",
                        help="prefix joined to relative image paths")
    parser.add_argument(
        "--num_procs", type=int, default=0, dest="serve_num_procs",
        help="decode in N worker processes (many-core serving hosts)",
    )
    ns, rest = parser.parse_known_args(argv)

    from .config import Config
    from .driver import build_hierarchy, build_model

    import os as _os

    config = Config.from_args(rest)
    hier, splits = build_hierarchy(config)
    tm = build_model(config, hier, splits)
    clf = ZeroShotClassifier(tm, candidates=ns.candidates)
    clf.refresh_bank()
    names = None
    if config.names_path and _os.path.exists(config.names_path):
        with open(config.names_path) as f:
            names = _json.load(f)
    results = clf.classify_files(
        ns.images, k=ns.k, image_root=ns.serve_image_root,
        num_procs=ns.serve_num_procs,
    )
    for path, topk in zip(ns.images, results):
        print(_json.dumps({
            "image": path,
            "topk": [
                {"wnid": w,
                 **({"name": names[w]} if names and w in names else {}),
                 "score": round(s, 4)}
                for w, s in topk
            ],
        }))


if __name__ == "__main__":
    main()
