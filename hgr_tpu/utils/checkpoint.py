"""Checkpoint save/restore via Orbax.

Improves on the reference's per-epoch ``torch.save(state_dict)``
(``model/clip_tree.py:76-78``) by checkpointing params AND optimizer state
AND step (the reference never saves optimizer moments — SURVEY appendix
item 7), while keeping the same path-encodes-config convention
``{folder}/{exp_name}/{weights}_{out_ratio}_{in_ratio}/clip_{epoch}``
and the reference's resume flags:

- ``fetch``/``fetch_path``: warm-start params only (low-shot from a ZSL
  checkpoint, reference ``model/clip_tree.py:36-37``)
- ``load``/``load_path``/``from_epoch``: restore for testing / resuming
  (``model/clip_tree.py:38-43``, ``main.py:256``)
"""

from __future__ import annotations

import os
from typing import Any, Optional


def _ckpt_dir(save_path: str, epoch: int) -> str:
    return os.path.abspath(os.path.join(save_path, f"clip_{epoch}"))


def save_checkpoint(save_path: str, epoch: int, state: Any) -> str:
    """Save a TrainState (or any object with params/opt_state/step) to
    ``{save_path}/clip_{epoch}`` as a plain dict."""
    import orbax.checkpoint as ocp

    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    path = _ckpt_dir(save_path, epoch)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


class AsyncCheckpointSaver:
    """Overlap checkpoint disk I/O with the next epoch's compute.

    Orbax's ``StandardCheckpointer`` is an async checkpointer: ``save``
    returns once the arrays are copied off the devices (so later donating
    train steps cannot clobber them) and commits to disk in a background
    thread. The blocking ``save_checkpoint`` above waits for that commit
    every call — the same stall as the reference's per-epoch ``torch.save``
    (``model/clip_tree.py:76-78``). This saver instead waits only for the
    PREVIOUS save before launching the next (at most one outstanding write),
    and ``close()`` / context-exit waits for the tail, so epoch N's
    checkpoint writes behind epoch N+1's training.

        with AsyncCheckpointSaver() as saver:
            for epoch in ...:
                ...train...
                saver.save(save_path, epoch, state)

    Pass ``keep=N`` to retain only the N newest checkpoints on disk
    (``--keep_checkpoints``; 0 keeps every epoch — the reference behaviour).
    Pruning runs only over checkpoints already committed (after waiting for
    the previous write), so a crash can never leave fewer than ``keep``
    complete checkpoints behind.
    """

    def __init__(self, keep: int = 0):
        import orbax.checkpoint as ocp

        self._ckptr = ocp.StandardCheckpointer()
        self.keep = int(keep)

    def _prune(self, save_path: str) -> None:
        if self.keep <= 0 or not os.path.isdir(save_path):
            return
        import shutil

        epochs = sorted(
            int(n.split("_", 1)[1])
            for n in os.listdir(save_path)
            if n.startswith("clip_") and n.split("_", 1)[1].isdigit()
        )
        for e in epochs[: -self.keep]:
            shutil.rmtree(_ckpt_dir(save_path, e), ignore_errors=True)
            try:
                os.remove(_ckpt_dir(save_path, e) + ".meta.json")
            except FileNotFoundError:
                pass

    def save(self, save_path: str, epoch: int, state: Any,
             meta: Optional[dict] = None) -> str:
        self._ckptr.wait_until_finished()  # at most one outstanding write
        self._prune(save_path)  # everything on disk is committed now
        path = _ckpt_dir(save_path, epoch)
        self._ckptr.save(
            path,
            {
                "params": state.params,
                "opt_state": state.opt_state,
                "step": state.step,
            },
            force=True,
        )
        if meta is not None:
            # sidecar for mid-epoch resume ({steps_done, steps_per_epoch});
            # written synchronously — it is tiny, and must never describe a
            # checkpoint that has not started writing
            import json

            with open(path + ".meta.json", "w") as f:
                json.dump(meta, f)
        self._last_path = save_path
        return path

    def close(self) -> None:
        self._ckptr.wait_until_finished()
        if getattr(self, "_last_path", None):
            self._prune(self._last_path)

    def __enter__(self):
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def _restore_host(path: str) -> Any:
    """Restore a checkpoint as host numpy arrays, ignoring the shardings it
    was saved with. A default (no-target) Orbax restore replays the saved
    device layout, which fails when the checkpoint was written on different
    hardware (e.g. TPU-trained, CPU-served); numpy leaves are placed on
    whatever devices first touch them instead."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path).item_metadata
    if meta is None:
        raise FileNotFoundError(
            f"{path} is not an Orbax checkpoint (expected a clip_<epoch> "
            "directory, e.g. {folder}/{exp_name}/{weights}_{out}_{in}/clip_3)"
        )
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta.tree
    )
    return ckptr.restore(path, restore_args=restore_args)


def restore_params(path: str) -> Any:
    """Restore only the params tree ({"clip": ..., "layer_weight": ...}) —
    the test/warm-start path (``--load`` / ``--fetch``), which needs no
    optimizer structure. Device-agnostic (see ``_restore_host``), then
    placed on the default backend: leaves must be jax arrays, not numpy —
    consumers that close over params and index them with traced values
    (e.g. the CoOp token-embedding gather inside the bank scan) would
    otherwise hit TracerArrayConversionError."""
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, _restore_host(path)["params"])


def restore_checkpoint(path: str, like: Any) -> Any:
    """Full structured restore for resume; ``like`` is a TrainState-shaped
    object supplying structure/shape/dtype."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": like.params,
        "opt_state": like.opt_state,
        "step": like.step,
    }
    restored = ckptr.restore(os.path.abspath(path), payload)
    return type(like)(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )


def read_ckpt_meta(save_path: str, epoch: int) -> Optional[dict]:
    """The ``clip_{epoch}.meta.json`` sidecar ({steps_done, steps_per_epoch})
    written by :class:`AsyncCheckpointSaver`, or None (older checkpoints)."""
    import json

    try:
        with open(_ckpt_dir(save_path, epoch) + ".meta.json") as f:
            return json.load(f)
    except (FileNotFoundError, ValueError):
        return None


def latest_epoch(save_path: str) -> Optional[int]:
    """Highest ``clip_{epoch}`` under ``save_path``, or None."""
    if not os.path.isdir(save_path):
        return None
    best = None
    for name in os.listdir(save_path):
        if name.startswith("clip_"):
            try:
                e = int(name.split("_", 1)[1])
            except ValueError:
                continue
            best = e if best is None else max(best, e)
    return best


def save_pytree(path: str, tree: Any) -> str:
    """Save an arbitrary pytree (baseline artifacts: GCN params + predicted
    classifiers — the reference's ``.pth`` + ``.pred`` pair,
    ``baseline/DGP/train_gcn_dense_att.py:13-15``)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def load_pytree(path: str) -> Any:
    """Device-agnostic pytree load (see ``_restore_host``)."""
    return _restore_host(path)
