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


def restore_params(path: str) -> Any:
    """Restore only the params tree ({"clip": ..., "layer_weight": ...}) —
    the test/warm-start path (``--load`` / ``--fetch``), which needs no
    optimizer structure."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(os.path.abspath(path))
    return raw["params"]


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
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(os.path.abspath(path))
