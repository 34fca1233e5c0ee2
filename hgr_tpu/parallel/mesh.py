"""Device mesh + sharding conventions.

The whole framework uses ONE 2-D logical mesh:

- ``data``  — batch dimension (images); replaces the reference's
  single-GPU loop (no DP existed upstream, SURVEY §2.5)
- ``model`` — the class axis: the [N=18,278, D] class-embedding bank and the
  [B, N] logit matrix shard here so the bank scales past one chip's HBM and
  the logit matmul + top-k ride ICI collectives.

Parameters are replicated (RN50/ViT-B fit per chip easily); activations are
batch-sharded. All collectives are emitted by GSPMD from sharding
constraints, or explicitly inside ``shard_map`` for the merged top-k path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA = "data"
MODEL = "model"


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create the global 2-D ``(data, model)`` mesh.

    ``data=-1`` takes all remaining devices after ``model`` shards.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model < 1 or n % model:
        raise ValueError(f"model axis {model} must divide device count {n}")
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA, MODEL))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Leading batch axis over ``data``."""
    return NamedSharding(mesh, P(DATA))


def bank_sharded(mesh: Mesh) -> NamedSharding:
    """[N, D] class bank: class axis over ``model``."""
    return NamedSharding(mesh, P(MODEL, None))


def logits_sharded(mesh: Mesh) -> NamedSharding:
    """[B, N] logits: batch over ``data``, classes over ``model``."""
    return NamedSharding(mesh, P(DATA, MODEL))
