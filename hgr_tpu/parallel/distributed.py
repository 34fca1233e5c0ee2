"""Multi-host initialization (pods / multi-slice).

The reference has no distributed backend at all (SURVEY §2.5). On TPU pods,
call :func:`init_distributed` once per host before any jax usage; the
``(data, model)`` mesh from ``mesh.py`` then spans all hosts — GSPMD keeps
intra-slice collectives on ICI and only crosses DCN when a mesh axis does.

Per-host data feeding: each host builds loader shards for its addressable
devices; :func:`host_local_batch_slice` gives the per-host slice of a global
batch so the grouped loaders can be instantiated with
``seed + process_index`` and per-host episode streams.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    Returns (process_index, process_count). Arguments default to the
    standard env variables (``COORDINATOR_ADDRESS`` etc.) or TPU metadata
    autodetection inside ``jax.distributed.initialize``.
    """
    want_multi = (
        coordinator_address
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if want_multi:
        # NB: do NOT probe jax.process_count() first — it initializes the
        # XLA backend, after which jax.distributed.initialize refuses to
        # run (caught by tests/test_multihost.py, which spawns a real
        # 2-process cluster). Instead attempt and tolerate the one benign
        # failure mode: having initialized already.
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:
            if "already" not in str(e).lower():
                raise
    return jax.process_index(), jax.process_count()


def host_local_batch_slice(global_batch: int) -> slice:
    """This host's contiguous slice of a [global_batch, ...] array."""
    per = global_batch // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
