"""Pallas fused hierarchical-argmax over the class-logit matrix.

The hierarchical metrics need, per eval batch: the constrained argmax over
{candidate classes at depth(chain[j])} for every ancestor-chain position j
(<= 13 of them), plus the unconstrained candidate argmax (TOR). Done naively
(the reference's per-level ``index_fill`` + topk, ``main.py:162-176``, or
our lax.scan in eval/metrics.py) every level re-reads the full [B, N] logit
matrix from HBM — ~15 passes over ~38MB per batch, which is the eval-loop's
actual bandwidth bill once the encoder is fast.

This kernel computes ALL level argmaxes in ONE pass: the logit matrix is
tiled over N; each tile is loaded into VMEM once and the running
(max, argmax) registers for every level live in VMEM scratch across the
sequential TPU grid. Tie-breaking matches ``jnp.argmax`` (first maximum).

Level slots: ``levels[ℓ] >= 0`` constrains to nodes of that depth;
``levels[ℓ] == -1`` means "all candidates" (the TOR slot); both intersect
``train_mask``. An XLA fallback with identical semantics is provided for
CPU/tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e9


def level_argmax_xla(
    logits: jnp.ndarray,      # [B, N] fp32
    levels: jnp.ndarray,      # [L] int32 (depth per slot; -1 = all)
    node_depth: jnp.ndarray,  # [N] int32
    train_mask: jnp.ndarray,  # [N] bool
) -> jnp.ndarray:
    """Reference implementation -> preds [L, B] int32."""

    def one(carry, lev):
        mask = jnp.where(lev < 0, train_mask, (node_depth == lev) & train_mask)
        masked = jnp.where(mask[None, :], logits, NEG)
        return carry, jnp.argmax(masked, axis=1).astype(jnp.int32)

    _, preds = jax.lax.scan(one, None, levels)
    return preds


def _kernel(levels_ref, logits_ref, depth_ref, train_ref,
            preds_ref, best_val, best_idx):
    import jax.experimental.pallas as pl

    # grid = (B tiles, N tiles); N is innermost so the (max, argmax)
    # scratch accumulates across N for one batch tile, then emits
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    L = best_val.shape[0]
    B = logits_ref.shape[0]
    TN = logits_ref.shape[1]

    @pl.when(i == 0)
    def _init():
        best_val[:] = jnp.full(best_val.shape, NEG, jnp.float32)
        best_idx[:] = jnp.zeros(best_idx.shape, jnp.int32)

    tile = logits_ref[:]                      # [B, TN] fp32
    depth = depth_ref[0]                      # [TN] int32
    train = train_ref[0] != 0                 # [TN]
    col = jax.lax.broadcasted_iota(jnp.int32, (B, TN), 1) + i * TN

    def level_body(l, _):
        lev = levels_ref[l]
        # lev < 0 means "all candidates"; fold the scalar into the
        # comparison (select on bool vectors is unsupported by Mosaic)
        mask = ((depth == lev) | (lev < 0)) & train               # [TN]
        vals = jnp.where(mask[None, :], tile, NEG)                # [B, TN]
        tmax = jnp.max(vals, axis=1)                              # [B]
        # first-maximum index within the tile
        hit = vals == tmax[:, None]
        targ = jnp.min(jnp.where(hit, col, jnp.int32(2**30)), axis=1)
        better = tmax > best_val[l, :]
        best_idx[l, :] = jnp.where(better, targ, best_idx[l, :])
        best_val[l, :] = jnp.where(better, tmax, best_val[l, :])
        return 0

    jax.lax.fori_loop(0, L, level_body, 0)

    @pl.when(i == n_tiles - 1)
    def _emit():
        preds_ref[:] = best_idx[:]


@functools.partial(
    jax.jit, static_argnames=("tile_n", "tile_b", "interpret")
)
def level_argmax_pallas(
    logits: jnp.ndarray,      # [B, N] fp32, N % tile_n == 0
    levels: jnp.ndarray,      # [L] int32
    node_depth: jnp.ndarray,  # [N] int32
    train_mask: jnp.ndarray,  # [N] bool
    tile_n: int = 2048,
    tile_b: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N = logits.shape
    L = levels.shape[0]
    assert N % tile_n == 0, f"N={N} not divisible by tile_n={tile_n}"
    tile_b = min(B, tile_b)
    pad_b = (-B) % tile_b
    if pad_b:
        logits = jnp.pad(logits, ((0, pad_b), (0, 0)), constant_values=NEG)
    Bp = B + pad_b
    grid = (Bp // tile_b, N // tile_n)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, tile_n), lambda b, i, *_: (b, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda b, i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda b, i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, tile_b), lambda b, i, *_: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L, tile_b), jnp.float32),
            pltpu.VMEM((L, tile_b), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, Bp), jnp.int32),
        interpret=interpret,
    )(
        levels.astype(jnp.int32),
        logits.astype(jnp.float32),
        node_depth.astype(jnp.int32)[None, :],
        train_mask.astype(jnp.int32)[None, :],
    )
    return out[:, :B]


def level_argmax_sorted(
    logits_sorted: jnp.ndarray,       # [B, N] logits in depth-sorted class order
    level_offsets: Tuple[int, ...],   # static: start offset of each depth; len L+1
    train_mask_sorted: jnp.ndarray,   # [N] bool in sorted order
) -> jnp.ndarray:
    """Depth-sorted fast path: with the class axis permuted so each depth is
    a contiguous column range, every level's constrained argmax is an argmax
    over a STATIC slice — all levels together read the logit matrix once
    (instead of once per level), with no masking at all. The TOR slot (last
    row) is the train-masked argmax over everything.

    Returns preds [n_levels + 1, B] as SORTED-space indices; map back to
    global node ids via the permutation.
    """
    B = logits_sorted.shape[0]
    outs = []
    for d in range(len(level_offsets) - 1):
        lo, hi = level_offsets[d], level_offsets[d + 1]
        if hi - lo == 0:
            outs.append(jnp.zeros((B,), jnp.int32))
            continue
        sl = logits_sorted[:, lo:hi]
        m = train_mask_sorted[lo:hi]
        sl = jnp.where(m[None, :], sl, NEG)
        outs.append((jnp.argmax(sl, axis=1) + lo).astype(jnp.int32))
    full = jnp.where(train_mask_sorted[None, :], logits_sorted, NEG)
    outs.append(jnp.argmax(full, axis=1).astype(jnp.int32))
    return jnp.stack(outs)


def level_argmax(
    logits, levels, node_depth, train_mask, use_pallas: bool = True,
    tile_n: int = 2048, interpret: bool = False,
):
    """Dispatcher: pallas on TPU, XLA elsewhere / when shapes don't tile."""
    B, N = logits.shape
    on_tpu = jax.default_backend() not in ("cpu",)
    if use_pallas and on_tpu and N % tile_n == 0:
        return level_argmax_pallas(
            logits, levels, node_depth, train_mask, tile_n=tile_n,
            interpret=interpret,
        )
    return level_argmax_xla(logits, levels, node_depth, train_mask)
