"""Sharded zero-shot eval with explicit collectives (shard_map).

The plain jit path lets GSPMD all-gather the full [B, N] logit matrix when
the bank is model-sharded. This step keeps everything local and merges only
the tiny decision state over ICI:

- each (data, model) device computes LOCAL logits
  [B/data_shards, N/model_shards] against its bank shard,
- flat Hit@k: local top-maxk over the test-masked local logits, then an
  ``all_gather`` of (values, global ids) over ``model`` (S*k numbers per
  row instead of N) and a merge top-k,
- per-level constrained argmax + TOR: local masked argmax per level, then
  an all-gather + cross-shard max with first-max (lowest shard) tie-breaks —
  matching the single-device semantics exactly because the depth-sorted bank
  shards into contiguous global-id ranges,
- metric partial sums ``psum`` over ``data``.

Per batch the model-axis traffic is O(S * B * (maxk + L)) scalars instead of
O(B * N) logits — the class axis can grow past HBM without the eval step's
communication growing with it.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..eval.bank import bank_logits
from ..eval.metrics import FILL, NEG, TOPK, BatchMetrics
from .mesh import DATA, MODEL


def make_sharded_eval_step(tm, mesh: Mesh, topk: Sequence[int] = TOPK) -> Callable:
    """-> ``step(params, bank_sorted, images, target, chain, chain_len,
    chain_levels, valid) -> BatchMetrics`` with explicit collectives.

    ``bank_sorted`` is the depth-sorted [N_pad, D] bank; shard it with
    ``P(MODEL, None)`` before calling. ``images`` shard over ``data``.
    """
    n_pad = tm.n_pad
    maxk = max(topk)
    ks = np.asarray([k - 1 for k in topk])
    order_np = tm.depth_order
    depth_sorted = tm.node_depth[order_np]          # [N_pad]
    train_sorted = tm.train_mask[order_np]
    test_sorted = tm.test_mask[order_np]
    n_levels = tm.hier.max_depth + 1

    order = jnp.asarray(order_np)
    depth_s = jnp.asarray(depth_sorted)
    train_s = jnp.asarray(train_sorted)
    test_s = jnp.asarray(test_sorted)
    levels_all = jnp.asarray(list(range(n_levels)) + [-1], jnp.int32)

    def local_eval(params, bank_loc, images, target, chain, chain_len,
                   chain_levels, valid, depth_loc, train_loc, test_loc):
        # ---- local compute -------------------------------------------------
        feats = tm.encode_image_fn(params, images)          # [B_loc, D]
        logits = bank_logits(feats, bank_loc)               # [B_loc, N_loc]
        n_loc = logits.shape[1]
        shard = jax.lax.axis_index(MODEL)
        base = shard * n_loc                                 # sorted-space offset

        # flat top-k (test classes); a shard smaller than maxk contributes
        # all of its items, which keeps the merge exact
        k_loc = min(maxk, n_loc)
        masked = jnp.where(test_loc[None, :], logits, NEG)
        lv, li = jax.lax.top_k(masked, k_loc)                # [B_loc, k_loc]
        li = li + base
        gv = jax.lax.all_gather(lv, MODEL, axis=1)           # [B_loc, S, maxk]? -> concat
        gi = jax.lax.all_gather(li, MODEL, axis=1)
        gv = gv.reshape(gv.shape[0], -1)
        gi = gi.reshape(gi.shape[0], -1)
        mv, mi = jax.lax.top_k(gv, maxk)                     # merged values
        pred_sorted = jnp.take_along_axis(gi, mi, axis=1)    # [B_loc, maxk]
        pred = order[pred_sorted]                            # global node ids
        correct = (pred == target) & valid[:, None]
        csum = jnp.cumsum(correct, axis=1)
        hits = csum[:, jnp.asarray(ks)].sum(axis=0).astype(jnp.float32)

        # per-level argmax + TOR slot (local masked argmax, then merge).
        # Out-of-level TRAIN candidates stay in the race at FILL — the
        # reference's index_fill(-1) semantics (main.py:169-171): when a
        # whole level scores below -1 the winner leaves the level (metric
        # miss). Cross-shard first-max tie-breaking over equal FILL values
        # still matches single-device order because shards hold contiguous
        # sorted-id ranges and the merge picks the lowest shard.
        def one_level(carry, lev):
            in_level = (depth_loc == lev) | (lev < 0)
            vals = jnp.where(
                train_loc[None, :],
                jnp.where(in_level[None, :], logits, FILL),
                NEG,
            )
            a = jnp.argmax(vals, axis=1)
            v = jnp.take_along_axis(vals, a[:, None], axis=1)[:, 0]
            return carry, (v, a + base)

        _, (lvals, lidx) = jax.lax.scan(one_level, None, levels_all)
        # lvals/lidx: [L+1, B_loc]; merge across model shards
        g_vals = jax.lax.all_gather(lvals, MODEL)            # [S, L+1, B_loc]
        g_idx = jax.lax.all_gather(lidx, MODEL)
        best_shard = jnp.argmax(g_vals, axis=0)              # first max = lowest shard
        preds_sorted = jnp.take_along_axis(
            g_idx, best_shard[None], axis=0
        )[0]                                                 # [L+1, B_loc]
        preds_global = order[preds_sorted]

        # TOR
        tor_pred = preds_global[-1]
        in_chain = (tor_pred[:, None] == chain[None, :]) & (chain[None, :] >= 0)
        tor = ((in_chain.any(axis=1)) & valid).sum().astype(jnp.float32)

        # path / point from per-slot predictions
        lvl_preds = preds_global[chain_levels]               # [Lmax, B_loc]
        preds_rows = lvl_preds.T
        Lmax = chain.shape[0]
        pos_valid = jnp.arange(Lmax)[None, :] < chain_len
        match = (preds_rows == chain[None, :]) & pos_valid & valid[:, None]
        Lf = chain_len.astype(jnp.float32)
        point = (match.sum(axis=1).astype(jnp.float32) / Lf).sum()
        edge_pair = match[:, :-1] & match[:, 1:]
        pair_valid = (jnp.arange(Lmax - 1)[None, :] + 1) < chain_len
        edges = (edge_pair & pair_valid).sum().astype(jnp.float32)
        path_single = match[:, 0].sum().astype(jnp.float32)
        path = jnp.where(
            chain_len == 1, path_single, edges / jnp.maximum(Lf - 1.0, 1.0)
        )
        num = valid.sum().astype(jnp.float32)

        # ---- reduce over the data axis -------------------------------------
        out = BatchMetrics(hits=hits, tor=tor, path=path, point=point, num=num)
        return jax.tree.map(lambda x: jax.lax.psum(x, DATA), out)

    smapped = shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(
            P(),                 # params (replicated)
            P(MODEL, None),      # bank shard
            P(DATA),             # images
            P(), P(), P(), P(),  # target, chain, chain_len, chain_levels
            P(DATA),             # valid
            P(MODEL), P(MODEL), P(MODEL),  # depth/train/test (sorted) shards
        ),
        out_specs=BatchMetrics(
            hits=P(), tor=P(), path=P(), point=P(), num=P()
        ),
        check_rep=False,
    )

    @jax.jit
    def step(params, bank_sorted, images, target, chain, chain_len,
             chain_levels, valid):
        return smapped(
            params, bank_sorted, images, target, chain, chain_len,
            chain_levels, valid, depth_s, train_s, test_s,
        )

    def run(params, bank_sorted, images, target: int, valid=None):
        if valid is None:
            valid = jnp.ones(images.shape[0], bool)
        chain_np = tm.chains[target]
        lvls = np.where(chain_np >= 0, tm.hier.depth[np.maximum(chain_np, 0)], 0)
        return step(
            params, bank_sorted, images, jnp.asarray(target),
            jnp.asarray(chain_np), jnp.asarray(tm.chain_len[target]),
            jnp.asarray(lvls.astype(np.int32)), valid,
        )

    return run
