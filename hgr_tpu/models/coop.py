"""CoOp learned-prompt variant (prompt-context optimization).

Behavioural rebuild of the reference's CoOp modules
(``model/CoOp.py:31-162``: ``PromptLearner`` with 16 learned context vectors
and end/middle/front class-token placement; ``TextEncoder`` running the CLIP
text transformer on prompt *embeddings*) and the ``tree_coop`` wrapper
(``model/clip_coop.py:21-235``).

TPU-first memory layout: the reference precomputes and stores per-class
prefix/suffix *embedding* buffers ([N, 61, 512] — >1GB at 18,278 classes,
``model/CoOp.py:121-124``). Here we store only:

- ``tokenized [N, 77]`` int32 — the "X X .. X <name>." prompt tokens
- ``ctx_map   [N, 77]`` int32 — which context vector fills each slot (-1 =
  keep the token's own embedding)

and materialize embeddings in-graph for just the classes in the current
compare set: gather token embeddings, scatter in the trainable ``ctx`` rows,
run the causal transformer, pool at argmax(tokens) (EOT has the highest id).
The end/middle/front placements become different precomputed ``ctx_map``
layouts instead of per-class Python concatenation loops
(``model/CoOp.py:106-160``).

Known reference quirks (not copied): the ``tree_coop`` OM path references
``compare_idx`` before assignment (``model/clip_coop.py:187-189``) and
*freezes* the prompt learner while training CLIP (``:72-76``); here the
trainable subset is a config choice (``ctx`` / ``clip`` / ``both``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .clip import CLIPConfig
from .layers import Params, causal_mask, l2_normalize, layer_norm
from .transformer import transformer_apply

N_CTX_DEFAULT = 16
POSITIONS = ("end", "middle", "front")


@dataclass
class CoopStatic:
    """Host-built static prompt layout (not trainable)."""

    tokenized: np.ndarray  # [N, T] int32
    ctx_map: np.ndarray    # [N, T] int32, ctx row index or -1
    n_ctx: int
    position: str


def build_coop_static(
    name_token_ids: Sequence[Sequence[int]],
    context_length: int,
    sot_id: int,
    eot_id: int,
    n_ctx: int = N_CTX_DEFAULT,
    position: str = "end",
    placeholder_id: int = 0,
) -> CoopStatic:
    """Assemble per-class prompt tokens + ctx slot maps.

    ``name_token_ids`` are the BPE ids of each class name (+ trailing period
    if desired), as the reference builds "X X .. X <name>." prompts
    (``model/CoOp.py:101-103``).
    """
    if position not in POSITIONS:
        raise ValueError(f"position {position!r} not in {POSITIONS}")
    n = len(name_token_ids)
    toks = np.zeros((n, context_length), np.int32)
    cmap = np.full((n, context_length), -1, np.int32)
    for i, name_ids in enumerate(name_token_ids):
        name_ids = list(name_ids)
        room = context_length - 2 - n_ctx
        if len(name_ids) > room:
            name_ids = name_ids[:room]
        L = len(name_ids)
        if position == "end":
            body_tokens = [placeholder_id] * n_ctx + name_ids
            body_ctx = list(range(n_ctx)) + [-1] * L
        elif position == "front":
            body_tokens = name_ids + [placeholder_id] * n_ctx
            body_ctx = [-1] * L + list(range(n_ctx))
        else:  # middle
            half = n_ctx // 2
            body_tokens = (
                [placeholder_id] * half + name_ids + [placeholder_id] * (n_ctx - half)
            )
            body_ctx = (
                list(range(half)) + [-1] * L + list(range(half, n_ctx))
            )
        row = [sot_id] + body_tokens + [eot_id]
        toks[i, : len(row)] = row
        cmap[i, 1 : 1 + len(body_ctx)] = body_ctx
    # EXACT truncation, same argument as the node-token bank
    # (tree_model.py): with a causal mask and EOT pooling, positions past
    # a prompt's EOT can never influence its feature. CoOp prompts are
    # sot + n_ctx + name + eot (~20-30 tokens), so dropping the
    # all-padding tail cuts the prompt-learner transformer cost ~2.4x at
    # T=77 (measured on-chip: the ctx-only CoOp step is text-dominated).
    # Rounded up to a lane-friendly multiple of 16, like the node bank.
    t_need = int(toks.argmax(axis=1).max()) + 1  # eot_id is the largest id
    t_trunc = min(context_length, max(16, ((t_need + 15) // 16) * 16))
    toks = np.ascontiguousarray(toks[:, :t_trunc])
    cmap = np.ascontiguousarray(cmap[:, :t_trunc])
    return CoopStatic(tokenized=toks, ctx_map=cmap, n_ctx=n_ctx, position=position)


def coop_ctx_init(key, n_ctx: int, width: int) -> jnp.ndarray:
    """Learned context vectors, N(0, 0.02) like the reference
    (``model/CoOp.py:97``)."""
    return 0.02 * jax.random.normal(key, (n_ctx, width))


def coop_encode_text(
    clip_params: Params,
    ctx: jnp.ndarray,            # [n_ctx, W] trainable context
    tokenized: jnp.ndarray,      # [U, T] int32 (gathered for current ids)
    ctx_map: jnp.ndarray,        # [U, T] int32
    cfg: CLIPConfig,
    dtype=jnp.bfloat16,
    remat: bool = False,
) -> jnp.ndarray:
    """Prompt-conditioned text features [U, D] (reference ``TextEncoder`` +
    ``PromptLearner.forward``, ``model/CoOp.py:40-52,106-160``)."""
    tp = clip_params["text"]
    T = tokenized.shape[1]
    emb = tp["token_embedding"].astype(dtype)[tokenized]          # [U, T, W]
    ctx_rows = ctx.astype(dtype)[jnp.clip(ctx_map, 0)]            # [U, T, W]
    emb = jnp.where((ctx_map >= 0)[..., None], ctx_rows, emb)
    x = emb + tp["positional_embedding"][:T].astype(dtype)
    mask = jnp.asarray(causal_mask(T))
    x = transformer_apply(
        tp["transformer"], x, cfg.transformer_heads, mask=mask, remat=remat
    )
    x = layer_norm(tp["ln_final"], x)
    eot = jnp.argmax(tokenized, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return pooled @ tp["text_projection"].astype(dtype)


def make_coop_text_fn(static: CoopStatic, cfg: CLIPConfig, dtype=jnp.bfloat16,
                      remat: bool = False):
    """Text-feature fn for the OM loss / classifier bank: maps class ids ->
    normalized features through the prompt learner.

    ``remat`` rematerializes the transformer blocks exactly like the
    standard text path — without it the prompt-learner backward keeps every
    text-transformer activation live, which at reference scale (batch 256,
    ~300-prompt compare sets) pushed the CoOp train step out of HBM."""
    tokenized = jnp.asarray(static.tokenized)
    ctx_map = jnp.asarray(static.ctx_map)

    def text_fn(params, ids):
        feats = coop_encode_text(
            params["clip"],
            params["coop_ctx"],
            tokenized[ids],
            ctx_map[ids],
            cfg,
            dtype=dtype,
            remat=remat,
        )
        return l2_normalize(feats)

    return text_fn
