"""The OM hierarchy-aware contrastive loss as ONE batched device step.

The reference computes this loss with a Python double loop over the ancestor
chain, one text-encoder forward+backward per (outer, inner) pair, plus a
detach-clone trick to defer the image-encoder backward
(``model/clip_tree.py:222-281``). TPU restructuring:

1. the host builds a padded pair schedule (see ``sampling.py``)
2. the device encodes the image batch once, text-encodes the DE-DUPLICATED
   union of all compare sets once ([U, T] -> [U, D]),
3. gathers per-pair features [P, C, D], computes all pair logits in one
   einsum, applies masked cross-entropy with per-pair hierarchy weights,
4. and takes ONE backward through the summed loss — JAX autodiff makes the
   reference's ``img_feats.backward(img_feats_.grad)`` trick
   (``model/clip_tree.py:226,280``) unnecessary; the gradients are
   mathematically identical because repeated text encodes of the same prompt
   contribute additive grads exactly like a shared encode.

Loss layout:  loss = sum_p valid_p * w_in[p] * w_out[p] * CE_p
where CE_p is the batch-mean cross-entropy of pair p's compare set — the same
accumulation the reference performs serially (``loss_j.backward()`` per pair
then summing the scalars).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.clip import CLIPConfig, encode_image, encode_text
from ..models.layers import l2_normalize
from .weights import pair_weights


def resolve_weight_modes(training_method: str, weights: str, weighting: str) -> Tuple[str, str]:
    """(in_mode, out_mode) per the reference's weighting switch
    (``model/clip_tree.py:264-272``); the hierarchical method always uses
    ``weights`` on its single loop (``:308``)."""
    if training_method == "hierarchical":
        return weights, "equal"
    if weighting == "out":
        return "equal", weights
    if weighting == "in":
        return weights, "equal"
    return weights, weights  # "both"


def pair_ce_loss(
    img: jnp.ndarray,            # [B, D] normalized image features
    tfeat: jnp.ndarray,          # [U, D] normalized text features
    sched: Dict[str, jnp.ndarray],
    layer_weight: jnp.ndarray,
    scale: jnp.ndarray,          # exp(logit_scale)
    *,
    in_mode: str,
    out_mode: str,
) -> jnp.ndarray:
    """Masked weighted pair cross-entropy given already-encoded features —
    the post-encoder part of the OM step, shared by the single-device and
    SPMD paths (reference ``model/clip_tree.py:261-279``)."""
    pair_feats = tfeat[sched["inv"]]                           # [P, C, D]
    logits = (
        jnp.einsum("bd,pcd->pbc", img, pair_feats, preferred_element_type=jnp.float32)
        * scale
    )                                                          # [P, B, C]
    neg_inf = jnp.asarray(-1e9, logits.dtype)
    logits = jnp.where(sched["compare_valid"][:, None, :], logits, neg_inf)

    logp = jax.nn.log_softmax(logits, axis=-1)                 # [P, B, C]
    lab = sched["label"][:, None, None]                        # [P, 1, 1]
    ce = -jnp.take_along_axis(logp, jnp.broadcast_to(lab, logp.shape[:2] + (1,)), axis=2)
    ce = ce[..., 0].mean(axis=1)                               # [P]

    w_in = pair_weights(in_mode, sched["in_pos"], sched["in_len"], layer_weight)
    w_out = pair_weights(out_mode, sched["out_pos"], sched["out_len"], layer_weight)
    w = jnp.where(sched["pair_valid"], w_in * w_out, 0.0)
    return jnp.sum(ce * w)


def om_loss(
    params: Any,                 # {"clip": clip params, "layer_weight": [L]}
    images: jnp.ndarray,         # [B, H, W, 3]
    node_tokens: jnp.ndarray,    # [N_pad, T] int32 (full prompt bank)
    sched: Dict[str, jnp.ndarray],  # device-side PairSchedule arrays
    *,
    clip_cfg: CLIPConfig,
    dtype,
    in_mode: str,
    out_mode: str,
    remat: bool = False,
    text_fn: Callable = None,
) -> jnp.ndarray:
    clip_params = params["clip"]

    img = encode_image(clip_params, clip_cfg, images, dtype=dtype, remat=remat)
    img = l2_normalize(img)                                   # [B, D]

    if text_fn is None:
        toks = node_tokens[sched["unique"]]                    # [U, T]
        tfeat = encode_text(clip_params, clip_cfg, toks, dtype=dtype, remat=remat)
        tfeat = l2_normalize(tfeat)                            # [U, D]
    else:
        # variant text path (e.g. the CoOp prompt learner): maps class ids
        # to normalized features using whatever trainable leaves it needs
        tfeat = text_fn(params, sched["unique"])               # [U, D]

    scale = jnp.exp(clip_params["logit_scale"])
    return pair_ce_loss(
        img, tfeat, sched, params["layer_weight"], scale,
        in_mode=in_mode, out_mode=out_mode,
    )


def make_om_loss_fn(
    clip_cfg: CLIPConfig,
    dtype,
    training_method: str,
    weights: str,
    weighting: str,
    remat: bool = False,
    text_fn: Callable = None,
) -> Callable:
    in_mode, out_mode = resolve_weight_modes(training_method, weights, weighting)
    return functools.partial(
        om_loss,
        clip_cfg=clip_cfg,
        dtype=dtype,
        in_mode=in_mode,
        out_mode=out_mode,
        remat=remat,
        text_fn=text_fn,
    )
