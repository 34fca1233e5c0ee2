"""CLIP flat fine-tune baseline: plain CE over seen-class cosine logits.

Behavioural rebuild of ``baseline/CLIP/clip_train.py``: encode the image
batch, encode the SEEN-class prompt bank, cross-entropy against the batch
labels, AdamW + StepLR(gamma 0.1, step 25), grad-clip, then the shared
hierarchical eval. The reference re-encodes all 983 seen-class prompts every
step (``clip_train.py:212-214``) — kept here (it's the semantics), but as
one batched encode inside the jitted step.

Node ordering: the reference's variant ``gen_tree`` orders seen classes
first (``clip_train.py:46-86``) so ``label = index into seen prompt bank``;
here labels are positions of the batch target within the provided
``seen_ids``, with no reordering of the hierarchy.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.clip import CLIPConfig, encode_image, encode_text
from ..models.layers import l2_normalize


def step_lr(base_lr: float, gamma: float = 0.1, step_size: int = 25):
    """torch StepLR equivalent (``clip_train.py:254``), stepped per epoch."""

    def schedule(epoch):
        e = jnp.asarray(epoch, jnp.float32)
        return base_lr * gamma ** jnp.floor(e / step_size)

    return schedule


def make_flat_loss_fn(clip_cfg: CLIPConfig, dtype):
    def loss_fn(params, images, seen_tokens, labels):
        img = l2_normalize(
            encode_image(params["clip"], clip_cfg, images, dtype=dtype)
        )
        txt = l2_normalize(
            encode_text(params["clip"], clip_cfg, seen_tokens, dtype=dtype)
        )
        scale = jnp.exp(params["clip"]["logit_scale"])
        logits = (
            jnp.einsum("bd,cd->bc", img, txt, preferred_element_type=jnp.float32)
            * scale
        )
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()

    return loss_fn


def make_flat_train_step(
    clip_cfg: CLIPConfig,
    tx: optax.GradientTransformation,
    dtype=jnp.bfloat16,
) -> Callable:
    loss_fn = make_flat_loss_fn(clip_cfg, dtype)

    @jax.jit
    def step(params, opt_state, images, seen_tokens, labels):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, images, seen_tokens, labels
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
