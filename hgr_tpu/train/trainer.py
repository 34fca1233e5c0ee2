"""Train step assembly: optimizers, grad clipping, jitted update.

Mirrors the reference driver's optimizer setup (``main.py:246-253``):

- AdamW(lr, wd) over every CLIP parameter (full fine-tune)
- a separate SGD(w_lr) over the adaptive ``layer_weight``
- global-norm grad clip 1.0 over the CLIP params ONLY, not layer_weight
  (``main.py:87-88``)
- cosine schedule with warmup (``utils.py:82-95``)

TPU-native differences: bf16 compute with fp32 master params + fp32 optimizer
state replaces the reference's fp16<->fp32 swap dance around every step
(``utils.py:98-123``, ``main.py:90-94``); the whole update is one jitted,
donated function; batch is sharded over the ``data`` mesh axis.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.clip import CLIPConfig
from .om import make_om_loss_fn
from .schedule import cosine_lr
from .sampling import PairSchedule


class TrainState(NamedTuple):
    params: Any          # {"clip": ..., "layer_weight": ...}
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(
    config: Config, total_steps: int, extra_labels: Optional[Dict[str, str]] = None
) -> optax.GradientTransformation:
    """AdamW(clip) + SGD(layer_weight), with optional extra param groups.

    ``extra_labels`` maps extra top-level param keys to one of:
    ``"clip"`` (join the AdamW group), ``"lw"`` (join the SGD group), or
    ``"frozen"`` (no update) — used by the CoOp variant to choose whether the
    context vectors, the CLIP weights, or both train
    (the reference's tree_coop freezes the prompt learner and trains CLIP,
    ``model/clip_coop.py:72-76``).
    """
    schedule = cosine_lr(config.lr, config.warmup_length, total_steps)
    clip_tx = optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.adamw(learning_rate=schedule, weight_decay=config.wd),
    )
    lw_tx = optax.sgd(learning_rate=config.w_lr)
    labels = {"clip": "clip", "layer_weight": "lw"}
    labels.update(extra_labels or {})
    tx = optax.multi_transform(
        {"clip": clip_tx, "lw": lw_tx, "frozen": optax.set_to_zero()},
        param_labels=labels,
    )
    if getattr(config, "accum_steps", 1) > 1:
        # gradient accumulation: k micro-batches per optimizer update
        tx = optax.MultiSteps(tx, every_k_schedule=config.accum_steps)
    return tx


def sched_to_device(s: PairSchedule) -> Dict[str, jnp.ndarray]:
    return {
        "compare": jnp.asarray(s.compare),
        "compare_valid": jnp.asarray(s.compare_valid),
        "label": jnp.asarray(s.label),
        "in_pos": jnp.asarray(s.in_pos),
        "in_len": jnp.asarray(s.in_len),
        "out_pos": jnp.asarray(s.out_pos),
        "out_len": jnp.asarray(s.out_len),
        "pair_valid": jnp.asarray(s.pair_valid),
        "unique": jnp.asarray(s.unique),
        "inv": jnp.asarray(s.inv),
    }


def freeze_params(params: Dict[str, Any], frozen: tuple) -> Dict[str, Any]:
    """Stop-gradient the ``frozen`` top-level subtrees of a params dict.

    Shared by the single-chip and SPMD step builders so frozen semantics
    cannot diverge between the two training paths. Load-bearing for CoOp
    ctx-only training: stop_gradient lets XLA dead-code-eliminate the whole
    frozen backward (see make_train_step's docstring).
    """
    if frozen:
        params = dict(params)
        for k in frozen:
            params[k] = jax.lax.stop_gradient(params[k])
    return params


def make_train_step(
    config: Config,
    clip_cfg: CLIPConfig,
    tx: optax.GradientTransformation,
    dtype=jnp.bfloat16,
    donate: bool = True,
    text_fn: Callable = None,
    frozen: tuple = (),
) -> Callable:
    """-> jitted ``step(state, images, node_tokens, sched) -> (state, loss)``.

    ``frozen`` names top-level param keys whose subtree is stop-gradient'd
    inside the loss (matching their ``"frozen"`` optimizer label). This is
    load-bearing, not cosmetic: with ``frozen=("clip",)`` (CoOp ctx-only
    training) XLA dead-code-eliminates the ENTIRE image-encoder backward and
    every frozen weight-gradient — without it the full RN50 backward runs
    only to produce gradients the optimizer zeroes, and the CoOp step at
    reference scale does not fit HBM.
    """
    loss_fn = make_om_loss_fn(
        clip_cfg,
        dtype,
        config.training_method,
        config.weights,
        config.weighting,
        remat=getattr(config, "remat", False),
        text_fn=text_fn,
    )

    def step(state: TrainState, images, node_tokens, sched):
        def wrapped(params):
            return loss_fn(freeze_params(params, frozen),
                           images, node_tokens, sched)

        loss, grads = jax.value_and_grad(wrapped)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def init_train_state(
    clip_params: Any,
    layer_weight: jnp.ndarray,
    tx: optax.GradientTransformation,
    extra_params: Optional[Dict[str, Any]] = None,
) -> TrainState:
    params = {"clip": clip_params, "layer_weight": layer_weight}
    params.update(extra_params or {})
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
