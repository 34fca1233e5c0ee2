"""Multi-replica (SPMD) OM training: one class per data replica per step,
encoder FLOPs sharded over the WHOLE 2-D mesh.

The grouped-batch invariant (every batch is a single class) interacts with
data parallelism: sharding ONE class's batch across devices would leave every
device computing identical text encodes. Instead each data replica gets its
OWN class batch + pair schedule, the per-replica losses are averaged, and one
optimizer update is applied — the SPMD generalization of the reference's
single-GPU loop (which had no DP at all; SURVEY §2.5).

The ``model`` mesh axis carries real work here (not just eval): the image
batches and the de-duplicated compare-prompt token sets of ALL replicas are
flattened and resharded over ``(data, model)`` jointly, so every device
encodes ``R*B/(d*m)`` images and ``R*U/(d*m)`` prompts — without this, model
columns within a data row would run redundant identical encoder passes. The
encoded features are then gathered back to ``P(data)`` (a few MB over ICI)
and the cheap per-pair CE runs vmapped per replica. GSPMD emits the
reshard/gather collectives from the ``with_sharding_constraint`` boundaries;
the gradient all-reduce falls out of the replicated-params jit as usual.
"""

from __future__ import annotations

from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.clip import CLIPConfig, encode_image, encode_text
from ..models.layers import l2_normalize
from ..parallel.mesh import DATA, MODEL
from .om import pair_ce_loss, resolve_weight_modes
from .sampling import PairSchedule
from .trainer import TrainState, freeze_params


def stack_schedules(scheds: List[PairSchedule]) -> Dict[str, np.ndarray]:
    """Stack R per-replica schedules into [R, ...] arrays.

    Unique-set sizes may differ across replicas (size buckets); pad to the
    largest — padded ids encode harmlessly."""
    u_max = max(s.unique.shape[0] for s in scheds)

    def pad_u(u):
        out = np.zeros(u_max, u.dtype)
        out[: u.shape[0]] = u
        return out

    return {
        "compare": np.stack([s.compare for s in scheds]),
        "compare_valid": np.stack([s.compare_valid for s in scheds]),
        "label": np.stack([s.label for s in scheds]),
        "in_pos": np.stack([s.in_pos for s in scheds]),
        "in_len": np.stack([s.in_len for s in scheds]),
        "out_pos": np.stack([s.out_pos for s in scheds]),
        "out_len": np.stack([s.out_len for s in scheds]),
        "pair_valid": np.stack([s.pair_valid for s in scheds]),
        "unique": np.stack([pad_u(s.unique) for s in scheds]),
        "inv": np.stack([s.inv for s in scheds]),
    }


def make_spmd_train_step(
    config: Config,
    clip_cfg: CLIPConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    dtype=jnp.bfloat16,
    donate: bool = True,
    text_fn: Callable = None,
    frozen: tuple = (),
) -> Callable:
    """-> jitted ``step(state, images [R,B,...], node_tokens, sched [R,...])``.

    ``R`` must equal the mesh's ``data`` axis size; images/schedules are
    sharded one replica per data-axis slot, params/opt replicated. Encoder
    passes are resharded over ``(data, model)`` internally (see module doc).
    ``frozen`` top-level param keys are stop-gradient'd inside the loss so
    their backward is dead-code-eliminated (see trainer.make_train_step —
    without this the ctx-only CoOp step runs the full frozen-CLIP backward
    for gradients the optimizer zeroes).
    """
    in_mode, out_mode = resolve_weight_modes(
        config.training_method, config.weights, config.weighting
    )
    remat = getattr(config, "remat", False)
    both = NamedSharding(mesh, P((DATA, MODEL)))
    both_tok = NamedSharding(mesh, P((DATA, MODEL), None))
    data_only = NamedSharding(mesh, P(DATA))

    def mean_loss(params, images, node_tokens, sched):
        clip_params = params["clip"]
        R, B = images.shape[0], images.shape[1]

        # image encode over the full mesh: [R*B] rows split over data*model
        flat = images.reshape((R * B,) + images.shape[2:])
        flat = jax.lax.with_sharding_constraint(flat, both)
        img = encode_image(clip_params, clip_cfg, flat, dtype=dtype, remat=remat)
        img = l2_normalize(img)
        img = jax.lax.with_sharding_constraint(
            img.reshape(R, B, -1), data_only
        )

        if text_fn is None:
            U = sched["unique"].shape[1]
            toks = node_tokens[sched["unique"].reshape(-1)]     # [R*U, T]
            toks = jax.lax.with_sharding_constraint(toks, both_tok)
            tf = encode_text(clip_params, clip_cfg, toks, dtype=dtype, remat=remat)
            tf = l2_normalize(tf)
            tf = jax.lax.with_sharding_constraint(
                tf.reshape(R, U, -1), data_only
            )
        else:
            # variant text path (CoOp prompt learner): per-replica vmap
            tf = jax.vmap(lambda u: text_fn(params, u))(sched["unique"])

        scale = jnp.exp(clip_params["logit_scale"])
        per_replica = jax.vmap(
            lambda im, t, sch: pair_ce_loss(
                im, t, sch, params["layer_weight"], scale,
                in_mode=in_mode, out_mode=out_mode,
            ),
            in_axes=(0, 0, 0),
        )(img, tf, sched)
        return per_replica.mean()

    def step(state: TrainState, images, node_tokens, sched):
        def wrapped(params):
            return mean_loss(freeze_params(params, frozen),
                             images, node_tokens, sched)

        loss, grads = jax.value_and_grad(wrapped)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    replica = NamedSharding(mesh, P(DATA))
    replicated = NamedSharding(mesh, P())
    sched_shardings = {
        k: replica
        for k in (
            "compare", "compare_valid", "label", "in_pos", "in_len",
            "out_pos", "out_len", "pair_valid", "unique", "inv",
        )
    }
    return jax.jit(
        step,
        in_shardings=(replicated, replica, replicated, sched_shardings),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,) if donate else (),
    )
