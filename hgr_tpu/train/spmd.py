"""Multi-replica (SPMD) OM training: one class per replica per step.

The grouped-batch invariant (every batch is a single class) interacts with
data parallelism: sharding ONE class's batch across devices would leave every
device computing identical text encodes. Instead each replica gets its OWN
class batch + pair schedule, the per-replica losses are averaged, and one
optimizer update is applied — the SPMD generalization of the reference's
single-GPU loop (which had no DP at all; SURVEY §2.5).

Mechanics: the per-replica loss is ``vmap``-ed over a leading replica axis
and the inputs carry shardings that put that axis on the mesh's ``data``
dimension; GSPMD turns the vmap into per-device compute + an all-reduce of
the gradients. Parameters and optimizer state stay replicated, so the update
is computed redundantly and identically on every device (standard DP).
"""

from __future__ import annotations

from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.clip import CLIPConfig
from ..parallel.mesh import DATA
from .om import make_om_loss_fn
from .sampling import PairSchedule
from .trainer import TrainState


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
) -> Callable:
    """-> jitted ``step(state, images [R,B,...], node_tokens, sched [R,...])``.

    ``R`` must equal the mesh's ``data`` axis size; images/schedules are
    sharded one replica per data-axis slot, params/opt replicated.
    """
    loss_fn = make_om_loss_fn(
        clip_cfg,
        dtype,
        config.training_method,
        config.weights,
        config.weighting,
        remat=False,
        text_fn=text_fn,
    )

    def mean_loss(params, images, node_tokens, sched):
        per_replica = jax.vmap(
            lambda img, sch: loss_fn(params, img, node_tokens, sch),
            in_axes=(0, 0),
        )(images, sched)
        return per_replica.mean()

    def step(state: TrainState, images, node_tokens, sched):
        loss, grads = jax.value_and_grad(mean_loss)(
            state.params, images, node_tokens, sched
        )
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
