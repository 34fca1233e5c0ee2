"""SPMD training on the 8-device virtual CPU mesh.

Checks the per-replica-class DP step: loss equals the mean of the
single-replica losses, and the parameter update equals a single-device step
on the averaged gradients.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from hgr_tpu.config import Config  # noqa: E402
from hgr_tpu.hierarchy import synthetic_hierarchy  # noqa: E402
from hgr_tpu.models.clip import get_config  # noqa: E402
from hgr_tpu.parallel.mesh import make_mesh  # noqa: E402
from hgr_tpu.train import (  # noqa: E402
    NegativeSampler,
    ScheduleBuilder,
    init_train_state,
    make_om_loss_fn,
    make_optimizer,
    sched_to_device,
)
from hgr_tpu.train.spmd import make_spmd_train_step, stack_schedules  # noqa: E402
from hgr_tpu.tree_model import TreeModel  # noqa: E402


@pytest.mark.parametrize(
    "data,model",
    [
        # one mesh shape stays in the default tier to keep SPMD coverage
        # cheap; the other two (~90s each on 1 core) run in the slow tier
        pytest.param(2, 4, marks=pytest.mark.slow),
        (4, 2),
        pytest.param(8, 1, marks=pytest.mark.slow),
    ],
)
def test_spmd_step_matches_mean_of_replica_losses(data, model):
    """Mesh-shape sweep incl. model>1: the encoder passes reshard over the
    full data x model mesh (train/spmd.py) and must still equal the
    single-device mean-gradient oracle."""
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should provide 8 virtual CPU devices"
    mesh = make_mesh(data=data, model=model)

    hier = synthetic_hierarchy(3, 4, 5, 0)
    cfg = Config(arch="TEST-RN", num_compare=4, lr=1e-3, w_lr=1e-3, remat=False)
    tm = TreeModel.build(cfg, hier, pad_multiple=64)
    tm.init_params(0)
    clip_cfg = get_config(cfg.arch)

    sampler = NegativeSampler(hier, np.arange(hier.num_nodes), 4, seed=0)
    builder = ScheduleBuilder(hier, sampler, 0.25, 0.5, 4)
    deep = hier.level(hier.max_depth)
    targets = [int(deep[i % len(deep)]) for i in range(data)]
    scheds = [builder.build(t) for t in targets]

    rng = np.random.default_rng(0)
    images = rng.standard_normal((data, 2, 32, 32, 3)).astype(np.float32)
    node_tokens = jnp.asarray(tm.node_tokens)

    tx = make_optimizer(cfg, total_steps=10)
    state = init_train_state(tm.params, tm.layer_weight, tx)

    with mesh:
        step = make_spmd_train_step(cfg, clip_cfg, tx, mesh,
                                    dtype=jnp.float32, donate=False)
        stacked = {k: jnp.asarray(v) for k, v in stack_schedules(scheds).items()}
        new_state, loss = step(state, jnp.asarray(images), node_tokens, stacked)

    # oracle: mean of single-replica losses
    loss_fn = make_om_loss_fn(clip_cfg, jnp.float32, "OM", cfg.weights, "both")
    singles = [
        float(loss_fn(state.params, jnp.asarray(images[r]), node_tokens,
                      sched_to_device(scheds[r])))
        for r in range(data)
    ]
    np.testing.assert_allclose(float(loss), np.mean(singles), rtol=1e-5)

    # oracle: single-device step on the mean gradient
    def mean_loss(params):
        return jnp.mean(
            jnp.stack([
                loss_fn(params, jnp.asarray(images[r]), node_tokens,
                        sched_to_device(scheds[r]))
                for r in range(data)
            ])
        )

    grads = jax.grad(mean_loss)(state.params)
    updates, _ = tx.update(grads, state.opt_state, state.params)
    want = optax.apply_updates(state.params, updates)
    got_leaves = jax.tree_util.tree_leaves(new_state.params)
    want_leaves = jax.tree_util.tree_leaves(want)
    grad_leaves = jax.tree_util.tree_leaves(grads)
    for a, b, g in zip(got_leaves, want_leaves, grad_leaves):
        # AdamW's first-step update is ~lr*sign(m/sqrt(v)): where the true
        # gradient is fp32-noise-level, cross-replica summation-order noise
        # legitimately flips the sign, so compare only meaningful entries
        m = np.abs(np.asarray(g)) > 1e-6
        np.testing.assert_allclose(np.asarray(a)[m], np.asarray(b)[m],
                                   rtol=5e-3, atol=3e-5)
    assert int(new_state.step) == 1
