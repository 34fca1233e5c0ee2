"""CoOp prompt learner under SPMD multi-replica training + non-serial batches."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hgr_tpu.config import Config  # noqa: E402
from hgr_tpu.data import GroupedTrainLoader, SyntheticImageSource  # noqa: E402
from hgr_tpu.hierarchy import synthetic_hierarchy  # noqa: E402
from hgr_tpu.parallel.mesh import make_mesh  # noqa: E402
from hgr_tpu.train import (  # noqa: E402
    NegativeSampler,
    ScheduleBuilder,
    init_train_state,
    make_optimizer,
)
from hgr_tpu.train.spmd import make_spmd_train_step, stack_schedules  # noqa: E402
from hgr_tpu.tree_model import TreeModel  # noqa: E402


def test_coop_spmd_step():
    mesh = make_mesh(data=4, model=2)
    hier = synthetic_hierarchy(3, 4, 5, 0)
    cfg = Config(arch="TEST-RN", num_compare=4, lr=1e-3, coop=True, remat=False,
                 coop_train="ctx", dtype="float32")
    tm = TreeModel.build(cfg, hier, pad_multiple=64)
    tm.init_params(0)
    static, ctx = tm.coop_setup(0)
    text_fn = tm.coop_text_fn(static)
    tx = make_optimizer(cfg, 10, extra_labels={"clip": "frozen", "coop_ctx": "clip"})
    state = init_train_state(tm.params, tm.layer_weight, tx,
                             extra_params={"coop_ctx": ctx})
    step = make_spmd_train_step(cfg, tm.clip_cfg, tx, mesh, dtype=jnp.float32,
                                donate=False, text_fn=text_fn)
    sampler = NegativeSampler(hier, np.arange(hier.num_nodes), 4, seed=0,
                              topk_window="both", exclu_bro=True)
    builder = ScheduleBuilder(hier, sampler, 0.25, 0.5, 4)
    deep = hier.level(hier.max_depth)
    sched = stack_schedules([builder.build(int(deep[i])) for i in range(4)])
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 2, 32, 32, 3)), jnp.float32
    )
    ctx0 = np.asarray(state.params["coop_ctx"])
    with mesh:
        state, loss = step(state, images, jnp.asarray(tm.node_tokens),
                           {k: jnp.asarray(v) for k, v in sched.items()})
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(state.params["coop_ctx"]), ctx0)
    np.testing.assert_array_equal(
        np.asarray(state.params["clip"]["logit_scale"]),
        np.asarray(tm.params["logit_scale"]),
    )


def test_non_serial_batches_resample():
    g = {"c": [f"c/{j}.jpg" for j in range(6)]}
    loader = GroupedTrainLoader(
        g, {"c": 0}, SyntheticImageSource(4), batch_size=4, n_episodes=6,
        seed=0, num_threads=1, serial_batches=False,
    )
    seen = [tuple(sorted(b.paths)) for b in loader]
    # non-serial mode redraws randomly: with 15 possible 4-subsets, six draws
    # should not walk a clean two-batch partition of the class
    assert len(set(seen)) >= 2
    for s in seen:
        assert len(set(s)) == 4  # no replacement within a batch