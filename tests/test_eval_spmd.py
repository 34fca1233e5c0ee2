"""Explicit-collective sharded eval == single-device eval, on the 8-dev mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hgr_tpu.config import Config  # noqa: E402
from hgr_tpu.hierarchy import synthetic_hierarchy  # noqa: E402
from hgr_tpu.parallel.eval_spmd import make_sharded_eval_step  # noqa: E402
from hgr_tpu.parallel.mesh import MODEL, make_mesh  # noqa: E402
from hgr_tpu.tree_model import TreeModel  # noqa: E402


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (1, 8)])
def test_sharded_eval_matches_single_device(mesh_shape):
    from jax.sharding import NamedSharding, PartitionSpec as P

    data, model = mesh_shape
    mesh = make_mesh(data=data, model=model)
    hier = synthetic_hierarchy(3, 4, 5, 0)
    cfg = Config(arch="TEST-RN", dtype="float32")
    tm = TreeModel.build(cfg, hier, pad_multiple=8 * model)
    tm.init_params(0)

    bank = tm.update_classifier()
    bank_s = tm.sort_bank(bank)
    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 32, 32, 3)), jnp.float32
    )
    valid = jnp.asarray([True] * 6 + [False] * 2)

    want = {}
    for target in [0, int(hier.level(hier.max_depth)[0])]:
        want[target] = tm.eval_step_sorted(tm.params, bank_s, imgs, target,
                                           valid=valid)

    bank_sh = jax.device_put(bank_s, NamedSharding(mesh, P(MODEL, None)))
    step = make_sharded_eval_step(tm, mesh)
    with mesh:
        for target, m1 in want.items():
            m2 = step(tm.params, bank_sh, imgs, target, valid=valid)
            for a, b in zip(m1, m2):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-5,
                    err_msg=f"target={target} mesh={mesh_shape}",
                )
