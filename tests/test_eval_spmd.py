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


# The reference deployment's class geometry: 18,278 nodes over 13 uneven
# levels (most nodes at depths 2-6, supp Table 1/3; counts pinned at
# data/train_test_split_backup.py:86-89), padded to 18,432 = the driver's
# sharding multiple. Cumulative level offsets [10, 810, 4810, 9810, 13810,
# 16310, ...] guarantee every tested mesh's shard boundary (2304/4608/9216)
# falls MID-LEVEL, stressing the cross-shard merge + level_offsets logic.
REAL_PROFILE = [10, 800, 4000, 5000, 4000, 2500, 1000, 500, 250, 120, 60,
                30, 8]


def _real_geometry_model():
    from hgr_tpu.hierarchy import profiled_hierarchy

    hier = profiled_hierarchy(REAL_PROFILE, seed=0, cross_edges=40)
    cfg = Config(arch="TEST-RN", dtype="float32")
    tm = TreeModel.build(cfg, hier, pad_multiple=1024)
    assert tm.n_pad == 18432
    tm.init_params(0)
    rng = np.random.default_rng(3)
    bank = rng.standard_normal((tm.n_pad, 64)).astype(np.float32)
    bank = bank / np.linalg.norm(bank, axis=1, keepdims=True)
    bank_s = tm.sort_bank(jnp.asarray(bank))
    return hier, tm, bank_s


@pytest.mark.slow
@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (1, 8)])
def test_sharded_eval_matches_single_device_real_geometry(mesh_shape):
    """VERDICT r3 #2: sharded == single-device at N_pad=18,432 with the
    reference's 13-level profile, shard boundaries splitting levels."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    data, model = mesh_shape
    mesh = make_mesh(data=data, model=model)
    hier, tm, bank_s = _real_geometry_model()

    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 32, 32, 3)), jnp.float32
    )
    valid = jnp.asarray([True] * 6 + [False] * 2)

    # targets: a shallow node, a deepest-level node, and one from level 3 —
    # the level the (·, 2) mesh's 9216 boundary splits mid-way
    targets = [0, int(hier.level(hier.max_depth)[0]), int(hier.level(3)[17])]
    want = {
        t: tm.eval_step_sorted(tm.params, bank_s, imgs, t, valid=valid)
        for t in targets
    }

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


@pytest.mark.slow
def test_sharded_eval_fill_case_real_geometry():
    """The -1 fill rule at real geometry: sink level 5 (sorted range
    13810..16310 — the (2, 4) mesh's 13824 boundary splits it) below FILL;
    the cross-shard first-max tie-break over the FILL plateau must still
    reproduce the single-device prediction exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hgr_tpu.models.layers import l2_normalize

    mesh = make_mesh(data=2, model=4)
    hier, tm, bank_s = _real_geometry_model()

    img = np.random.default_rng(1).standard_normal((1, 32, 32, 3))
    imgs = jnp.asarray(np.repeat(img, 8, axis=0), jnp.float32)
    feat = np.asarray(l2_normalize(tm.encode_image_fn(tm.params, imgs[:1])))[0]

    bank_np = np.array(bank_s, np.float32)
    lo, hi = tm.level_offsets[5], tm.level_offsets[6]
    assert lo < 13824 < hi  # the sunk level straddles a shard boundary
    bank_np[lo:hi] = -2.0 * feat
    bank_s = jnp.asarray(bank_np)

    target = int(hier.level(6)[0])  # chain passes through the sunk level
    single = tm.eval_step_sorted(tm.params, bank_s, imgs, target)

    bank_sh = jax.device_put(bank_s, NamedSharding(mesh, P(MODEL, None)))
    step = make_sharded_eval_step(tm, mesh)
    with mesh:
        sharded = step(tm.params, bank_sh, imgs, target)
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_eval_fill_case_matches_single_device():
    """The reference's -1 fill rule (eval/metrics.FILL) under sharding: a
    whole level is pushed below the fill value, so the per-level prediction
    must leave the level (a miss) IDENTICALLY on the scan path, the sorted
    fast path, and the explicit-collective sharded path."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hgr_tpu.models.layers import l2_normalize

    mesh = make_mesh(data=2, model=4)
    hier = synthetic_hierarchy(3, 4, 5, 0)
    cfg = Config(arch="TEST-RN", dtype="float32")
    tm = TreeModel.build(cfg, hier, pad_multiple=8 * 4)
    tm.init_params(0)

    # identical images -> identical features: bank rows set to -2*feat give
    # every image logit exactly -2 (< FILL) on the chosen level
    img = np.random.default_rng(1).standard_normal((1, 32, 32, 3))
    imgs = jnp.asarray(np.repeat(img, 8, axis=0), jnp.float32)
    feat = np.asarray(l2_normalize(
        tm.encode_image_fn(tm.params, imgs[:1])
    ))[0]

    bank_s = np.array(tm.sort_bank(tm.update_classifier()), np.float32)
    lo, hi = tm.level_offsets[1], tm.level_offsets[2]
    bank_s[lo:hi] = -2.0 * feat
    bank_s = jnp.asarray(bank_s)

    target = int(hier.level(hier.max_depth)[0])
    chain = hier.chain_with_self(target)
    assert len(chain) >= 3  # the sunk level is an interior chain slot

    single = tm.eval_step_sorted(tm.params, bank_s, imgs, target)
    # scan path (unsorted) must agree: un-sort the bank back to id order
    inv = np.argsort(tm.depth_order)
    scan = tm.eval_step(tm.params, jnp.asarray(np.asarray(bank_s)[inv]),
                        imgs, target)
    for a, b in zip(single, scan):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    bank_sh = jax.device_put(bank_s, NamedSharding(mesh, P(MODEL, None)))
    params_r = jax.device_put(tm.params, NamedSharding(mesh, P()))
    step = make_sharded_eval_step(tm, mesh)
    sharded = step(params_r, bank_sh, jax.device_put(
        imgs, NamedSharding(mesh, P("data"))), target)
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # and the sunk level really is a miss: point overlap strictly below a
    # full-chain match for every row
    assert float(single.point) < 8 * (1.0 - 1.0 / len(chain)) + 1e-6
