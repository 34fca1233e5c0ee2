"""Worker for tests/test_multihost.py: one simulated host of a 2-host CPU
cluster (2 local devices each -> a 4-device global (data=2, model=2) mesh).

Runs ``init_distributed`` (the production helper), builds the global mesh,
executes ONE real SPMD OM train step on identical global data, and prints
the loss plus a params fingerprint — the parent asserts both hosts agree.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid = int(sys.argv[1])
    addr = sys.argv[2]

    from hgr_tpu.parallel.distributed import host_local_batch_slice, init_distributed

    idx, count = init_distributed(addr, num_processes=2, process_id=pid)
    assert (idx, count) == (pid, 2), (idx, count)
    assert len(jax.devices()) == 4, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hgr_tpu.config import Config
    from hgr_tpu.hierarchy import synthetic_hierarchy
    from hgr_tpu.parallel.mesh import DATA, make_mesh
    from hgr_tpu.train import (
        NegativeSampler,
        ScheduleBuilder,
        init_train_state,
        make_optimizer,
    )
    from hgr_tpu.train.spmd import make_spmd_train_step, stack_schedules
    from hgr_tpu.tree_model import TreeModel

    hier = synthetic_hierarchy(3, 3, 2, 0)
    cfg = Config(arch="TEST-RN", dtype="float32", num_compare=4,
                 batch_size=2, lr=1e-3, remat=False)
    tm = TreeModel.build(cfg, hier, pad_multiple=16)
    tm.init_params(0)

    mesh = make_mesh(data=2, model=2)
    tx = make_optimizer(cfg, total_steps=4)
    state = init_train_state(tm.params, tm.layer_weight, tx)
    step = make_spmd_train_step(cfg, tm.clip_cfg, tx, mesh, donate=False)

    # identical global inputs on both hosts (same seed); each host feeds its
    # local slice of the [R, B, ...] replica-batch through the global-array
    # constructor — the production multi-host input path
    rng = np.random.default_rng(0)
    res = tm.clip_cfg.image_resolution
    images_global = rng.standard_normal((2, 2, res, res, 3)).astype(np.float32)
    sl = host_local_batch_slice(2)  # replica axis shards over hosts
    sharding = NamedSharding(mesh, P(DATA))
    images = jax.make_array_from_process_local_data(
        sharding, images_global[sl]
    )

    sampler = NegativeSampler(hier, np.arange(hier.num_nodes), cfg.num_compare, seed=0)
    builder = ScheduleBuilder(hier, sampler, cfg.out_ratio, cfg.in_ratio, cfg.num_compare)
    targets = [int(hier.level(hier.max_depth)[0]), int(hier.level(hier.max_depth)[1])]
    sched = stack_schedules([builder.build(t) for t in targets])
    sched_dev = {k: jnp.asarray(v) for k, v in sched.items()}
    node_tokens = jnp.asarray(tm.node_tokens)

    state, loss = step(state, images, node_tokens, sched_dev)
    lw = state.params["layer_weight"]
    # fully-addressable scalars: loss is replicated, layer_weight too
    fingerprint = float(jnp.sum(jnp.abs(lw)))
    print(f"RESULT {pid} loss={float(loss):.6f} lw={fingerprint:.6f}", flush=True)

    # ---- sharded zero-shot eval across the 2-host mesh --------------------
    # (explicit-collective path; the parent compares these numbers against a
    # single-process single-device eval with the same seeds)
    from hgr_tpu.parallel.eval_spmd import make_sharded_eval_step

    bank_s = tm.sort_bank(tm.update_classifier())
    bank_sh = jax.device_put(bank_s, NamedSharding(mesh, P("model", None)))
    params_r = jax.device_put(tm.params, NamedSharding(mesh, P()))
    eval_imgs_global = rng.standard_normal((4, res, res, 3)).astype(np.float32)
    eval_imgs = jax.make_array_from_process_local_data(
        sharding, eval_imgs_global[host_local_batch_slice(4)]
    )
    estep = make_sharded_eval_step(tm, mesh)
    m = estep(params_r, bank_sh, eval_imgs, targets[0])
    vals = [float(x) for x in np.asarray(m.hits)] + [
        float(m.tor), float(m.path), float(m.point), float(m.num)
    ]
    print(f"EVAL {pid} " + " ".join(f"{v:.5f}" for v in vals), flush=True)


if __name__ == "__main__":
    main()
