"""REAL multi-host validation: a 2-process jax.distributed CPU cluster.

The reference is strictly single-GPU (SURVEY §2.5); this framework claims
multi-host training via ``parallel/distributed.init_distributed`` + the
global ``(data, model)`` mesh. Unit tests can't validate that claim — this
one actually spawns two processes (2 local CPU devices each), forms the
4-device global mesh through the production helper, feeds per-host batch
slices through ``jax.make_array_from_process_local_data``, runs one real
SPMD OM train step, and asserts both hosts compute the identical loss and
post-update parameter fingerprint.
"""

import os
import socket
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_cluster_runs_one_spmd_step():
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_multihost_worker.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    addr = f"localhost:{port}"

    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), addr],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    results = {}
    evals = {}
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, out[-2000:]
        line = [l for l in out.splitlines() if l.startswith("RESULT")][-1]
        _tag, pid, loss, lw = line.split()
        results[pid] = (loss, lw)
        eline = [l for l in out.splitlines() if l.startswith("EVAL")][-1]
        evals[eline.split()[1]] = [float(v) for v in eline.split()[2:]]

    assert results["0"] == results["1"], results
    loss = float(results["0"][0].split("=")[1])
    assert 0.0 < loss < 50.0
    assert evals["0"] == evals["1"], evals

    # the 2-host sharded eval must equal a single-process single-device
    # eval of the identical setup (same seeds -> same params/bank/images)
    import numpy as np
    import jax.numpy as jnp

    from hgr_tpu.config import Config
    from hgr_tpu.hierarchy import synthetic_hierarchy
    from hgr_tpu.tree_model import TreeModel

    hier = synthetic_hierarchy(3, 3, 2, 0)
    cfg = Config(arch="TEST-RN", dtype="float32", num_compare=4,
                 batch_size=2, lr=1e-3, remat=False)
    tm = TreeModel.build(cfg, hier, pad_multiple=16)
    tm.init_params(0)
    rng = np.random.default_rng(0)
    res = tm.clip_cfg.image_resolution
    rng.standard_normal((2, 2, res, res, 3))  # skip the train-images draw
    eval_imgs = jnp.asarray(
        rng.standard_normal((4, res, res, 3)).astype(np.float32)
    )
    bank_s = tm.sort_bank(tm.update_classifier())
    target = int(hier.level(hier.max_depth)[0])
    m = tm.eval_step_sorted(tm.params, bank_s, eval_imgs, target)
    want = [float(x) for x in np.asarray(m.hits)] + [
        float(m.tor), float(m.path), float(m.point), float(m.num)
    ]
    np.testing.assert_allclose(evals["0"], want, atol=1e-4)
