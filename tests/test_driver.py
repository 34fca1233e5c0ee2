"""End-to-end driver integration: synthetic train -> checkpoint -> load -> eval."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_train_checkpoint_eval_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # global {weights}.txt lands here
    from hgr_tpu.driver import main

    folder = str(tmp_path / "runs")
    common = [
        "--synthetic", "True", "--arch", "TEST-RN", "--dtype", "float32",
        "--folder", folder, "--test_batch_size", "8", "--num_compare", "6",
    ]
    main(
        common
        + [
            "--epochs", "1", "--batch_size", "4", "--n_episodes", "4",
            "--print_freq", "2", "--lr", "1e-3",
        ]
    )
    save_path = os.path.join(folder, "HGR", "adaptive_0.25_0.5")
    assert os.path.isdir(os.path.join(save_path, "clip_0"))
    assert os.path.exists(os.path.join(save_path, "arguments.log"))

    main(common + ["--train", "False", "--load", "True", "--from_epoch", "0"])
    lines = [
        json.loads(l)
        for l in open(os.path.join(save_path, "metrics.jsonl"))
    ]
    evals = [l for l in lines if l.get("event") == "eval" and l.get("tag") == "final"]
    assert evals, "no final eval record"
    final = evals[-1]
    for k in ["hit@1", "hit@20", "tor", "path_ratio", "point_ratio"]:
        assert k in final
    assert final["num_samples"] > 0
    assert os.path.exists(tmp_path / "adaptive.txt")


def test_keep_checkpoints_retention(tmp_path, monkeypatch):
    """--keep_checkpoints N prunes all but the N newest epoch checkpoints
    through the driver's epoch loop (utils/checkpoint.AsyncCheckpointSaver)."""
    monkeypatch.chdir(tmp_path)
    from hgr_tpu.driver import main

    folder = str(tmp_path / "runs")
    main([
        "--synthetic", "True", "--arch", "TEST-RN", "--dtype", "float32",
        "--folder", folder, "--epochs", "3", "--batch_size", "2",
        "--n_episodes", "2", "--num_compare", "4", "--lr", "1e-3",
        "--keep_checkpoints", "1",
    ])
    save_path = os.path.join(folder, "HGR", "adaptive_0.25_0.5")
    names = os.listdir(save_path)
    kept = sorted(n for n in names
                  if n.startswith("clip_") and not n.endswith(".meta.json"))
    assert kept == ["clip_2"]
    # pruned checkpoints must take their resume sidecars with them
    metas = sorted(n for n in names if n.endswith(".meta.json"))
    assert metas == ["clip_2.meta.json"]


def test_fetch_warm_start(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from hgr_tpu.driver import main

    folder = str(tmp_path / "runs")
    main(
        [
            "--synthetic", "True", "--arch", "TEST-RN", "--dtype", "float32",
            "--folder", folder, "--epochs", "1", "--batch_size", "2",
            "--n_episodes", "2", "--num_compare", "4", "--lr", "1e-3",
        ]
    )
    ckpt = os.path.join(folder, "HGR", "adaptive_0.25_0.5", "clip_0")
    # warm-start a second run from the first's checkpoint (reference --fetch)
    main(
        [
            "--synthetic", "True", "--arch", "TEST-RN", "--dtype", "float32",
            "--folder", folder, "--exp_name", "HGR2", "--epochs", "1",
            "--batch_size", "2", "--n_episodes", "2", "--num_compare", "4",
            "--lr", "1e-3", "--fetch", "True", "--fetch_path", ckpt,
        ]
    )
    assert os.path.isdir(
        os.path.join(folder, "HGR2", "adaptive_0.25_0.5", "clip_0")
    )


def test_dryrun_multichip_self_forces_cpu_mesh(monkeypatch):
    """The driver contract: dryrun_multichip must own its environment.

    Round-1 failure mode: the driver invoked it in a process whose default
    backend had 1 TPU device and it died in make_mesh. The wrapper must
    re-exec in a child with JAX_PLATFORMS=cpu + a forced host device count
    (and pin the platform via jax.config inside the child, since the env var
    alone does not beat a pre-registered backend plugin).
    """
    import subprocess
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    captured = {}

    def fake_run(cmd, **kw):
        captured["cmd"] = cmd
        captured["env"] = kw["env"]
        return subprocess.CompletedProcess(cmd, 0, stdout="", stderr="")

    monkeypatch.delenv("_HGR_DRYRUN_INNER", raising=False)
    monkeypatch.setattr(subprocess, "run", fake_run)
    ge.dryrun_multichip(8)

    env = captured["env"]
    assert env["_HGR_DRYRUN_INNER"] == "1"
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    # exactly one device-count flag even if the caller already set one
    assert env["XLA_FLAGS"].count("xla_force_host_platform_device_count") == 1
    child_code = captured["cmd"][-1]
    assert "jax.config.update('jax_platforms', 'cpu')" in child_code
    # the inner guard routes the child into the body, not another spawn
    monkeypatch.setenv("_HGR_DRYRUN_INNER", "1")
    called = {}
    monkeypatch.setattr(ge, "_dryrun_body", lambda n: called.setdefault("n", n))
    ge.dryrun_multichip(8)
    assert called["n"] == 8


def test_spmd_train_rounds_up_remainder_batches(tmp_path, monkeypatch):
    """Driver SPMD path: an episode count not divisible by the replica count
    must be rounded UP (round 1 silently dropped the remainder)."""
    monkeypatch.chdir(tmp_path)
    from hgr_tpu.driver import main

    folder = str(tmp_path / "runs")
    main(
        [
            "--synthetic", "True", "--arch", "TEST-RN", "--dtype", "float32",
            "--folder", folder, "--epochs", "1", "--batch_size", "2",
            "--n_episodes", "5", "--num_compare", "4", "--lr", "1e-3",
            "--mesh_data", "4", "--mesh_model", "2", "--remat", "False",
        ]
    )
    log = open(os.path.join(
        folder, "HGR", "adaptive_0.25_0.5", "arguments.log")).read()
    # 5 episodes over 4 replicas -> rounded up to 8 -> 2 steps per epoch
    assert "0/2" in log
    assert os.path.isdir(
        os.path.join(folder, "HGR", "adaptive_0.25_0.5", "clip_0")
    )


def test_trace_dir_and_epoch_perf(tmp_path, monkeypatch):
    """--trace_dir captures an xprof trace of early train steps
    (utils/profiling.TraceWindow) and every epoch logs an epoch_perf
    record with throughput to metrics.jsonl."""
    import json
    import os

    monkeypatch.chdir(tmp_path)
    from hgr_tpu.driver import main

    folder = str(tmp_path / "runs")
    trace = str(tmp_path / "trace")
    main([
        "--synthetic", "True", "--arch", "TEST-RN", "--dtype", "float32",
        "--folder", folder, "--epochs", "1", "--batch_size", "2",
        "--n_episodes", "4", "--num_compare", "4", "--lr", "1e-3",
        "--trace_dir", trace, "--test_after_train", "False",
        "--mesh_data", "1",  # single-replica path: 4 real steps, so the
        # [1, 3] trace window fires (the virtual 8-device mesh would fold
        # 4 episodes into 1 SPMD step)
    ])
    # the profiler writes <trace>/plugins/profile/<ts>/*.xplane.pb
    found = []
    for root, _dirs, files in os.walk(trace):
        found += [f for f in files if f.endswith((".xplane.pb", ".trace.json.gz"))]
    assert found, f"no trace artifacts under {trace}"

    lines = [
        json.loads(l)
        for l in open(os.path.join(folder, "HGR", "adaptive_0.25_0.5", "metrics.jsonl"))
    ]
    perf = [l for l in lines if l.get("event") == "epoch_perf"]
    assert perf and perf[0]["steps"] == 4
    assert perf[0]["imgs_per_sec"] > 0


def test_simi_strategy_refreshes_bank_per_epoch(tmp_path, monkeypatch):
    """--sample_strategy simi: the driver must refresh the sampler's
    similarity bank from the CURRENT params each epoch (the reference
    re-encodes under no_grad per step, clip_tree.py:92; here once per epoch
    against the cached bank) — exercises the epoch-head branch in
    run_train."""
    monkeypatch.chdir(tmp_path)
    from hgr_tpu.driver import main

    folder = str(tmp_path / "runs")
    main([
        "--synthetic", "True", "--arch", "TEST-RN", "--dtype", "float32",
        "--folder", folder, "--epochs", "2", "--batch_size", "2",
        "--n_episodes", "2", "--num_compare", "4", "--lr", "1e-3",
        "--sample_strategy", "simi", "--test_after_train", "False",
        "--mesh_data", "1",
    ])
    import json
    import os

    lines = [
        json.loads(l)
        for l in open(os.path.join(folder, "HGR", "adaptive_0.25_0.5", "metrics.jsonl"))
    ]
    perf = [l for l in lines if l.get("event") == "epoch_perf"]
    assert len(perf) == 2  # both epochs completed through the simi branch


def test_coop_cli_train_checkpoint_eval_roundtrip(tmp_path, monkeypatch):
    """--coop through the full CLI: train (prompt-learner ctx in the
    optimizer), checkpoint (ctx travels in the params pytree), reload for
    test-only eval (driver.py:91-92 restores tm.coop_ctx) — the working
    version of the reference's dead CoOp OM path (clip_coop.py:187-189)."""
    monkeypatch.chdir(tmp_path)
    from hgr_tpu.driver import main

    folder = str(tmp_path / "runs")
    common = [
        "--synthetic", "True", "--arch", "TEST-RN", "--dtype", "float32",
        "--folder", folder, "--coop", "True", "--coop_train", "both",
        "--n_ctx", "2", "--num_compare", "4", "--test_batch_size", "8",
        "--mesh_data", "1",
    ]
    main(common + [
        "--epochs", "1", "--batch_size", "2", "--n_episodes", "2",
        "--lr", "1e-3", "--test_after_train", "False",
    ])
    save_path = os.path.join(folder, "HGR", "adaptive_0.25_0.5")
    assert os.path.isdir(os.path.join(save_path, "clip_0"))

    main(common + ["--train", "False", "--load", "True", "--from_epoch", "0",
                   "--max_test_batches", "2"])
    lines = [
        json.loads(l)
        for l in open(os.path.join(save_path, "metrics.jsonl"))
    ]
    finals = [l for l in lines if l.get("event") == "eval" and l.get("tag") == "final"]
    assert finals and finals[-1]["num_samples"] > 0
