"""Preemption-safe training (utils/preempt.py): SIGTERM converts to a
step-boundary stop + checkpoint + clean exit, and --resume continues.
The reference has no handling for preempted workers (SURVEY §5)."""

import os
import signal
import subprocess
import sys
import time

import pytest


def test_graceful_shutdown_latch_and_restore():
    from hgr_tpu.utils.preempt import GracefulShutdown

    before = signal.getsignal(signal.SIGTERM)
    with GracefulShutdown() as g:
        assert not g.requested
        os.kill(os.getpid(), signal.SIGTERM)  # latched, not fatal
        # delivery is synchronous for a self-signal on the main thread
        assert g.requested
    assert signal.getsignal(signal.SIGTERM) is before


@pytest.mark.slow
def test_mid_epoch_resume_reenters_epoch(tmp_path):
    """A run preempted mid-epoch and resumed with the SAME geometry must
    re-enter the interrupted epoch at the saved step (clip_{N}.meta.json
    sidecar) instead of silently dropping the epoch's remaining steps."""
    folder = str(tmp_path / "runs")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo_root)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "from hgr_tpu.driver import main; import sys; main(sys.argv[1:])"
    )
    base = [
        sys.executable, "-c", code,
        "--synthetic", "True", "--arch", "TEST-RN", "--dtype", "float32",
        "--remat", "False", "--folder", folder, "--batch_size", "2",
        "--num_compare", "4", "--lr", "1e-3", "--print_freq", "1",
        "--epochs", "1", "--n_episodes", "300",
        # conftest's XLA_FLAGS leak 8 virtual devices into the child; pin
        # the single-replica layout so steps_per_epoch is the episode count
        "--mesh_data", "1",
    ]
    proc = subprocess.Popen(
        base, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=str(tmp_path), env=env,
    )
    deadline = time.time() + 300
    saw_loss = False
    while time.time() < deadline:
        if "loss:" in proc.stdout.readline():
            saw_loss = True
            break
    assert saw_loss, "training never reached a step"
    proc.send_signal(signal.SIGTERM)
    out = proc.communicate(timeout=300)[0]
    assert proc.returncode == 0, out[-2000:]

    run_dir = os.path.join(folder, "HGR", "adaptive_0.25_0.5")
    import json
    meta = json.load(open(os.path.join(run_dir, "clip_0.meta.json")))
    assert meta["steps_per_epoch"] == 300
    assert 0 < meta["steps_done"] < 300

    # resume with the original command verbatim: must RE-ENTER epoch 0 at
    # the saved step and complete the remaining steps
    r = subprocess.run(
        base + ["--resume", "True"], capture_output=True, text=True,
        timeout=600, cwd=str(tmp_path), env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    log = open(os.path.join(run_dir, "arguments.log")).read()
    assert "re-entering epoch 0 at step" in log
    meta2 = json.load(open(os.path.join(run_dir, "clip_0.meta.json")))
    assert meta2["steps_done"] == 300  # epoch completed, no dropped steps


@pytest.mark.slow
def test_sigterm_checkpoints_and_resume_continues(tmp_path):
    folder = str(tmp_path / "runs")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo_root)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "from hgr_tpu.driver import main; import sys; main(sys.argv[1:])"
    )
    base = [
        sys.executable, "-c", code,
        "--synthetic", "True", "--arch", "TEST-RN", "--dtype", "float32",
        "--remat", "False", "--folder", folder, "--batch_size", "2",
        "--num_compare", "4", "--lr", "1e-3", "--print_freq", "1",
    ]
    # long epoch so the signal always lands mid-epoch
    proc = subprocess.Popen(
        base + ["--epochs", "2", "--n_episodes", "500"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=str(tmp_path), env=env,
    )
    # wait for the first completed train step, then preempt
    saw_loss = False
    deadline = time.time() + 300
    while time.time() < deadline:
        line = proc.stdout.readline()
        if "loss:" in line:
            saw_loss = True
            break
    assert saw_loss, "training never reached a step"
    proc.send_signal(signal.SIGTERM)
    out = proc.communicate(timeout=300)[0]
    assert proc.returncode == 0, out[-2000:]
    assert "preempted (SIGTERM)" in out

    run_dir = os.path.join(folder, "HGR", "adaptive_0.25_0.5")
    assert os.path.isdir(os.path.join(run_dir, "clip_0"))

    # resume from the preemption checkpoint and finish a short epoch 1;
    # no --from_epoch: --resume auto-picks the newest clip_{N}, so the
    # restarted worker can re-run its original command verbatim
    r = subprocess.run(
        base + ["--epochs", "2", "--n_episodes", "2", "--resume", "True"],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path),
        env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert os.path.isdir(os.path.join(run_dir, "clip_1"))
    log = open(os.path.join(run_dir, "arguments.log")).read()
    assert "resumed full state" in log


@pytest.mark.slow
def test_mid_epoch_resume_under_spmd_mesh(tmp_path):
    """Mid-epoch resume with mesh_data=2: the sidecar records
    steps_per_epoch in STEPS (episodes / replicas), the geometry check
    accepts the identical relaunch, and the loader fast-skips
    steps * n_replicas episodes."""
    folder = str(tmp_path / "runs")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo_root,
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "from hgr_tpu.driver import main; import sys; main(sys.argv[1:])"
    )
    base = [
        sys.executable, "-c", code,
        "--synthetic", "True", "--arch", "TEST-RN", "--dtype", "float32",
        "--remat", "False", "--folder", folder, "--batch_size", "2",
        "--num_compare", "4", "--lr", "1e-3", "--print_freq", "1",
        "--epochs", "1", "--n_episodes", "200", "--mesh_data", "2",
    ]
    proc = subprocess.Popen(
        base, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=str(tmp_path), env=env,
    )
    deadline = time.time() + 420
    saw_loss = False
    while time.time() < deadline:
        if "loss:" in proc.stdout.readline():
            saw_loss = True
            break
    assert saw_loss, "spmd training never reached a step"
    proc.send_signal(signal.SIGTERM)
    out = proc.communicate(timeout=300)[0]
    assert proc.returncode == 0, out[-2000:]

    run_dir = os.path.join(folder, "HGR", "adaptive_0.25_0.5")
    import json
    meta = json.load(open(os.path.join(run_dir, "clip_0.meta.json")))
    assert meta["steps_per_epoch"] == 100  # 200 episodes / 2 replicas
    assert 0 < meta["steps_done"] < 100

    r = subprocess.run(
        base + ["--resume", "True"], capture_output=True, text=True,
        timeout=600, cwd=str(tmp_path), env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    log = open(os.path.join(run_dir, "arguments.log")).read()
    assert "re-entering epoch 0 at step" in log
    meta2 = json.load(open(os.path.join(run_dir, "clip_0.meta.json")))
    assert meta2["steps_done"] == 100
