"""Coverage for utilities: checkpoint discovery, profiling timer, zoo load,
distributed no-op init, format_report."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def test_latest_epoch(tmp_path):
    from hgr_tpu.utils.checkpoint import latest_epoch

    assert latest_epoch(str(tmp_path / "nope")) is None
    for e in (0, 2, 7):
        os.makedirs(tmp_path / f"clip_{e}")
    (tmp_path / "clip_bogus").mkdir()
    assert latest_epoch(str(tmp_path)) == 7


def test_async_checkpoint_saver_roundtrip(tmp_path):
    """Back-to-back async saves (the overlap path) then close must leave
    both checkpoints fully committed and restorable, equal to the blocking
    save_checkpoint contract."""
    from hgr_tpu.utils.checkpoint import (
        AsyncCheckpointSaver,
        restore_checkpoint,
    )

    class _State:
        def __init__(self, params, opt_state, step):
            self.params, self.opt_state, self.step = params, opt_state, step

    def make(seed):
        rng = np.random.default_rng(seed)
        return _State(
            {"w": jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)},
            {"m": jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)},
            jnp.asarray(seed, jnp.int32),
        )

    s0, s1 = make(0), make(1)
    with AsyncCheckpointSaver() as saver:
        saver.save(str(tmp_path), 0, s0)
        saver.save(str(tmp_path), 1, s1)  # waits for epoch-0's write first

    # restore_params ignores saved shardings (device-agnostic: a TPU-written
    # checkpoint restores in a CPU process) but must hand back JAX arrays on
    # the default backend — numpy leaves break traced indexing downstream
    from hgr_tpu.utils.checkpoint import restore_params

    p = restore_params(str(tmp_path / "clip_1"))
    assert isinstance(p["w"], jnp.ndarray) and not isinstance(p["w"], np.ndarray)
    np.testing.assert_array_equal(np.asarray(p["w"]), np.asarray(s1.params["w"]))

    for epoch, want in ((0, s0), (1, s1)):
        got = restore_checkpoint(str(tmp_path / f"clip_{epoch}"), make(9))
        np.testing.assert_array_equal(
            np.asarray(got.params["w"]), np.asarray(want.params["w"])
        )
        np.testing.assert_array_equal(
            np.asarray(got.opt_state["m"]), np.asarray(want.opt_state["m"])
        )
        assert int(got.step) == int(want.step)

    # retention (--keep_checkpoints): only the N newest survive, and the
    # survivors are fully committed/restorable
    import os

    keep_dir = tmp_path / "kept"
    with AsyncCheckpointSaver(keep=2) as saver:
        for e in range(4):
            saver.save(str(keep_dir), e, make(e))
    assert sorted(os.listdir(keep_dir)) == ["clip_2", "clip_3"]
    got = restore_checkpoint(str(keep_dir / "clip_3"), make(9))
    np.testing.assert_array_equal(
        np.asarray(got.params["w"]), np.asarray(make(3).params["w"])
    )


def test_step_timer():
    from hgr_tpu.utils.profiling import StepTimer, annotate

    t = StepTimer(warmup=1)
    for _ in range(4):
        t.start()
        with annotate("unit-test"):
            x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
        t.stop(x)
    s = t.summary(items_per_step=8)
    assert s["steps"] == 3
    assert s["items_per_sec"] > 0
    assert s["p95_ms"] >= s["p50_ms"]


def test_trace_window_short_epochs_and_close(tmp_path):
    """Epochs shorter than the trace window must not double-start a trace on
    the next epoch (the re-entry bug: before() at i==start while a trace is
    still active raises), and close() must flush a still-open window so a
    run that ends mid-window still writes a trace."""
    from hgr_tpu.utils.profiling import TraceWindow

    w = TraceWindow(str(tmp_path / "t1"), start=1, stop=3)
    for epoch in range(2):           # 2-step epochs end before stop=3
        for i in range(2):
            w.before(i)              # second epoch's i==1 hits the guard
            w.after(i)
    assert w._active                 # window still open across epochs
    w.close()                        # run ends mid-window -> flush
    assert not w._active and w._done
    w.close()                        # idempotent
    assert any(tmp_path.joinpath("t1").rglob("*")), "no trace written"

    # no-op when log_dir is empty
    w2 = TraceWindow("", start=0, stop=1)
    w2.before(0)
    w2.after(0)
    w2.close()
    assert not w2._active


def test_zoo_random_load():
    from hgr_tpu.models.zoo import load

    cfg, params = load("RN50", checkpoint=None, seed=0)
    assert cfg.embed_dim == 1024
    assert params["logit_scale"].shape == ()


def test_distributed_noop_single_process():
    from hgr_tpu.parallel import host_local_batch_slice, init_distributed

    idx, count = init_distributed()
    assert idx == 0 and count == 1
    assert host_local_batch_slice(16) == slice(0, 16)


def test_format_report_layout():
    from hgr_tpu.utils.logging import format_report

    s = {
        "hit@1": 1.0, "hit@2": 2.0, "hit@5": 5.0, "hit@10": 10.0,
        "hit@20": 20.0, "tor": 3.0, "path_ratio": 4.0, "point_ratio": 5.0,
    }
    line = format_report(s)
    # reference format: commas between Top@k entries, final one with '.'
    assert line.startswith("Top@1(%):1.00,")
    assert "Top@20(%):20.00." in line
    assert line.endswith(
        "hit_ratio(%):3.00 path_ratio(%):4.00 point_ratio(%):5.00"
    )


def test_native_dct_prescale_path(tmp_path):
    """Large JPEG (min side >= 2x target) exercises the DCT-domain prescale."""
    from hgr_tpu.data.native import decode_resize, load_native

    if load_native() is None:
        pytest.skip("native toolchain unavailable")
    import io

    from PIL import Image

    x = np.linspace(0, 1, 1024)[:, None] * np.linspace(0, 1, 1536)[None, :]
    arr = (np.stack([x, x ** 2, 1 - x], -1) * 255).astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, format="JPEG", quality=95)
    out = decode_resize(b.getvalue(), 224)
    assert out is not None and out.shape == (224, 224, 3)
    from hgr_tpu.data.transforms import preprocess_pil

    ref = preprocess_pil(Image.open(io.BytesIO(b.getvalue())), 224)
    # DCT prescale decodes at 1/2 or 1/4 scale; agreement is looser but the
    # image must still be the same picture
    assert float(np.abs(out - ref).mean()) < 0.05
