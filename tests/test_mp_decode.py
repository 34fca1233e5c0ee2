"""Multi-process decode pool: parity with the thread-pool path, mixed-class
pairs mode, corrupt-image fallback across the process boundary, CPU
accounting, clean shutdown. This is the TPU-native equivalent of the
reference's 12-worker DataLoader process boundary
(``dataset/imagenet_group.py:105``)."""

import io
import os

import numpy as np
import pytest

from hgr_tpu.data.mp_decode import ProcessDecodePool
from hgr_tpu.data.pipeline import (
    FileImageSource,
    FlatTrainLoader,
    GroupedTestLoader,
)


def _jpeg(path, seed, w=96, h=80):
    from PIL import Image

    rng = np.random.default_rng(seed)
    x = rng.random((8, 8, 3))
    arr = (np.kron(x, np.ones((h // 8, w // 8, 1))) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path, format="JPEG", quality=92)


@pytest.fixture()
def jpeg_tree(tmp_path):
    grouped = {}
    for c in range(3):
        d = tmp_path / f"c{c}"
        d.mkdir()
        paths = []
        for j in range(5):
            p = d / f"{j}.jpg"
            _jpeg(str(p), seed=c * 100 + j)
            paths.append(f"c{c}/{j}.jpg")
        grouped[f"c{c}"] = paths
    return str(tmp_path), grouped


def test_pool_matches_thread_path(jpeg_tree):
    root, grouped = jpeg_tree
    src = FileImageSource(resolution=32, image_root=root)
    cls = "c1"
    idxs = [0, 3, 2, 4]
    want = np.stack([src.load(cls, grouped[cls], i) for i in idxs])
    with ProcessDecodePool(32, batch_size=8, image_root=root,
                           num_workers=2) as pool:
        got = pool.decode(cls, grouped[cls], idxs)
        np.testing.assert_array_equal(got, want)
        # accounting: every image counted, CPU time observed
        assert pool.images_decoded == len(idxs)
        assert pool.cpu_s_per_image > 0.0
        # pairs mode (mixed classes) matches per-row loads
        pairs = [
            (os.path.join(c, f"{j}.jpg"), grouped[c][0])
            for c, j in [("c0", 1), ("c2", 4), ("c1", 0)]
        ]
        want2 = np.stack([
            src.load(c, grouped[c], j) for c, j in [("c0", 1), ("c2", 4), ("c1", 0)]
        ])
        np.testing.assert_array_equal(pool.decode_pairs(pairs), want2)


def test_pool_corrupt_fallback_crosses_process(jpeg_tree):
    root, grouped = jpeg_tree
    bad = os.path.join(root, "c0", "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg at all")
    paths = [grouped["c0"][0], "c0/bad.jpg"]
    src = FileImageSource(resolution=32, image_root=root)
    first = src.load("c0", paths, 0)
    with ProcessDecodePool(32, batch_size=4, image_root=root,
                           num_workers=2) as pool:
        out = pool.decode("c0", paths, [1])
        # corrupt row silently becomes the class's first image
        # (reference dataset/imagenet.py:149-152)
        np.testing.assert_array_equal(out[0], first)


def test_pool_worker_error_propagates(jpeg_tree):
    """A decode failure that even the fallback can't absorb (both the row's
    path and the class's first image are missing) must surface as a parent
    RuntimeError — not a silent zero row or a hung queue — and the pool must
    still be usable afterwards."""
    root, grouped = jpeg_tree
    with ProcessDecodePool(32, batch_size=4, image_root=root,
                           num_workers=2) as pool:
        with pytest.raises(RuntimeError, match="decode worker failed"):
            pool.decode("cX", ["cX/none.jpg", "cX/other.jpg"], [1])
        out = pool.decode("c0", grouped["c0"], [0, 1])  # pool still healthy
        assert out.shape[0] == 2


def test_pool_partial_failure_drains_acks(jpeg_tree):
    """One failing slice in a MULTI-worker batch must not leave the
    surviving workers' 'ok' acks queued: the next decode() would consume
    the stale acks and return rows its own workers hadn't written yet.
    All acks are drained before the error is raised."""
    root, grouped = jpeg_tree
    src = FileImageSource(resolution=32, image_root=root)
    with ProcessDecodePool(32, batch_size=4, image_root=root,
                           num_workers=2) as pool:
        # 2 rows across 2 workers: slice 0 fails (no path, no fallback),
        # slice 1 succeeds — one 'err' ack + one 'ok' ack
        pairs = [("cX/none.jpg", "cX/other.jpg"),
                 (grouped["c1"][2], grouped["c1"][0])]
        with pytest.raises(RuntimeError, match="decode worker failed"):
            pool.decode_pairs(pairs)
        # the NEXT batch on the same pool must be freshly decoded, not
        # buffer contents released by the previous batch's stale acks
        idxs = [4, 1, 3]
        want = np.stack([src.load("c2", grouped["c2"], i) for i in idxs])
        np.testing.assert_array_equal(
            pool.decode("c2", grouped["c2"], idxs), want)
        # accounting includes the failed batch's surviving slice (1 image
        # really was decoded and its CPU spent) + the 3 fresh rows
        assert pool.images_decoded == 1 + len(idxs)


def test_workers_exit_when_parent_dies_uncleanly(jpeg_tree):
    """A SIGKILLed/hard-exited parent skips close(); spawn DAEMON workers
    survive that (atexit never runs) and used to linger holding /dev/shm.
    Workers must notice the reparenting and exit on their own."""
    import subprocess
    import sys
    import time

    root, _ = jpeg_tree
    code = f"""
import os
from hgr_tpu.data.mp_decode import ProcessDecodePool
pool = ProcessDecodePool(32, batch_size=4, image_root={root!r},
                         num_workers=1, orphan_poll_s=1.0)
pool.decode("c0", ["c0/0.jpg"], [0])  # workers fully up
print(" ".join(str(p.pid) for p in pool._procs), flush=True)
os._exit(0)  # hard exit: no close(), no atexit
"""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120, env=dict(os.environ, PYTHONPATH=repo_root),
    )
    pids = [int(p) for p in out.stdout.split()]
    assert pids, out.stderr[-500:]
    deadline = time.time() + 30
    while time.time() < deadline:
        alive = []
        for pid in pids:
            try:
                os.kill(pid, 0)
                alive.append(pid)
            except ProcessLookupError:
                pass
        if not alive:
            return
        time.sleep(0.5)
    raise AssertionError(f"orphaned decode workers still alive: {alive}")


def test_grouped_test_loader_mp_equals_threads(jpeg_tree):
    root, grouped = jpeg_tree
    ids = {c: i for i, c in enumerate(grouped)}
    src = FileImageSource(resolution=32, image_root=root)
    lt = GroupedTestLoader(grouped, ids, src, batch_size=4, num_threads=2)
    lm = GroupedTestLoader(grouped, ids, src, batch_size=4, num_threads=2,
                           num_procs=2)
    try:
        bt = list(lt)
        bm = list(lm)
        assert len(bt) == len(bm) == lt.num_batches
        for a, b in zip(bt, bm):
            assert a.target == b.target
            np.testing.assert_array_equal(a.valid, b.valid)
            np.testing.assert_array_equal(a.images, b.images)
    finally:
        lm.close()


def test_grouped_train_loader_mp_equals_threads(jpeg_tree):
    from hgr_tpu.data.pipeline import GroupedTrainLoader

    root, grouped = jpeg_tree
    ids = {c: i for i, c in enumerate(grouped)}
    src = FileImageSource(resolution=32, image_root=root)
    kw = dict(batch_size=4, n_episodes=6, seed=11, num_threads=2)
    lt = GroupedTrainLoader(grouped, ids, src, **kw)
    lm = GroupedTrainLoader(grouped, ids, src, num_procs=2, **kw)
    try:
        for a, b in zip(lt, lm):  # same seed -> same class/index draws
            assert a.target == b.target
            np.testing.assert_array_equal(a.valid, b.valid)
            np.testing.assert_array_equal(a.images, b.images)
    finally:
        lm.close()


def test_flat_loader_mp_equals_threads(jpeg_tree):
    root, grouped = jpeg_tree
    ids = {c: i for i, c in enumerate(grouped)}
    src = FileImageSource(resolution=32, image_root=root)
    lt = FlatTrainLoader(grouped, ids, src, batch_size=4, seed=7, num_threads=2)
    lm = FlatTrainLoader(grouped, ids, src, batch_size=4, seed=7, num_threads=2,
                         num_procs=2)
    try:
        for (ia, la, va), (ib, lb, vb) in zip(lt, lm):
            np.testing.assert_array_equal(la, lb)
            np.testing.assert_array_equal(va, vb)
            np.testing.assert_array_equal(ia, ib)
    finally:
        lm.close()


def test_pool_refuses_reuse_after_timeout_poisoning():
    """An ack timeout leaves unknown in-flight acks; the pool must refuse
    further decodes loudly (late acks would be mis-attributed to the next
    batch and return rows its workers never wrote)."""
    import pytest

    from hgr_tpu.data.mp_decode import ProcessDecodePool

    pool = ProcessDecodePool(8, 4, num_workers=1)
    try:
        pool._broken = True  # what the Empty-timeout path sets
        with pytest.raises(RuntimeError, match="unusable"):
            pool.decode("c", ["a.jpg"], [0])
    finally:
        pool._broken = False
        pool.close()
