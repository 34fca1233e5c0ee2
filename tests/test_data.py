"""Data pipeline tests: grouping invariants, episodes, k-shot, transforms,
corrupt-image fallback."""

import json
import os

import numpy as np
import pytest

from hgr_tpu.data import (
    FileImageSource,
    GroupedTestLoader,
    GroupedTrainLoader,
    SyntheticImageSource,
    kshot_subsample,
    load_manifest,
    preprocess_pil,
)
from hgr_tpu.data.transforms import CLIP_MEAN, CLIP_STD


def _grouped(n_cls=5, sizes=(10, 3, 7, 1, 12)):
    return {f"c{i}": [f"c{i}/img{j}.jpg" for j in range(sizes[i])] for i in range(n_cls)}


CLASS_IDS = {f"c{i}": i for i in range(5)}


def test_train_loader_single_class_batches_and_episode_count():
    g = _grouped()
    loader = GroupedTrainLoader(
        g, CLASS_IDS, SyntheticImageSource(8), batch_size=4, seed=0, num_threads=2
    )
    # reference default: num_data // batch + 1 (imagenet_group.py:61-64)
    assert loader.n_episodes == 33 // 4 + 1
    batches = list(loader)
    assert len(batches) == loader.n_episodes
    for b in batches:
        assert b.images.shape == (4, 8, 8, 3)
        assert 0 <= b.target < 5
        # single-class invariant: all valid rows share the batch's one target
        n_valid = b.valid.sum()
        expected = min(4, len(g[f"c{b.target}"]))
        assert n_valid == expected


def test_train_loader_small_class_yields_all_images():
    g = {"tiny": ["tiny/0.jpg", "tiny/1.jpg"]}
    loader = GroupedTrainLoader(
        g, {"tiny": 0}, SyntheticImageSource(8), batch_size=6, seed=0, num_threads=1
    )
    b = next(iter(loader))
    assert b.valid.sum() == 2


def test_train_loader_covers_all_images_of_large_class():
    g = {"c": [f"c/{j}.jpg" for j in range(8)]}
    loader = GroupedTrainLoader(
        g, {"c": 0}, SyntheticImageSource(4), batch_size=4, n_episodes=2,
        seed=0, num_threads=1,
    )
    seen = []
    for b in loader:
        seen.extend(b.paths)
    # two batches of 4 from an 8-image class = one full permutation
    assert sorted(seen) == sorted(g["c"])


def test_train_loader_skip_next_matches_serving():
    """skip_next(k) must advance the class-order and per-class index streams
    exactly as if k batches had been served: skipping then reading yields
    the SAME batches as serving everything and dropping the first k
    (mid-epoch resume contract, driver --resume)."""
    g = _grouped()
    kw = dict(batch_size=4, n_episodes=8, seed=3, num_threads=1)
    ref = GroupedTrainLoader(g, CLASS_IDS, SyntheticImageSource(8), **kw)
    full = list(ref)
    skipped = GroupedTrainLoader(g, CLASS_IDS, SyntheticImageSource(8), **kw)
    skipped.skip_next(3)
    rest = list(skipped)
    assert len(rest) == len(full) - 3
    for a, b in zip(full[3:], rest):
        assert a.target == b.target
        assert a.paths == b.paths
        np.testing.assert_array_equal(a.valid, b.valid)
    # one-shot: the next epoch is full-length again
    assert len(list(skipped)) == skipped.n_episodes


def test_test_loader_deterministic_and_complete():
    g = _grouped()
    loader = GroupedTestLoader(
        g, CLASS_IDS, SyntheticImageSource(8), batch_size=4, num_threads=2
    )
    # num_batches = sum of ceil(n_c / B) (imagenet_group_test.py:150-163)
    assert loader.num_batches == sum((s + 3) // 4 for s in (10, 3, 7, 1, 12))
    b1 = [(b.target, tuple(b.paths)) for b in loader]
    b2 = [(b.target, tuple(b.paths)) for b in loader]
    assert b1 == b2
    assert len(b1) == loader.num_batches
    total_valid = sum(b.valid.sum() for b in loader)
    assert total_valid == 33


def test_kshot_subsample():
    g = _grouped()
    out = kshot_subsample(g, unseen=["c0", "c4"], k_shots=5, seed=0)
    assert len(out["c0"]) == 5
    assert len(out["c4"]) == 5
    assert len(out["c2"]) == 7  # seen classes untouched
    assert set(out["c0"]) <= set(g["c0"])


def test_manifest_roundtrip(tmp_path):
    g = _grouped()
    p = tmp_path / "train_split.json"
    p.write_text(json.dumps(g))
    m = load_manifest(str(p), candidates=["c1", "c3"])
    assert set(m) == {"c1", "c3"}


def test_preprocess_matches_torchvision_clip_transform():
    """Golden check against the canonical transform (clip/clip.py:71-78)."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, size=(37, 53, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    out = preprocess_pil(img, 16)
    assert out.shape == (16, 16, 3)

    try:
        import torch
        from torchvision import transforms as T
    except ImportError:
        pytest.skip("torchvision unavailable")
    ref_t = T.Compose(
        [
            T.Resize(16, interpolation=T.InterpolationMode.BICUBIC),
            T.CenterCrop(16),
            T.ToTensor(),
            T.Normalize(tuple(CLIP_MEAN), tuple(CLIP_STD)),
        ]
    )
    ref = ref_t(img).numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(out, ref, atol=2e-2)


def test_corrupt_image_fallback(tmp_path):
    from PIL import Image

    good = tmp_path / "good.png"
    Image.fromarray(
        np.full((8, 8, 3), 200, np.uint8)
    ).save(good)
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image")

    src = FileImageSource(resolution=8)
    paths = [str(good), str(bad)]
    out_good = src.load("c", paths, 0)
    out_bad = src.load("c", paths, 1)  # falls back to paths[0]
    np.testing.assert_allclose(out_bad, out_good)


def test_prefetcher_order_and_error_propagation():
    """Prefetcher must preserve stream order under backpressure and re-raise
    producer-thread exceptions in the consumer — a silently truncated
    stream would look like a clean shorter epoch."""
    import time

    from hgr_tpu.data import Prefetcher

    def gen():
        for i in range(20):
            yield i

    slow = []
    for x in Prefetcher(gen, depth=2):
        slow.append(x)
        time.sleep(0.001)  # consumer slower than producer -> queue fills
    assert slow == list(range(20))

    def bad():
        yield 1
        yield 2
        raise ValueError("decode exploded")

    it = iter(Prefetcher(bad, depth=2))
    assert next(it) == 1 and next(it) == 2
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="producer thread failed"):
        next(it)


def test_train_loader_epoch_streams_reproducible_across_instances():
    """set_epoch(e) pins epoch e's batch sequence to (seed, e) alone —
    identical across loader instances and process restarts. This is the
    property that makes mid-epoch resume EXACT for any epoch, not just the
    first (a resumed process's fresh loader must skip precisely the
    episodes the preempted process served)."""
    g = _grouped()
    kw = dict(batch_size=4, n_episodes=6, seed=3, num_threads=1)
    a = GroupedTrainLoader(g, CLASS_IDS, SyntheticImageSource(8), **kw)
    # instance A runs epochs 0..2 continuously
    epochs_a = [list(a) for _ in range(3)]
    # instance B jumps straight to epoch 2
    b = GroupedTrainLoader(g, CLASS_IDS, SyntheticImageSource(8), **kw)
    b.set_epoch(2)
    for x, y in zip(epochs_a[2], list(b)):
        assert x.target == y.target and x.paths == y.paths
    # distinct epochs produce distinct streams (no frozen permutation)
    assert any(
        x.paths != y.paths for x, y in zip(epochs_a[0], epochs_a[1])
    ) or any(
        x.target != y.target for x, y in zip(epochs_a[0], epochs_a[1])
    )
    # mid-epoch resume at epoch 2: fresh instance, skip k, get the tail
    c = GroupedTrainLoader(g, CLASS_IDS, SyntheticImageSource(8), **kw)
    c.set_epoch(2)
    c.skip_next(2)
    for x, y in zip(epochs_a[2][2:], list(c)):
        assert x.target == y.target and x.paths == y.paths


def test_test_loader_close_stops_live_prefetcher():
    """Breaking out of the eval loop early (max_test_batches) leaves the
    prefetch thread mid-produce; close() must stop it before tearing down
    decode resources (driver run_test's finally)."""
    g = {f"c{i}": [f"c{i}/{j}.jpg" for j in range(6)] for i in range(4)}
    ids = {c: i for i, c in enumerate(g)}
    loader = GroupedTestLoader(
        g, ids, SyntheticImageSource(4), batch_size=2, num_threads=1,
        prefetch=1,
    )
    it = iter(loader)
    next(it)  # consume one batch, then abandon the iterator
    p = loader._live_prefetcher
    assert p is not None
    loader.close()
    assert loader._live_prefetcher is None
    assert not p._thread.is_alive()


def test_loader_reiter_stops_previous_prefetcher():
    """Re-entering ``__iter__`` after abandoning an epoch early (exception,
    ``break``) must stop the previous producer thread first — two live
    producers would race over the loader's shared mutable state (rng and
    per-class cursors; an mp pool's single shm buffer)."""
    g = _grouped()
    for make in (
        lambda: GroupedTrainLoader(
            g, CLASS_IDS, SyntheticImageSource(4), batch_size=4, seed=0,
            num_threads=1, prefetch=1,
        ),
        lambda: GroupedTestLoader(
            g, CLASS_IDS, SyntheticImageSource(4), batch_size=4,
            num_threads=1, prefetch=1,
        ),
    ):
        loader = make()
        it = iter(loader)
        next(it)  # consume one batch, then abandon the epoch mid-way
        p_old = loader._live_prefetcher
        assert p_old is not None
        it2 = iter(loader)
        assert loader._live_prefetcher is not p_old
        assert not p_old._thread.is_alive()
        # the fresh epoch still yields its full, uncorrupted batch count
        n2 = sum(1 for _ in it2)
        fresh = make()
        assert n2 == sum(1 for _ in iter(fresh))
        loader.close()
        fresh.close()


def test_flat_loader_epoch_streams_reproducible_across_instances():
    """FlatTrainLoader.set_epoch(e) pins epoch e's shuffle to (seed, e)
    alone — same restart-deterministic contract as GroupedTrainLoader, so
    a resumed flat/baseline run (driver.run_train_flat) replays the exact
    batch sequence of the preempted process."""
    from hgr_tpu.data.pipeline import FlatTrainLoader

    g = _grouped()
    kw = dict(batch_size=4, seed=7, num_threads=1, prefetch=1)
    a = FlatTrainLoader(g, CLASS_IDS, SyntheticImageSource(8), **kw)
    epochs_a = [[lab.tolist() for _, lab, _ in a] for _ in range(3)]
    a.close()
    b = FlatTrainLoader(g, CLASS_IDS, SyntheticImageSource(8), **kw)
    b.set_epoch(2)
    assert [lab.tolist() for _, lab, _ in b] == epochs_a[2]
    b.close()
    # distinct epochs produce distinct shuffles (no frozen permutation)
    assert epochs_a[0] != epochs_a[1]


def test_prefetcher_stop_race_stress():
    """Regression: stop() racing the producer's in-flight put. The drained
    slot can be refilled by a put that was already blocking with its 0.1s
    timeout, leaving the queue full when the producer's finally-clause
    posts the done sentinel — which previously used a blocking put() and
    deadlocked the thread (stop()'s join then stalled its full 30s and
    leaked the thread). The sentinel put now yields a slot itself whenever
    stop is set. 200 adversarial iterations; pre-fix this flaked."""
    import itertools
    import time

    from hgr_tpu.data import Prefetcher

    def fast_gen():
        # tiny finite stream: the producer reaches its finally clause
        # (normal exhaustion) at roughly the same moment stop() drains
        for i in range(3):
            yield i

    for k in range(200):
        p = Prefetcher(fast_gen, depth=1)
        if k % 3 == 0:
            time.sleep(0.0005)  # vary the interleaving
        p.stop(join_timeout=5.0)
        assert not p._thread.is_alive(), f"producer leaked at iter {k}"


def test_prefetcher_stop_unblocks_blocked_consumer():
    """stop()'s queue drain can swallow an already-posted done sentinel;
    a consumer thread still sitting in ``__iter__``'s blocking ``get()``
    (the driver's step-prefetch thread, as ``run_train``'s finally closes
    the loader) would then hang forever. stop() must re-post the sentinel
    after the join so every consumer terminates."""
    import threading

    from hgr_tpu.data import Prefetcher

    def gen():
        yield from range(2)

    p = Prefetcher(gen, depth=4)
    p._thread.join(timeout=5.0)  # producer exhausts, sentinel is queued
    assert not p._thread.is_alive()
    p.stop(join_timeout=5.0)  # drain swallows items AND the sentinel

    finished = threading.Event()

    def consume():
        assert list(p) == []  # pre-fix: blocks forever on an empty queue
        finished.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    assert finished.wait(timeout=5.0), "consumer hung after stop()"
