"""Ahead-of-time decode cache (data/decode_cache.py): bit-equality with the
online decode path, loader drop-in, corrupt-image fallback baked at build
time, staleness detection, and the CLI/driver entry points. The cache is the
replay answer to the measured ~2 CPU ms/JPEG host-feed budget
(docs/SCALING.md "Feeding the chip")."""

import json
import os

import numpy as np
import pytest

from hgr_tpu.data.decode_cache import (
    CachedImageSource,
    build_cache,
    open_or_build,
)
from hgr_tpu.data.pipeline import FileImageSource, GroupedTestLoader


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


def test_cache_rows_equal_online_decode(jpeg_tree, tmp_path):
    root, grouped = jpeg_tree
    cache = str(tmp_path / "cache")
    build_cache(grouped, cache, resolution=32, image_root=root)
    src_file = FileImageSource(resolution=32, image_root=root)
    src_cache = CachedImageSource(cache)
    assert src_cache.resolution == 32 and src_cache.raw_uint8
    for cls, paths in grouped.items():
        for i in range(len(paths)):
            np.testing.assert_array_equal(
                src_cache.load(cls, paths, i), src_file.load(cls, paths, i)
            )


def test_cached_loader_equals_file_loader(jpeg_tree, tmp_path):
    root, grouped = jpeg_tree
    cache = str(tmp_path / "cache")
    build_cache(grouped, cache, resolution=32, image_root=root)
    ids = {c: i for i, c in enumerate(grouped)}
    lf = GroupedTestLoader(grouped, ids,
                           FileImageSource(resolution=32, image_root=root),
                           batch_size=4, num_threads=2)
    lc = GroupedTestLoader(grouped, ids, CachedImageSource(cache),
                           batch_size=4, num_threads=2)
    bf, bc = list(lf), list(lc)
    assert len(bf) == len(bc) == lf.num_batches
    for a, b in zip(bf, bc):
        assert a.target == b.target
        np.testing.assert_array_equal(a.valid, b.valid)
        np.testing.assert_array_equal(a.images, b.images)


def test_cached_train_loader_equals_file_loader(jpeg_tree, tmp_path):
    from hgr_tpu.data.pipeline import GroupedTrainLoader

    root, grouped = jpeg_tree
    cache = str(tmp_path / "cache")
    build_cache(grouped, cache, resolution=32, image_root=root)
    ids = {c: i for i, c in enumerate(grouped)}
    kw = dict(batch_size=4, n_episodes=6, seed=3, num_threads=2)
    lf = GroupedTrainLoader(grouped, ids,
                            FileImageSource(resolution=32, image_root=root),
                            **kw)
    lc = GroupedTrainLoader(grouped, ids, CachedImageSource(cache), **kw)
    for a, b in zip(lf, lc):  # same seed -> same class/index draws
        assert a.target == b.target
        np.testing.assert_array_equal(a.images, b.images)


def test_corrupt_fallback_baked_at_build(jpeg_tree, tmp_path):
    """A corrupt JPEG is substituted by the class's first image AT BUILD
    TIME (reference semantics, dataset/imagenet.py:149-152), so the cache
    replays the fallback row forever after."""
    root, grouped = jpeg_tree
    bad = os.path.join(root, "c1", "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg")
    grouped = dict(grouped)
    grouped["c1"] = grouped["c1"] + ["c1/bad.jpg"]
    cache = str(tmp_path / "cache")
    build_cache(grouped, cache, resolution=32, image_root=root)
    src_file = FileImageSource(resolution=32, image_root=root)
    src_cache = CachedImageSource(cache)
    first = src_file.load("c1", grouped["c1"], 0)
    np.testing.assert_array_equal(
        src_cache.load("c1", grouped["c1"], 5), first
    )


def test_stale_cache_fails_loudly(jpeg_tree, tmp_path):
    root, grouped = jpeg_tree
    cache = str(tmp_path / "cache")
    build_cache(grouped, cache, resolution=32, image_root=root)
    src = CachedImageSource(cache)
    # unknown class and out-of-range index -> KeyError
    with pytest.raises(KeyError):
        src.load("cX", ["cX/0.jpg"], 0)
    with pytest.raises(KeyError):
        src.load("c0", grouped["c0"] + ["c0/extra.jpg"], 5)
    # a different path list at the same slot (e.g. a k-shot subsample the
    # cache was not built from) -> ValueError, never wrong pixels
    shuffled = list(reversed(grouped["c0"]))
    with pytest.raises(ValueError, match="stale"):
        src.load("c0", shuffled, 0)


def test_open_or_build_builds_then_reopens(jpeg_tree, tmp_path, capsys):
    root, grouped = jpeg_tree
    cache = str(tmp_path / "cache")
    s1 = open_or_build(cache, grouped, 32, image_root=root)
    assert "building decode cache" in capsys.readouterr().out
    s2 = open_or_build(cache, grouped, 32, image_root=root)  # no rebuild
    assert "building" not in capsys.readouterr().out
    np.testing.assert_array_equal(
        s1.load("c2", grouped["c2"], 3), s2.load("c2", grouped["c2"], 3)
    )


def test_resolution_mismatch_fails_loudly(jpeg_tree, tmp_path):
    """A cache built at 32 opened for an arch that needs 48 must raise a
    clear rebuild error, not feed wrong-sized rows that surface later as a
    confusing positional-embedding shape failure."""
    root, grouped = jpeg_tree
    cache = str(tmp_path / "cache")
    build_cache(grouped, cache, resolution=32, image_root=root)
    with pytest.raises(ValueError, match="built at resolution 32"):
        CachedImageSource(cache, expected_resolution=48)
    # matching resolution still opens
    assert CachedImageSource(cache, expected_resolution=32).resolution == 32


def test_open_or_build_self_heals_on_mismatch(jpeg_tree, tmp_path, capsys):
    """``open_or_build`` (the driver's ``--decode_cache`` entry point) must
    not hard-fail production startup when the cache at the given path was
    built for another arch's resolution or an older transform version: the
    existing cache is left intact (it still serves the run it was built
    for) and a version-keyed sibling is built and used instead."""
    root, grouped = jpeg_tree
    cache = str(tmp_path / "cache")
    build_cache(grouped, cache, resolution=32, image_root=root)
    s48 = open_or_build(cache, grouped, 48, image_root=root)
    out = capsys.readouterr().out
    assert "unusable for this run" in out and "building decode cache" in out
    assert s48.resolution == 48
    assert s48.load("c0", grouped["c0"], 0).shape[:2] == (48, 48)
    # the original cache is untouched and still serves a 32-res run
    assert CachedImageSource(cache, expected_resolution=32).resolution == 32
    # a second open at 48 reuses the sibling without rebuilding
    s48b = open_or_build(cache, grouped, 48, image_root=root)
    assert "building" not in capsys.readouterr().out
    np.testing.assert_array_equal(
        s48.load("c1", grouped["c1"], 2), s48b.load("c1", grouped["c1"], 2)
    )


def test_build_thread_fallback_matches_serial(jpeg_tree, tmp_path):
    """num_procs=0 builds decode through a thread pool (num_threads) — the
    output must be bit-identical to a fully serial build."""
    root, grouped = jpeg_tree
    c1 = str(tmp_path / "serial")
    c2 = str(tmp_path / "threaded")
    build_cache(grouped, c1, resolution=32, image_root=root, num_threads=1)
    build_cache(grouped, c2, resolution=32, image_root=root, num_threads=4)
    a, b = CachedImageSource(c1), CachedImageSource(c2)
    for cls, paths in grouped.items():
        for i in range(len(paths)):
            np.testing.assert_array_equal(
                a.load(cls, paths, i), b.load(cls, paths, i))


def test_cli_build(jpeg_tree, tmp_path):
    from hgr_tpu.data.decode_cache import _main

    root, grouped = jpeg_tree
    manifest = tmp_path / "split.json"
    manifest.write_text(json.dumps(grouped))
    cache = str(tmp_path / "cache")
    _main(["build", str(manifest), cache, "--resolution", "32",
           "--image_root", root])
    src = CachedImageSource(cache)
    want = FileImageSource(resolution=32, image_root=root).load(
        "c0", grouped["c0"], 2
    )
    np.testing.assert_array_equal(src.load("c0", grouped["c0"], 2), want)


def test_transform_version_mismatch_fails_loudly(jpeg_tree, tmp_path):
    """A cache built with an older decode geometry (v1 round/floor, or any
    version != current) must refuse to open: its rows differ from the
    online path by up to a 1-px shift/scale, which would silently break
    the cache's bit-equality contract."""
    import json
    import os

    root, grouped = jpeg_tree
    cache = str(tmp_path / "cache")
    build_cache(grouped, cache, resolution=32, image_root=root)
    meta_path = os.path.join(cache, "meta.json")
    meta = json.load(open(meta_path))
    assert meta["transform"] == 2  # current version recorded at build

    del meta["transform"]  # a pre-versioning (v1 geometry) cache
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(ValueError, match="transform .*version 1"):
        CachedImageSource(cache)

    meta["transform"] = 99
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(ValueError, match="rebuild"):
        CachedImageSource(cache)


def test_build_rejects_float_source_loudly(jpeg_tree, tmp_path):
    """The cache memmap is uint8: a float-emitting source (e.g.
    ``FileImageSource(raw_uint8=False)``, whose rows are normalized floats
    in roughly [-2, 2]) would be silently wrapped by numpy's cast into
    garbage pixels. The build must fail loudly instead."""
    root, grouped = jpeg_tree
    cache = str(tmp_path / "cache")
    src = FileImageSource(resolution=32, image_root=root, raw_uint8=False)
    with pytest.raises(ValueError, match="uint8"):
        build_cache(grouped, cache, resolution=32, image_root=root,
                    source=src)
    assert not os.path.exists(os.path.join(cache, "meta.json"))
