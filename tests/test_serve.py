"""Serving API: classify / predict_paths / classify_files."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hgr_tpu.config import Config  # noqa: E402
from hgr_tpu.serve import ZeroShotClassifier  # noqa: E402
from hgr_tpu.tree_model import TreeModel  # noqa: E402


@pytest.fixture(scope="module")
def clf(tiny_hierarchy):
    cfg = Config(arch="TEST-RN", dtype="float32")
    tm = TreeModel.build(cfg, tiny_hierarchy, pad_multiple=64)
    tm.init_params(0)
    c = ZeroShotClassifier(tm, candidates="all")
    c.refresh_bank()
    return c


def test_classify_shapes_and_ranges(clf):
    imgs = np.random.default_rng(0).standard_normal((3, 32, 32, 3)).astype(np.float32)
    ids, scores = clf.classify(imgs, k=5)
    assert ids.shape == (3, 5) and scores.shape == (3, 5)
    n = clf.tm.hier.num_nodes
    assert (ids >= 0).all() and (ids < n).all()  # never a padded class
    # scores descending, raw cosine range
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    assert np.abs(scores).max() <= 1.0 + 1e-4


def test_classify_matches_bank_argmax(clf):
    tm = clf.tm
    imgs = np.random.default_rng(1).standard_normal((2, 32, 32, 3)).astype(np.float32)
    ids, _ = clf.classify(imgs, k=1)
    # oracle: full unsorted bank argmax over real nodes
    bank = tm.update_classifier()
    logits = np.asarray(tm.forward(tm.params, bank, jnp.asarray(imgs)))
    want = logits[:, : tm.hier.num_nodes].argmax(1)
    np.testing.assert_array_equal(ids[:, 0], want)


def test_predict_paths_levels(clf):
    tm = clf.tm
    imgs = np.random.default_rng(2).standard_normal((2, 32, 32, 3)).astype(np.float32)
    paths = clf.predict_paths(imgs)
    assert paths.shape == (2, tm.hier.max_depth + 1)
    for b in range(2):
        for lvl in range(paths.shape[1]):
            assert int(tm.hier.depth[paths[b, lvl]]) == lvl


def test_classify_files(clf, tmp_path):
    from PIL import Image

    p = tmp_path / "x.png"
    Image.fromarray(
        np.random.default_rng(3).integers(0, 255, (40, 40, 3), dtype=np.uint8)
    ).save(p)
    out = clf.classify_files([str(p), str(p)], k=3, batch=2)
    assert len(out) == 2 and len(out[0]) == 3
    wnid, score = out[0][0]
    assert wnid in clf.tm.hier.name_to_id
    assert out[0] == out[1]


def test_classify_files_num_procs_matches_thread_path(clf, tmp_path):
    """The process-pool decode option (num_procs>0, data/mp_decode.py) must
    return exactly the thread-pool path's answers — same FileImageSource
    defaults (native decode, raw uint8), only the execution vehicle differs."""
    from PIL import Image

    rng = np.random.default_rng(11)
    files = []
    for i in range(3):
        p = tmp_path / f"mp{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (52, 44, 3), dtype=np.uint8)
        ).save(p)
        files.append(str(p))

    want = clf.classify_files(files, k=3, batch=3)
    got = clf.classify_files(files, k=3, batch=3, num_procs=2)
    assert got == want


def test_classify_files_matches_host_normalized_path(clf, tmp_path):
    """classify_files ships raw uint8 to the device (normalization fuses
    into the encoder, models/clip.py); its predictions must match classify()
    on host-normalized float images — this is the regression where an
    astype(float32) on raw uint8 silently skipped normalization."""
    import jax.numpy as jnp
    from PIL import Image

    from hgr_tpu.data import FileImageSource

    rng = np.random.default_rng(7)
    files = []
    for i in range(3):
        p = tmp_path / f"img{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (48, 40, 3), dtype=np.uint8)
        ).save(p)
        files.append(str(p))

    out = clf.classify_files(files, k=1, batch=3)

    src = FileImageSource(clf.tm.clip_cfg.image_resolution, raw_uint8=False)
    arr = np.stack([src.load("", [p], 0) for p in files]).astype(np.float32)
    ids, _ = clf.classify(arr, k=1)
    want = [clf.tm.hier.names[int(i)] for i in ids[:, 0]]
    got = [row[0][0] for row in out]
    assert got == want


def test_serve_cli_json_lines(tmp_path, capsys):
    """``python -m hgr_tpu.serve`` end-to-end: serving flags parsed here,
    model flags forwarded to the Config parser, one JSON line per image."""
    import json

    from PIL import Image

    from hgr_tpu import serve

    rng = np.random.default_rng(21)
    files = []
    for i in range(2):
        p = tmp_path / f"cli{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        ).save(p, quality=90)
        files.append(str(p))

    serve.main(files + ["--k", "3", "--candidates", "all",
                        "--synthetic", "True", "--arch", "TEST-RN"])
    out = capsys.readouterr().out
    recs = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    assert [r["image"] for r in recs] == files
    for r in recs:
        assert len(r["topk"]) == 3
        scores = [t["score"] for t in r["topk"]]
        assert scores == sorted(scores, reverse=True)
        assert all(abs(s) <= 1.0 + 1e-4 for s in scores)  # raw cosine
