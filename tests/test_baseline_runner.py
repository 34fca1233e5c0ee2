"""End-to-end baseline runner: CNZSL must actually learn the synthetic
attr->feature mapping and beat chance comfortably on zero-shot classes."""

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
