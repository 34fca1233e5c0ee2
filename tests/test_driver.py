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
