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
