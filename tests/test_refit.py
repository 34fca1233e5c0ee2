"""DGP stage-A' refit: train-mode BN oracle vs torch, frozen-fc semantics,
and single-batch overfit (reference ``baseline/DGP/train_resnet_fit.py``)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hgr_tpu.baselines.refit import fc_from_pred, refit_backbone  # noqa: E402
from hgr_tpu.models.resnet_std import (  # noqa: E402
    apply_bn_stats,
    resnet50_features_train,
)


def test_fc_from_pred_bias_and_biasless_rows():
    pred = np.random.default_rng(0).standard_normal((5, 9)).astype(np.float32)
    fc = fc_from_pred(pred, feat_dim=8)  # weights + bias column
    assert fc["w"].shape == (8, 5) and fc["b"].shape == (5,)
    np.testing.assert_allclose(np.asarray(fc["w"]).T, pred[:, :-1])
    np.testing.assert_allclose(np.asarray(fc["b"]), pred[:, -1])

    fc = fc_from_pred(pred[:, :8], feat_dim=8)  # bias-less rows -> zero bias
    assert fc["w"].shape == (8, 5)
    np.testing.assert_array_equal(np.asarray(fc["b"]), 0.0)

    with pytest.raises(ValueError):
        fc_from_pred(pred, feat_dim=16)


def test_train_mode_bn_matches_torch_batchnorm2d():
    """The train-mode BN must reproduce ``torch.nn.BatchNorm2d`` train
    semantics exactly — normalize with BIASED batch var, update running
    stats with the UNBIASED var at momentum 0.1 — the mode the reference
    refits in (``train_resnet_fit.py:55`` ``model.train()``). Checked on
    an isolated BN (torchvision is absent in this image, so the oracle is
    torch's own BatchNorm2d, which torchvision's resnet50 instantiates)."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(1)
    C = 8
    x = rng.standard_normal((4, 6, 6, C)).astype(np.float32)
    scale = rng.standard_normal(C).astype(np.float32)
    bias = rng.standard_normal(C).astype(np.float32)
    run_m = rng.standard_normal(C).astype(np.float32)
    run_v = np.abs(rng.standard_normal(C)).astype(np.float32) + 0.5

    bn = torch.nn.BatchNorm2d(C, momentum=0.1)
    bn.train()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(run_m))
        bn.running_var.copy_(torch.from_numpy(run_v))
        ref = bn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    from hgr_tpu.models.resnet_std import bn_train

    p = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias),
         "mean": jnp.asarray(run_m), "var": jnp.asarray(run_v)}
    ours, st = bn_train(p, jnp.asarray(x), momentum=0.1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(st["mean"]), bn.running_mean.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(st["var"]), bn.running_var.numpy(), atol=1e-5, rtol=1e-5
    )


def test_train_mode_forward_full_graph_and_stats_coverage():
    """Full-net train-mode forward: every BN in the ResNet-50 tree yields a
    stats update (53 = stem + 48 block BNs + 4 downsamples), the features
    are finite and input-determined (running stats feed only the eval
    path), and ``apply_bn_stats`` is pure."""
    from hgr_tpu.models.resnet_std import resnet50_features, resnet50_init

    rng = np.random.default_rng(2)
    params = resnet50_init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))

    feats, stats = resnet50_features_train(params, x, dtype=jnp.float32)
    assert np.isfinite(np.asarray(feats)).all()
    assert len(stats) == 53
    assert "bn1" in stats and "layer2/0/downsample/bn" in stats
    for upd in stats.values():
        assert set(upd) == {"mean", "var"}

    # fold updates in; the original tree is untouched, non-BN leaves shared
    p2 = apply_bn_stats(params, stats)
    assert p2["conv1"]["w"] is params["conv1"]["w"]
    assert float(np.abs(np.asarray(params["bn1"]["mean"])).max()) == 0.0
    np.testing.assert_allclose(
        np.asarray(p2["bn1"]["mean"]), np.asarray(stats["bn1"]["mean"])
    )

    # batch stats are input-determined, not running-stat-determined: a
    # second train pass through the stat-updated tree reproduces the first
    # forward exactly (running stats only feed the EVAL path)
    feats2, _ = resnet50_features_train(p2, x, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(feats2), atol=1e-6
    )

    # and the eval-mode forward through the same tree is a DIFFERENT
    # function of the running stats (init stats: mean 0, var 1)
    fe = resnet50_features(params, x, dtype=jnp.float32)
    assert not np.allclose(np.asarray(fe), np.asarray(feats), atol=1e-3)


class _OneBatchLoader:
    """Minimal FlatTrainLoader stand-in: the same batch every epoch."""

    def __init__(self, images, labels):
        self.images, self.labels = images, labels

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        yield self.images, self.labels, np.ones(len(self.labels), bool)


@pytest.mark.slow
def test_refit_overfits_one_batch_and_freezes_fc():
    """SGD on the base under a frozen fc must reduce the CE on a repeated
    batch (the reference's loop drives exactly this signal,
    ``train_resnet_fit.py:70-92``), and must NOT touch the fc."""
    from hgr_tpu.models.resnet_std import resnet50_init

    rng = np.random.default_rng(2)
    params = resnet50_init(jax.random.PRNGKey(0), num_classes=4)
    pred = rng.standard_normal((4, 2049)).astype(np.float32)
    images = rng.integers(0, 256, (6, 64, 64, 3), dtype=np.uint8)
    labels = rng.integers(0, 4, 6).astype(np.int32)

    refit, trlog = refit_backbone(
        params, pred, _OneBatchLoader(images, labels), steps=8, lr=3e-3,
        crop=224, augment=False,
    )
    losses = trlog["step_loss"]
    assert len(losses) == 8 and np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no learning: {losses}"

    # fc is the injected prediction, frozen
    np.testing.assert_allclose(np.asarray(refit["fc"]["w"]).T, pred[:, :-1])
    np.testing.assert_allclose(np.asarray(refit["fc"]["b"]), pred[:, -1])
    # the base DID move
    d = np.abs(
        np.asarray(refit["conv1"]["w"]) - np.asarray(params["conv1"]["w"])
    ).max()
    assert d > 0
