"""DGP stage-A' backbone refit: retrain the ResNet-50 base under a FROZEN
GCN-predicted classifier.

Behavioural rebuild of ``baseline/DGP/train_resnet_fit.py``: the
GCN-predicted fc rows for the seen classes are fixed into the head
(``:50-52`` — weight = pred[:, :-1], bias = pred[:, -1]) and ONLY the base
parameters train (``:57`` optimizes ``model.resnet_base.parameters()``),
with SGD(lr=1e-4, momentum=0.9), cross-entropy over the seen classes
(``:58,74-75``) and train-mode BatchNorm (``:55`` ``model.train()`` —
here ``resnet_std.resnet50_features_train``). The running
loss/accuracy follow the reference's EMA with keep-ratio 0.9975 (``:60,
83-85``) and travel in a ``trlog`` history (``:61-63,94-95``).

Augmentation: the reference trains with RandomResizedCrop(224) +
RandomHorizontalFlip (``:34-38``). The flip is applied device-side here
(uint8 width reversal before normalization, zero extra HBM traffic); the
random-resized crop is NOT replicated — the loader's deterministic
short-side resize + center crop stands in (the fused native decode path).
Device-side random crops of a pre-decoded larger resolution are the
TPU-native extension point if crop augmentation proves load-bearing.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def fc_from_pred(pred_vectors: np.ndarray, feat_dim: int = 2048) -> Dict:
    """Predicted classifier rows -> frozen head ``{"w": [D, C], "b": [C]}``.

    The reference's pred rows are [C, 2049] weight+bias
    (``train_resnet_fit.py:50-52``); plain [C, 2048] rows (a GCN trained
    against bias-less prototypes) get a zero bias.
    """
    import jax.numpy as jnp

    pred_vectors = np.asarray(pred_vectors, np.float32)
    if pred_vectors.shape[1] == feat_dim + 1:
        return {
            "w": jnp.asarray(pred_vectors[:, :-1].T),
            "b": jnp.asarray(pred_vectors[:, -1]),
        }
    if pred_vectors.shape[1] == feat_dim:
        return {
            "w": jnp.asarray(pred_vectors.T),
            "b": jnp.zeros((pred_vectors.shape[0],), jnp.float32),
        }
    raise ValueError(
        f"pred rows are {pred_vectors.shape[1]}-d; expected feat_dim "
        f"({feat_dim}) or feat_dim+1 (weights + bias column)"
    )


def make_refit_step(tx, crop: int, dtype=None, augment: bool = True):
    """-> jitted ``step(base, opt_state, fc, images, labels, valid, key)``
    returning ``(base, opt_state, loss, acc)``.

    ``base`` is the backbone param tree WITHOUT the fc head; ``fc`` is the
    frozen injected classifier (no gradients — the reference leaves it out
    of the optimizer, ``train_resnet_fit.py:57``). BN runs in train mode;
    the momentum-updated running stats are folded back into ``base`` after
    the SGD update.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.resnet_std import apply_bn_stats, resnet50_features_train
    from .features import preprocess_for_backbone

    if dtype is None:
        dtype = jnp.bfloat16

    def loss_fn(base, fc, images, labels, valid):
        x = preprocess_for_backbone(images, crop)
        feats, bn_stats = resnet50_features_train(base, x, dtype=dtype)
        feats = feats.astype(jnp.float32)
        logits = feats @ fc["w"] + fc["b"]
        logp = jax.nn.log_softmax(logits)
        ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        denom = jnp.maximum(valid.sum(), 1)
        loss = jnp.where(valid, ce, 0.0).sum() / denom
        hit = jnp.where(valid, logits.argmax(axis=1) == labels, False)
        return loss, (hit.sum() / denom, bn_stats)

    @jax.jit
    def step(base, opt_state, fc, images, labels, valid, key):
        if augment:
            flip = jax.random.bernoulli(key, shape=(images.shape[0],))
            images = jnp.where(
                flip[:, None, None, None], images[:, :, ::-1, :], images
            )
        (loss, (acc, bn_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(base, fc, images, labels, valid)
        updates, opt_state = tx.update(grads, opt_state, base)
        base = optax.apply_updates(base, updates)
        return apply_bn_stats(base, bn_stats), opt_state, loss, acc

    return step


def refit_backbone(
    backbone_params,
    pred_vectors: np.ndarray,
    loader,
    steps: int,
    lr: float = 1e-4,
    momentum: float = 0.9,
    crop: int = 224,
    seed: int = 0,
    log_every: int = 0,
    augment: bool = True,
) -> Tuple[Dict, Dict]:
    """Run the stage-A' refit loop -> ``(refit_params, trlog)``.

    ``loader`` is a ``FlatTrainLoader`` over the SEEN-class images whose
    labels index rows of ``pred_vectors`` (the reference asserts this
    alignment against the train dir, ``train_resnet_fit.py:43``); epochs
    cycle until ``steps`` batches have been consumed. ``refit_params``
    includes the (unchanged) frozen fc so it drops straight into
    ``features.make_featurizer`` / ``resnet50_logits``.
    """
    import jax
    import optax

    tx = optax.sgd(lr, momentum=momentum)
    base = {k: v for k, v in backbone_params.items() if k != "fc"}
    fc = fc_from_pred(
        pred_vectors, feat_dim=int(backbone_params["conv1"]["w"].shape[3]) * 32
    )
    opt_state = tx.init(base)
    step = make_refit_step(tx, crop, augment=augment)
    key = jax.random.PRNGKey(seed)

    keep = 0.9975  # the reference's running-average keep ratio (:60)
    ave_loss = ave_acc = None
    trlog = {"loss": [], "acc": [], "step_loss": []}
    done, epoch = 0, 0
    while done < steps:
        loader.set_epoch(epoch)
        for images, labels, valid in loader:
            key, k = jax.random.split(key)
            base, opt_state, loss, acc = step(
                base, opt_state, fc, images, labels, valid, k
            )
            loss, acc = float(loss), float(acc)
            trlog["step_loss"].append(loss)
            if ave_loss is None:
                ave_loss, ave_acc = loss, acc
            else:
                ave_loss = ave_loss * keep + loss * (1 - keep)
                ave_acc = ave_acc * keep + acc * (1 - keep)
            done += 1
            if log_every and done % log_every == 0:
                print(
                    f"refit {done}/{steps}: loss={loss:.4f} ({ave_loss:.4f})"
                    f", acc={acc:.4f} ({ave_acc:.4f})",
                    flush=True,
                )
            if done >= steps:
                break
        trlog["loss"].append(ave_loss)
        trlog["acc"].append(ave_acc)
        epoch += 1
    return {**base, "fc": fc}, trlog
