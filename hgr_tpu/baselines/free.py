"""FREE baseline: WGAN-GP + VAE feature generator with feature refinement.

Behavioural rebuild of ``baseline/FREE/`` (``model.py``, ``train_free.py``,
``center_loss.py``, ``classifier.py``): a conditional VAE-GAN over frozen
backbone features, conditioned on class embeddings ("attributes" = CLIP text
features or w2v, ``train_free.py:242-244``):

- Encoder(feat, att) -> (mu, logvar); Generator(z, att) -> sigmoid(feat);
  Discriminator(feat, att) -> critic score (``model.py:18-84``)
- FR feature-refinement net: feat -> hidden -> (mu, sigma) -> sigmoid
  reconstruction of the attribute, with an auxiliary critic + seen-class
  classifier head (``model.py:86-130``)
- losses: WGAN-GP critic (gradient penalty ``train_free.py:111-127``,
  adaptive lambda ``:330-334``), VAE = sum-BCE + KLD (``:83-88``),
  WeightedL1 attribute reconstruction (``:96-100``), TripCenterLoss with
  margin on FR's mu (``center_loss.py:16-45``)
- synthesis: generate features for unseen classes and train a softmax
  classifier (``classifier.py``)

JAX structure: three optax optimizers (D+FR+centers / E+G) stepped from
jitted update fns; Python alternation mirrors the reference's critic_iter
loop. All nets are plain linear stacks — the TPU work is batched matmuls.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclass
class FREEConfig:
    res_size: int = 2048     # feature dim (frozen ResNet50)
    att_size: int = 1024     # attribute/class-embedding dim
    latent_size: int = 1024
    ngh: int = 4096
    ndh: int = 4096
    nclass_seen: int = 983
    lr: float = 1e-4
    dec_lr: float = 1e-4
    beta1: float = 0.5
    critic_iter: int = 5
    lambda1: float = 10.0    # GP weight (adapted during training)
    gammaD: float = 10.0
    gammaG: float = 10.0
    recons_weight: float = 0.1
    center_weight: float = 0.5
    center_margin: float = 200.0
    incenter_weight: float = 0.8
    syn_num: int = 300       # synthesized features per unseen class


def _linear(key, a, b):
    # reference weights_init: N(0, 0.02) weights, zero bias
    kw, _ = jax.random.split(key)
    return {"w": 0.02 * jax.random.normal(kw, (a, b)), "b": jnp.zeros((b,))}


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def free_init(key, cfg: FREEConfig) -> Dict:
    ks = jax.random.split(key, 12)
    return {
        "E": {
            "fc1": _linear(ks[0], cfg.res_size + cfg.latent_size, cfg.ngh),
            "fc3": _linear(ks[1], cfg.ngh, cfg.latent_size * 2),
            "mu": _linear(ks[2], cfg.latent_size * 2, cfg.latent_size),
            "logvar": _linear(ks[3], cfg.latent_size * 2, cfg.latent_size),
        },
        "G": {
            "fc1": _linear(ks[4], cfg.latent_size * 2, cfg.ngh),
            "fc3": _linear(ks[5], cfg.ngh, cfg.res_size),
        },
        "D": {
            "fc1": _linear(ks[6], cfg.res_size + cfg.att_size, cfg.ndh),
            "fc2": _linear(ks[7], cfg.ndh, 1),
        },
        "FR": {
            "fc1": _linear(ks[8], cfg.res_size, cfg.ngh),
            "fc3": _linear(ks[9], cfg.ngh, cfg.att_size * 2),
            "disc": _linear(ks[10], cfg.att_size, 1),
            "cls": _linear(ks[11], cfg.att_size, cfg.nclass_seen),
        },
        "centers": jax.random.normal(
            jax.random.fold_in(key, 99), (cfg.nclass_seen, cfg.att_size)
        ),
    }


def _apply(p, x):
    return x @ p["w"] + p["b"]


def encoder(pE, feat, att):
    x = jnp.concatenate([feat, att], -1)
    x = _lrelu(_apply(pE["fc1"], x))
    x = _lrelu(_apply(pE["fc3"], x))
    return _apply(pE["mu"], x), _apply(pE["logvar"], x)


def generator(pG, z, att):
    x = jnp.concatenate([z, att], -1)
    x = _lrelu(_apply(pG["fc1"], x))
    return jax.nn.sigmoid(_apply(pG["fc3"], x))


def discriminator(pD, feat, att):
    x = jnp.concatenate([feat, att], -1)
    return _apply(pD["fc2"], _lrelu(_apply(pD["fc1"], x)))[:, 0]


def fr_forward(pFR, feat, rng, att_size: int, train_G: bool = False):
    """-> (mu, std, critic, class_logprobs, recon)  (model.py:104-127)."""
    h = _lrelu(_apply(pFR["fc1"], feat))
    lat = _apply(pFR["fc3"], h)
    mu, std = lat[:, :att_size], jax.nn.sigmoid(lat[:, att_size:])
    eps = jax.random.normal(rng, mu.shape)
    enc = eps * std + mu
    critic = _apply(pFR["disc"], mu if train_G else enc)[:, 0]
    logp = jax.nn.log_softmax(_apply(pFR["cls"], mu), -1)
    recon = jax.nn.sigmoid(enc)
    return mu, std, critic, logp, recon


def vae_loss(recon, x, mu, logvar):
    """sum-BCE + KLD, batch-averaged (train_free.py:83-88)."""
    eps = 1e-12
    bce = -(x * jnp.log(recon + eps) + (1 - x) * jnp.log(1 - recon + eps)).sum()
    kld = -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar))
    return (bce + kld) / x.shape[0]


def weighted_l1(pred, gt):
    """(train_free.py:96-100)."""
    wt = (pred - gt) ** 2
    wt = wt / jnp.sqrt(wt.sum(1, keepdims=True) + 1e-12)
    return (wt * jnp.abs(pred - gt)).sum() / pred.shape[0]


def trip_center_loss(centers, x, labels, other_labels, margin, incenter_weight):
    """TripCenterLoss_margin (center_loss.py:16-45)."""
    d = (
        (x ** 2).sum(1, keepdims=True)
        + (centers ** 2).sum(1)[None, :]
        - 2 * x @ centers.T
    )
    own = jnp.take_along_axis(d, labels[:, None], 1)[:, 0]
    other = jnp.take_along_axis(d, other_labels[:, None], 1)[:, 0]
    return (
        jnp.maximum(margin + incenter_weight * own - (1 - incenter_weight) * other, 0.0)
    ).sum() / x.shape[0]


def gradient_penalty(critic_fn, rng, real, fake):
    """WGAN-GP on interpolates (train_free.py:111-127), via jvp-free grad."""
    alpha = jax.random.uniform(rng, (real.shape[0], 1))
    inter = alpha * real + (1 - alpha) * fake

    def f(z):
        return critic_fn(z).sum()

    grads = jax.grad(f)(inter)
    norms = jnp.sqrt((grads ** 2).sum(1) + 1e-12)
    return ((norms - 1.0) ** 2).mean()


def make_free_steps(cfg: FREEConfig):
    """Jitted (D+FR+centers) and (E+G) update steps."""
    txD = optax.adam(cfg.lr, b1=cfg.beta1)
    txFR = optax.adam(cfg.dec_lr, b1=cfg.beta1)
    txC = optax.adam(cfg.lr, b1=cfg.beta1)
    txEG = optax.adam(cfg.lr, b1=cfg.beta1)

    def d_loss_fn(pD, params, feat, att, fake, lambda1, rng):
        real_score = discriminator(pD, feat, att).mean()
        fake_score = discriminator(pD, fake, att).mean()
        gp = gradient_penalty(
            lambda z: discriminator(pD, z, att), rng, feat, fake
        )
        d_cost = cfg.gammaD * (fake_score - real_score + lambda1 * gp)
        return d_cost, (real_score - fake_score, gp)

    def fr_loss_fn(pFR, centers, feat, att, labels, other_labels, rng):
        mu, std, _, _, recon = fr_forward(pFR, feat, rng, cfg.att_size)
        r_cost = cfg.recons_weight * weighted_l1(recon, att)
        c_loss = trip_center_loss(
            centers, mu, labels, other_labels, cfg.center_margin,
            cfg.incenter_weight,
        )
        return c_loss * cfg.center_weight + r_cost

    @jax.jit
    def d_step(params, optD, optFR, optC, feat, att, labels, other_labels,
               lambda1, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        z = jax.random.normal(r1, (feat.shape[0], cfg.latent_size))
        fake = generator(params["G"], z, att)

        frl, gFR_and_C = jax.value_and_grad(
            lambda pfr_c: fr_loss_fn(
                pfr_c[0], pfr_c[1], feat, att, labels, other_labels, r2
            )
        )((params["FR"], params["centers"]))
        gFR, gC = gFR_and_C

        (d_cost, (wass, gp)), gD = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(params["D"], params, feat, att, fake, lambda1, r3)

        uD, optD = txD.update(gD, optD, params["D"])
        uFR, optFR = txFR.update(gFR, optFR, params["FR"])
        uC, optC = txC.update(gC, optC, params["centers"])
        params = dict(params)
        params["D"] = optax.apply_updates(params["D"], uD)
        params["FR"] = optax.apply_updates(params["FR"], uFR)
        params["centers"] = optax.apply_updates(params["centers"], uC)
        return params, optD, optFR, optC, d_cost, wass, gp

    def g_loss_fn(pEG, params, feat, att, rng):
        pE, pG = pEG
        r1, r2 = jax.random.split(rng)
        mu, logvar = encoder(pE, feat, att)
        std = jnp.exp(0.5 * logvar)
        z = jax.random.normal(r1, mu.shape) * std + mu
        recon = generator(pG, z, att)
        vae = vae_loss(recon, feat, mu, logvar)
        critic = discriminator(params["D"], recon, att).mean()
        _, _, fr_critic, _, fr_recon = fr_forward(
            params["FR"], recon, r2, cfg.att_size, train_G=True
        )
        r_cost = cfg.recons_weight * weighted_l1(fr_recon, att)
        return vae - cfg.gammaG * critic + r_cost

    @jax.jit
    def g_step(params, optEG, feat, att, rng):
        loss, gEG = jax.value_and_grad(g_loss_fn)(
            (params["E"], params["G"]), params, feat, att, rng
        )
        uEG, optEG = txEG.update(gEG, optEG, (params["E"], params["G"]))
        newE, newG = optax.apply_updates((params["E"], params["G"]), uEG)
        params = dict(params)
        params["E"], params["G"] = newE, newG
        return params, optEG, loss

    def init_opts(params):
        return (
            txD.init(params["D"]),
            txFR.init(params["FR"]),
            txC.init(params["centers"]),
            txEG.init((params["E"], params["G"])),
        )

    return d_step, g_step, init_opts


def synthesize_features(
    params, cfg: FREEConfig, attrs: jnp.ndarray, num_per_class: int, rng
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate ``num_per_class`` features per class (classifier.py usage)."""
    C = attrs.shape[0]
    z = jax.random.normal(rng, (C, num_per_class, cfg.latent_size))
    att = jnp.broadcast_to(attrs[:, None, :], (C, num_per_class, cfg.att_size))
    feats = generator(
        params["G"],
        z.reshape(C * num_per_class, -1),
        att.reshape(C * num_per_class, -1),
    )
    labels = jnp.repeat(jnp.arange(C), num_per_class)
    return feats, labels


def train_softmax_classifier(
    rng,
    feats: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int,
    lr: float = 1e-3,
    epochs: int = 10,
    batch: int = 512,
) -> Dict:
    """Softmax classifier over (synthesized) features — the reference's
    ``classifier.py`` final stage."""
    dim = feats.shape[1]
    k1, rng = jax.random.split(rng)
    params = _linear(k1, dim, num_classes)
    tx = optax.adam(lr, b1=0.5)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, y):
        def loss_fn(p):
            return optax.softmax_cross_entropy_with_integer_labels(
                _apply(p, x), y
            ).mean()

        loss, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, loss

    n = feats.shape[0]
    for e in range(epochs):
        rng, pk = jax.random.split(rng)
        perm = jax.random.permutation(pk, n)
        for s in range(0, n - batch + 1, batch):
            idx = perm[s : s + batch]
            params, opt, _ = step(params, opt, feats[idx], labels[idx])
    return params


def other_labels(rng, labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Random different-class labels (center_loss.py:9-13)."""
    idx = jax.random.randint(rng, labels.shape, 0, num_classes)
    out = labels + idx
    return jnp.where(out >= num_classes, out - num_classes, out)
