"""CNZSL baseline: class-embedding -> visual-prototype MLP with class
standardization.

Behavioural rebuild of ``baseline/CNZSL/cnzsl.py:139-377``:

- 3-layer MLP attr -> 2048-d prototypes with two ClassStandardization
  layers (running-stat BatchNorm without affine over the CLASS axis) and the
  paper's "proper init" for the last linear
- logits = (5 * l2norm(feats)) @ (5 * l2norm(protos)).T
- trained with CE over seen classes on frozen ResNet50 features; evaluated
  with the shared hierarchical metric engine using accumulated (not batch)
  standardization statistics (``cnzsl.py:225`` "model.eval() Important!").

Functional state: standardization running stats are part of a separate
``state`` pytree threaded through train steps (JAX-style, replacing in-place
buffer mutation).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class CNZSLConfig:
    attr_dim: int
    proto_dim: int = 2048
    hid_dim: int = 1024
    use_class_standardization: bool = True
    use_proper_init: bool = True
    scale: float = 5.0
    momentum: float = 0.1


def cnzsl_init(key, cfg: CNZSLConfig) -> Tuple[Dict, Dict]:
    k1, k2, k3 = jax.random.split(key, 3)

    def linear(k, a, b):
        bound = float(np.sqrt(1.0 / a))  # torch nn.Linear default
        kw, kb = jax.random.split(k)
        return {
            "w": jax.random.uniform(kw, (a, b), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (b,), jnp.float32, -bound, bound),
        }

    params = {
        "fc1": linear(k1, cfg.attr_dim, cfg.hid_dim),
        "fc2": linear(k2, cfg.hid_dim, cfg.hid_dim),
        "fc3": linear(k3, cfg.hid_dim, cfg.proto_dim),
    }
    if cfg.use_proper_init:
        # weight_var = 1/(hid*proto); U(-b, b) with b = sqrt(3*var)
        # (cnzsl.py:176-179)
        b = float(np.sqrt(3.0 / (cfg.hid_dim * cfg.proto_dim)))
        kw = jax.random.fold_in(k3, 1)
        params["fc3"]["w"] = jax.random.uniform(
            kw, (cfg.hid_dim, cfg.proto_dim), jnp.float32, -b, b
        )
    state = {
        "cs1": {"mean": jnp.zeros(cfg.hid_dim), "var": jnp.ones(cfg.hid_dim)},
        "cs2": {"mean": jnp.zeros(cfg.hid_dim), "var": jnp.ones(cfg.hid_dim)},
    }
    return params, state


def _standardize(x, st, training: bool, momentum: float):
    """ClassStandardization (cnzsl.py:139-174): normalize over the class
    axis; running stats updated in train, used verbatim in eval."""
    if training:
        mean = x.mean(axis=0)
        var = x.var(axis=0)
        out = (x - mean[None]) / (var[None] + 1e-5)
        new = {
            "mean": (1 - momentum) * st["mean"] + momentum * mean,
            "var": (1 - momentum) * st["var"] + momentum * var,
        }
        return out, new
    return (x - st["mean"][None]) / (st["var"][None] + 1e-5), st


def cnzsl_protos(
    params: Dict, state: Dict, attrs: jnp.ndarray, cfg: CNZSLConfig, training: bool
) -> Tuple[jnp.ndarray, Dict]:
    h = jax.nn.relu(attrs @ params["fc1"]["w"] + params["fc1"]["b"])
    h = h @ params["fc2"]["w"] + params["fc2"]["b"]
    if cfg.use_class_standardization:
        h, cs1 = _standardize(h, state["cs1"], training, cfg.momentum)
    else:
        cs1 = state["cs1"]
    h = jax.nn.relu(h)
    if cfg.use_class_standardization:
        h, cs2 = _standardize(h, state["cs2"], training, cfg.momentum)
    else:
        cs2 = state["cs2"]
    protos = jax.nn.relu(h @ params["fc3"]["w"] + params["fc3"]["b"])
    return protos, {"cs1": cs1, "cs2": cs2}


def cnzsl_logits(
    params: Dict,
    state: Dict,
    feats: jnp.ndarray,   # [B, proto_dim] frozen backbone features
    attrs: jnp.ndarray,   # [C, attr_dim]
    cfg: CNZSLConfig,
    training: bool = False,
) -> Tuple[jnp.ndarray, Dict]:
    protos, new_state = cnzsl_protos(params, state, attrs, cfg, training)
    x = cfg.scale * feats / jnp.maximum(
        jnp.linalg.norm(feats, axis=1, keepdims=True), 1e-12
    )
    p = cfg.scale * protos / jnp.maximum(
        jnp.linalg.norm(protos, axis=1, keepdims=True), 1e-12
    )
    return x @ p.T, new_state


def make_cnzsl_train_step(cfg: CNZSLConfig, tx):
    import optax

    def loss_fn(params, state, feats, attrs, labels):
        logits, new_state = cnzsl_logits(
            params, state, feats, attrs, cfg, training=True
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
        return loss, new_state

    @jax.jit
    def step(params, state, opt_state, feats, attrs, labels):
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state, feats, attrs, labels
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    return step
