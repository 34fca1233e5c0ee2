"""Per-depth loss weighting — vectorized, in-graph versions of the
reference's ``get_weights`` (``model/clip_tree.py:198-219``).

The reference computes a length-``max_depth`` weight vector per loop level;
here weights are evaluated for a whole padded pair schedule at once: given
per-pair ``(pos, length)`` arrays, return ``w[pos]`` of the length-``length``
weight vector for each pair. All six modes:

- ``equal``        1/L
- ``increasing``   (pos+1) / sum(1..L)
- ``decreasing``   (L-pos) / sum(1..L)
- ``nl_increasing``  (pos+1)^3 / sum(i^3)
- ``nl_decreasing``  (L-pos)^3 / sum(i^3)
- ``adaptive``     softmax(100**layer_weight[:L])[pos] with a trainable
                   per-depth parameter (initialized 1/|layer d| * scale).
                   NOTE: in the reference this parameter can never train —
                   ``nn.Parameter(w)*scale`` at ``model/clip_tree.py:74``
                   builds a non-leaf tensor with no grad and no registration
                   — fixed here (see tree_model.py docstring).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MODES = (
    "equal",
    "increasing",
    "decreasing",
    "adaptive",
    "nl_increasing",
    "nl_decreasing",
)


def pair_weights(
    method: str,
    pos: jnp.ndarray,       # [P] int32, position within the loop (0-based)
    length: jnp.ndarray,    # [P] int32, loop length (>= 1)
    layer_weight: jnp.ndarray,  # [n_levels] trainable (adaptive mode only)
) -> jnp.ndarray:
    """Weight of each (pos, length) pair under ``method`` -> [P] fp32."""
    posf = pos.astype(jnp.float32)
    Lf = length.astype(jnp.float32)
    if method == "equal":
        return 1.0 / Lf
    if method == "increasing":
        return (posf + 1.0) / (Lf * (Lf + 1.0) / 2.0)
    if method == "decreasing":
        return (Lf - posf) / (Lf * (Lf + 1.0) / 2.0)
    if method == "nl_increasing":
        num = (posf + 1.0) ** 3
    elif method == "nl_decreasing":
        num = (Lf - posf) ** 3
    elif method == "adaptive":
        n_levels = layer_weight.shape[0]
        base = jnp.power(100.0, layer_weight)          # [n_levels]
        idx = jnp.arange(n_levels)[None, :]            # [1, n_levels]
        mask = idx < length[:, None]                   # [P, n_levels]
        logits = jnp.where(mask, base[None, :], -jnp.inf)
        sm = jax.nn.softmax(logits, axis=-1)           # [P, n_levels]
        return jnp.take_along_axis(sm, pos[:, None], axis=1)[:, 0]
    else:
        raise ValueError(f"unknown weighting method {method!r}; options {MODES}")
    # cubic modes share the denominator sum_{i=1..L} i^3 = (L(L+1)/2)^2
    return num / jnp.square(Lf * (Lf + 1.0) / 2.0)
