"""LR schedule: linear warmup + cosine decay.

Same semantics as the reference's ``cosine_lr`` closure
(``utils.py:82-95``): ``lr = base * (step+1)/warmup`` during warmup, then
``0.5 * (1 + cos(pi * e / es)) * base`` with ``e = step - warmup``.

Returned as a pure ``step -> lr`` function usable as an optax schedule.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_lr(base_lr: float, warmup_length: int, total_steps: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1.0) / jnp.maximum(warmup_length, 1)
        e = step - warmup_length
        es = jnp.maximum(total_steps - warmup_length, 1)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * e / es)) * base_lr
        if warmup_length <= 0:
            return cos
        return jnp.where(step < warmup_length, warm, cos)

    return schedule
