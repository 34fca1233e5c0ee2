"""Headline benchmark: CLIP RN50 zero-shot eval throughput on one chip.

Measures the full jitted eval step — image encode (bf16) -> cosine logits
against the padded 18,278-class bank -> flat+hierarchical metrics — i.e. the
work the reference performs per eval batch (``main.py:135-191``), at
test batch size 512 (reference default, ``main.py:38``).

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec/chip, "unit": ..., "vs_baseline": value/2000}
(the 2k imgs/sec/chip RN50-eval target from BASELINE.json's north star).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hgr_tpu.config import Config
    from hgr_tpu.hierarchy import synthetic_hierarchy
    from hgr_tpu.tree_model import TreeModel

    batch = 512
    n_classes_pad = 18432  # 18,278 padded

    # synthetic stand-in hierarchy at ImageNet-21K scale is unnecessary for
    # throughput; metrics cost depends on N_pad and chain length, so use a
    # deep synthetic DAG and pad the node axis to the real size.
    hier = synthetic_hierarchy(branching=3, levels=8, extra_edges=50, seed=0)
    config = Config(arch="RN50")
    tm = TreeModel.build(config, hier, pad_multiple=n_classes_pad)
    tm.init_params(0)

    rng = np.random.default_rng(0)
    bank = jnp.asarray(
        rng.standard_normal((tm.n_pad, tm.clip_cfg.embed_dim)).astype(np.float32),
        jnp.bfloat16,
    )
    res = tm.clip_cfg.image_resolution
    images = jnp.asarray(
        rng.standard_normal((batch, res, res, 3)).astype(np.float32), jnp.bfloat16
    )
    target = int(hier.level(hier.max_depth)[0])

    # depth-sorted fast path (all per-level argmaxes in one logits pass)
    bank_s = tm.sort_bank(bank)

    # warmup / compile
    m = tm.eval_step_sorted(tm.params, bank_s, images, target)
    jax.block_until_ready(m)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        m = tm.eval_step_sorted(tm.params, bank_s, images, target)
    # fetch the final metrics: device execution is in-order, so
    # materializing the last step's output drains the whole queue —
    # block_until_ready alone is not trustworthy through remote tunnels
    np.asarray(m.num)
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "rn50_zeroshot_eval_imgs_per_sec_per_chip",
                "value": round(imgs_per_sec, 1),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(imgs_per_sec / 2000.0, 3),
            }
        )
    )


def _run_with_watchdog(timeout_s: float = 420.0, retries: int = 2) -> None:
    """Run the measurement in a child process with a timeout.

    The TPU tunnel in this environment rarely (but not never) hangs a whole
    process; a fresh process recovers. The parent holds no TPU state (jax is
    only imported inside main), so the child gets the chip cleanly.
    """
    import subprocess
    import sys

    for attempt in range(retries + 1):
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import bench; bench.main()"],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                capture_output=True, text=True, timeout=timeout_s,
            )
        except subprocess.TimeoutExpired:
            print(f"# bench attempt {attempt + 1} timed out; retrying",
                  flush=True)
            continue
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode == 0 and lines:
            print(lines[-1])
            return
        print(f"# bench attempt {attempt + 1} failed (rc={proc.returncode}): "
              f"{proc.stderr[-300:] if proc.stderr else ''}", flush=True)
    # last resort: run inline so a hard failure is at least visible
    main()


if __name__ == "__main__":
    import os

    if os.environ.get("HGR_BENCH_INNER"):
        main()
    else:
        os.environ["HGR_BENCH_INNER"] = "1"
        _run_with_watchdog()
