"""Headline benchmark suite on one real TPU chip.

Three sections, all at reference scale (RN50, 18,278-class bank padded to
18,432):

1. **device eval** — the jitted zero-shot eval step (bf16 image encode ->
   cosine logits vs the padded bank -> flat+hierarchical metrics), i.e. the
   per-batch work of the reference's ``test()`` (``main.py:135-191``) at the
   reference test batch 512 (``main.py:38``).
2. **end-to-end eval** — the same step fed by the REAL input pipeline:
   on-disk JPEGs -> ``GroupedTestLoader`` + ``FileImageSource`` (native C++
   decode/resize/normalize) -> device. Also reports the loader-only rate.
   This host has very few cores (production TPU-VM hosts have ~28-112);
   the per-core loader rate is the portable number.
3. **train step** — the jitted OM training step (batch 256, num_compare 256,
   remat on — reference defaults ``main.py:37,48-59``; hot loop
   ``model/clip_tree.py:241-280``), replacing the previously unaudited
   docs-only claim.

Prints ONE JSON line (the driver contract): the headline metric is the
device eval rate vs the 2k imgs/sec/chip north star; the other sections are
nested under ``"extra"``.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _gen_jpegs(root: str, n_classes: int, per_class: int) -> dict:
    """Synthetic on-disk JPEG tree (smooth low-frequency content, so decode
    cost is realistic rather than noise-worst-case)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    for c in range(n_classes):
        d = os.path.join(root, f"c{c}")
        if os.path.isdir(d) and len(os.listdir(d)) >= per_class:
            continue
        os.makedirs(d, exist_ok=True)
        for j in range(per_class):
            x = rng.standard_normal((16, 16, 3))
            img = np.kron(x, np.ones((20, 20, 1)))  # 320x320
            img = ((img - img.min()) / (np.ptp(img) + 1e-9) * 255).astype(
                np.uint8
            )
            Image.fromarray(img).save(os.path.join(d, f"{j}.jpg"), quality=90)
    return {
        f"c{c}": [f"c{c}/{j}.jpg" for j in range(per_class)]
        for c in range(n_classes)
    }


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hgr_tpu.config import Config
    from hgr_tpu.data.pipeline import FileImageSource, GroupedTestLoader
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

    # ---- 1. device eval (depth-sorted fast path) --------------------------
    bank_s = tm.sort_bank(bank)
    m = tm.eval_step_sorted(tm.params, bank_s, images, target)  # compile
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
    eval_rate = batch * iters / dt
    print(f"# device eval: {eval_rate:.1f} imgs/s", flush=True)

    # ---- 2. end-to-end eval over the real input pipeline ------------------
    jpeg_root = os.environ.get("HGR_BENCH_JPEG_DIR", "/tmp/hgr_bench_jpegs")
    grouped = _gen_jpegs(jpeg_root, n_classes=4, per_class=batch)
    ids = {c: i for i, c in enumerate(grouped)}
    src = FileImageSource(res, image_root=jpeg_root)
    n_cores = os.cpu_count() or 1
    threads = max(1, min(8, n_cores))

    loader = GroupedTestLoader(grouped, ids, src, batch, num_threads=threads)
    n = 0
    t0 = time.perf_counter()
    for b in loader:
        n += int(b.valid.sum())
    loader_rate = n / (time.perf_counter() - t0)
    print(
        f"# loader only: {loader_rate:.1f} imgs/s on {n_cores} core(s) "
        f"(native decode, {loader_rate / n_cores:.1f}/core)",
        flush=True,
    )

    loader = GroupedTestLoader(grouped, ids, src, batch, num_threads=threads)
    n = 0
    t0 = time.perf_counter()
    for b in loader:
        # same shapes as section 1 => the jitted step is already compiled
        mt = tm.eval_step_sorted(
            tm.params, bank_s, jnp.asarray(b.images),
            target, valid=jnp.asarray(b.valid),
        )
        n += int(b.valid.sum())
    np.asarray(mt.num)
    e2e_rate = n / (time.perf_counter() - t0)
    print(f"# end-to-end eval (JPEG->metrics): {e2e_rate:.1f} imgs/s", flush=True)

    # ---- 3. OM train step --------------------------------------------------
    from hgr_tpu.train import (
        NegativeSampler,
        ScheduleBuilder,
        init_train_state,
        make_optimizer,
        make_train_step,
        sched_to_device,
    )

    tcfg = Config(arch="RN50", num_compare=256, batch_size=256, remat=True)
    tx = make_optimizer(tcfg, total_steps=100)
    state = init_train_state(tm.params, tm.layer_weight, tx)
    step_fn = make_train_step(tcfg, tm.clip_cfg, tx, dtype=jnp.bfloat16)

    sampler = NegativeSampler(
        hier, np.arange(hier.num_nodes), tcfg.num_compare, seed=0
    )
    builder = ScheduleBuilder(
        hier, sampler, tcfg.out_ratio, tcfg.in_ratio, tcfg.num_compare
    )
    sched = sched_to_device(builder.build(target))
    timages = jnp.asarray(
        rng.standard_normal((tcfg.batch_size, res, res, 3)).astype(np.float32)
    )
    node_tokens = jnp.asarray(tm.node_tokens)
    state, loss = step_fn(state, timages, node_tokens, sched)  # compile
    float(loss)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step_fn(state, timages, node_tokens, sched)
    float(loss)  # fetch to sync honestly
    dt = time.perf_counter() - t0
    train_rate = tcfg.batch_size * iters / dt
    step_ms = dt / iters * 1000
    print(f"# train step: {step_ms:.1f} ms, {train_rate:.1f} imgs/s", flush=True)

    print(
        json.dumps(
            {
                "metric": "rn50_zeroshot_eval_imgs_per_sec_per_chip",
                "value": round(eval_rate, 1),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(eval_rate / 2000.0, 3),
                "extra": {
                    "train_imgs_per_sec": round(train_rate, 1),
                    "train_step_ms": round(step_ms, 1),
                    "train_batch": tcfg.batch_size,
                    "num_compare": tcfg.num_compare,
                    "remat": True,
                    "loader_imgs_per_sec": round(loader_rate, 1),
                    "loader_imgs_per_sec_per_core": round(
                        loader_rate / n_cores, 1
                    ),
                    "host_cores": n_cores,
                    "e2e_eval_imgs_per_sec": round(e2e_rate, 1),
                },
            }
        )
    )


def _run_with_watchdog(timeout_s: float = 480.0, retries: int = 2) -> None:
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
        for line in proc.stdout.splitlines():
            if line.startswith("#"):
                print(line, flush=True)
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode == 0 and lines:
            print(lines[-1])
            return
        print(f"# bench attempt {attempt + 1} failed (rc={proc.returncode}): "
              f"{proc.stderr[-300:] if proc.stderr else ''}", flush=True)
    # last resort: run inline so a hard failure is at least visible
    main()


if __name__ == "__main__":
    if os.environ.get("HGR_BENCH_INNER"):
        main()
    else:
        os.environ["HGR_BENCH_INNER"] = "1"
        _run_with_watchdog()
