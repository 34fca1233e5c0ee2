"""Capture an xprof trace of the RN50 eval or OM train step; print top ops.

The profile-driven view of the two headline loops (reference
``main.py:135-191`` eval, ``model/clip_tree.py:241-280`` train): runs the
jitted step at reference scale, traces N steps with ``jax.profiler``, then
aggregates the Chrome-trace device lane by op and prints per-step costs with
the HLO shapes. Used to produce the "where the step's time goes" tables in
docs/SCALING.md.

    python tools/profile_eval.py [--mode eval|train] [--steps 5] [--out DIR]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup():
    from hgr_tpu.config import Config
    from hgr_tpu.hierarchy import synthetic_hierarchy
    from hgr_tpu.tree_model import TreeModel

    hier = synthetic_hierarchy(branching=3, levels=8, extra_edges=50, seed=0)
    tm = TreeModel.build(Config(arch="RN50"), hier, pad_multiple=18432)
    tm.init_params(0)
    return hier, tm


def capture_eval(out_dir: str, steps: int) -> None:
    import jax
    import jax.numpy as jnp

    hier, tm = _setup()
    rng = np.random.default_rng(0)
    bank = jnp.asarray(
        rng.standard_normal((tm.n_pad, tm.clip_cfg.embed_dim)).astype(np.float32),
        jnp.bfloat16,
    )
    bank_s = tm.sort_bank(bank)
    images = jnp.asarray(rng.integers(0, 256, (512, 224, 224, 3), dtype=np.uint8))
    target = int(hier.level(hier.max_depth)[0])
    m = tm.eval_step_sorted(tm.params, bank_s, images, target)  # compile
    np.asarray(m.num)
    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        m = tm.eval_step_sorted(tm.params, bank_s, images, target)
    np.asarray(m.num)
    jax.profiler.stop_trace()


def capture_train(out_dir: str, steps: int) -> None:
    """Reference-default OM train step (batch 256, num_compare 256, remat),
    the same configuration bench.py's train section measures."""
    import jax
    import jax.numpy as jnp

    from hgr_tpu.config import Config
    from hgr_tpu.train import (
        NegativeSampler,
        ScheduleBuilder,
        init_train_state,
        make_optimizer,
        make_train_step,
        sched_to_device,
    )

    hier, tm = _setup()
    rng = np.random.default_rng(0)
    target = int(hier.level(hier.max_depth)[0])
    tcfg = Config(arch="RN50", num_compare=256, batch_size=256, remat=True)
    tx = make_optimizer(tcfg, total_steps=100)
    state = init_train_state(
        jax.tree.map(jnp.copy, tm.params), tm.layer_weight, tx
    )
    step_fn = make_train_step(tcfg, tm.clip_cfg, tx, dtype=jnp.bfloat16)
    sampler = NegativeSampler(hier, np.arange(hier.num_nodes),
                              tcfg.num_compare, seed=0)
    builder = ScheduleBuilder(hier, sampler, tcfg.out_ratio, tcfg.in_ratio,
                              tcfg.num_compare)
    sched = sched_to_device(builder.build(target))
    images = jnp.asarray(
        rng.standard_normal((tcfg.batch_size, 224, 224, 3)).astype(np.float32)
    )
    node_tokens = jnp.asarray(tm.node_tokens)
    state, loss = step_fn(state, images, node_tokens, sched)  # compile
    float(loss)
    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        state, loss = step_fn(state, images, node_tokens, sched)
    float(loss)
    jax.profiler.stop_trace()


def report(out_dir: str, steps: int, top: int = 15) -> None:
    paths = sorted(glob.glob(os.path.join(out_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {out_dir}")
    d = json.load(gzip.open(paths[-1]))
    evs = d["traceEvents"]
    device_pids = {
        e["pid"] for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    agg: dict = collections.defaultdict(float)
    sample: dict = {}
    total = 0.0
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            agg[e["name"]] += e["dur"]
            sample.setdefault(e["name"], e.get("args", {}))
            if "jit_" not in e["name"]:  # the wrapper event spans all ops
                total += e["dur"]
    ranked = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"device total {total / steps / 1e3:.1f} ms/step ({len(agg)} distinct ops)")
    shown = 0
    for name, dur in ranked:
        if "jit_" in name:  # the whole-step wrapper event double-counts
            continue
        info = str(sample[name].get("long_name", ""))[:110]
        print(f"{dur / steps / 1e3:7.3f} ms/step  {name[:30]:30} {info}")
        shown += 1
        if shown >= top:
            break


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["eval", "train"], default="eval")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default=None)
    ap.add_argument("--report-only", action="store_true",
                    help="parse an existing trace instead of capturing")
    args = ap.parse_args()
    out = args.out or f"/tmp/xprof_{args.mode}"
    if not args.report_only:
        (capture_eval if args.mode == "eval" else capture_train)(out, args.steps)
    report(out, args.steps)


if __name__ == "__main__":
    main()
