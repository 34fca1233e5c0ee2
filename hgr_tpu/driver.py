"""Top-level driver: train / evaluate, mirroring the reference CLI flows.

Equivalents of the reference's ``train()`` (``main.py:72-101``), ``test()``
(``main.py:104-222``) and ``main()`` (``main.py:225-267``) on the TPU-native
stack. Supports a fully synthetic mode (``--synthetic True``) that fabricates
a hierarchy + image source so every flow runs without the 1.4TB ImageNet-21K
tree — real runs point ``graph_path``/``split_path``/``image_root`` at the
same JSON artifacts the reference uses.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Tuple

import numpy as np

from .config import Config
from .data import (
    FileImageSource,
    GroupedTestLoader,
    GroupedTrainLoader,
    SyntheticImageSource,
    kshot_subsample,
    load_manifest,
)
from .eval.metrics import accumulate, summarize, zeros_metrics
from .hierarchy import Hierarchy, synthetic_hierarchy
from .tree_model import TreeModel
from .utils.checkpoint import restore_params
from .utils.logging import RunLogger


def build_hierarchy(config: Config) -> Tuple[Hierarchy, Dict[str, list]]:
    """Hierarchy + splits from config (synthetic or JSON artifacts)."""
    if getattr(config, "synthetic", False):
        hier = synthetic_hierarchy(
            branching=config.synthetic_branching,
            levels=config.synthetic_levels,
            extra_edges=config.synthetic_extra_edges,
            seed=config.seed,
        )
        rng = np.random.default_rng(config.seed)
        names = list(hier.names)
        n_train = max(1, len(names) * 2 // 3)
        perm = rng.permutation(len(names))
        train = [names[i] for i in sorted(perm[:n_train])]
        rest = [names[i] for i in sorted(perm[n_train:])]
        splits = {"train": train, "rest": rest, "all": train + rest}
        return hier, splits
    hier = Hierarchy.from_json(config.graph_path)
    with open(config.split_path) as f:
        splits = json.load(f)
    if config.hops_path:
        # hop2/hop3/hop3_pure class lists (data/hops.py outputs) become
        # addressable via --model_test/--data_test
        with open(config.hops_path) as f:
            splits.update(json.load(f))
    return hier, splits


def build_model(config: Config, hier: Hierarchy, splits: Dict[str, list]) -> TreeModel:
    tokenizer = None
    names = None
    if not getattr(config, "synthetic", False):
        from .text import Tokenizer

        try:
            tokenizer = Tokenizer(config.vocab_path or None)
        except FileNotFoundError:
            tokenizer = None
        if config.names_path and os.path.exists(config.names_path):
            with open(config.names_path) as f:
                names = json.load(f)
    tm = TreeModel.build(
        config,
        hier,
        candidates_train=splits[config.model_train],
        candidates_test=splits[config.model_test],
        tokenizer=tokenizer,
        names=names,
        pad_multiple=1024 if hier.num_nodes > 1024 else 128,
        seed=config.seed,
    )
    tm.init_params(config.seed)

    def _apply(restored):
        tm.params, tm.layer_weight = restored["clip"], restored["layer_weight"]
        if "coop_ctx" in restored:
            tm.coop_ctx = restored["coop_ctx"]

    if config.fetch and config.fetch_path:
        _apply(restore_params(config.fetch_path))
    if config.load:
        path = (
            config.load_path
            if config.load_path != "none"
            else os.path.join(config.save_path, f"clip_{config.from_epoch}")
        )
        _apply(restore_params(path))
        print("successfully loaded", flush=True)
    return tm


def _image_source(config: Config, resolution: int, grouped=None, split=""):
    if getattr(config, "synthetic", False):
        return SyntheticImageSource(resolution)
    if config.decode_cache and grouped is not None:
        # ahead-of-time decode cache: build once (per split), replay at
        # memcpy speed thereafter (data/decode_cache.py)
        from .data.decode_cache import open_or_build

        return open_or_build(
            os.path.join(config.decode_cache, split or "default"),
            grouped,
            resolution,
            image_root=config.image_root,
            num_procs=config.num_proc_workers,
        )
    return FileImageSource(resolution, config.image_root)


def _grouped_split(config: Config, split: str, candidates, splits) -> Dict[str, list]:
    if getattr(config, "synthetic", False):
        per = config.synthetic_images_per_class
        grouped = {c: [f"{c}/{j}.jpg" for j in range(per)] for c in candidates}
        if config.k_shots > 0:
            grouped = kshot_subsample(
                grouped, unseen=splits["rest"], k_shots=config.k_shots,
                seed=config.seed,
            )
        return grouped
    base = os.path.join(os.path.dirname(config.split_path), f"{split}_split")
    if os.path.isdir(base + ".idx"):
        # binary mmap index (tools: python -m hgr_tpu.data.manifest_index
        # build {split}_split.json {split}_split.idx) — no JSON parse,
        # paths decode lazily per class, pages shared across processes
        from .data.manifest_index import MmapManifest

        grouped = MmapManifest(base + ".idx").grouped(candidates)
    else:
        grouped = load_manifest(base + ".json", candidates)
    if config.k_shots > 0:
        grouped = kshot_subsample(
            grouped, unseen=splits["rest"], k_shots=config.k_shots, seed=config.seed
        )
    return grouped


def run_test(config: Config, tm: TreeModel, splits, logger: RunLogger) -> Dict[str, float]:
    """Zero-shot evaluation (reference ``test()``, ``main.py:104-222``)."""
    import jax
    import jax.numpy as jnp

    if config.coop:
        from .eval.bank import build_bank_ids

        static, ctx = tm.coop_setup(config.seed)
        if getattr(tm, "coop_ctx", None) is not None:
            ctx = tm.coop_ctx  # trained context from run_train / checkpoint
        bank = build_bank_ids(
            {"clip": tm.params, "coop_ctx": ctx},
            tm.n_pad,
            tm.coop_text_fn(static),
            chunk=min(512, tm.n_pad),
            out_dtype=tm.dtype,
        )
    else:
        bank = tm.update_classifier()

    # multi-chip eval: class bank sharded over the model axis, image batches
    # over data; the jitted eval step picks the shardings up from its inputs
    bank_s = tm.sort_bank(bank)
    batch_sharding = None
    sharded_step = None
    data_shards = 1
    if len(jax.devices()) > 1 and (config.mesh_model > 1 or config.mesh_data != 1):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.mesh import DATA, MODEL, make_mesh

        mesh = make_mesh(data=config.mesh_data, model=config.mesh_model)
        data_shards = mesh.shape[DATA]
        bank_s = jax.device_put(bank_s, NamedSharding(mesh, P(MODEL, None)))
        batch_sharding = NamedSharding(mesh, P(DATA))
        # params must live on the same device set (replicated)
        tm.params = jax.device_put(tm.params, NamedSharding(mesh, P()))
        if config.mesh_model > 1:
            # explicit-collective path: local top-k + ICI merge instead of
            # letting GSPMD all-gather the full logit matrix
            from .parallel.eval_spmd import make_sharded_eval_step

            sharded_step = make_sharded_eval_step(tm, mesh)

    grouped = _grouped_split(
        config, config.data_split_test, splits[config.data_test], splits
    )
    # the batch axis shards over `data`: round the loader batch UP to a mesh
    # multiple (padded rows carry valid=False and don't affect metrics)
    test_bs = config.test_batch_size + (-config.test_batch_size) % data_shards
    loader = GroupedTestLoader(
        grouped,
        {c: tm.hier.name_to_id[c] for c in grouped},
        _image_source(config, tm.clip_cfg.image_resolution, grouped,
                      config.data_split_test),
        test_bs,
        num_threads=config.num_workers,
        num_procs=config.num_proc_workers,
    )
    logger.log_text(f"number of batches:{loader.num_batches}")

    total = zeros_metrics()
    t0 = time.time()
    n_img = 0
    try:
        for i, batch in enumerate(loader):
            # ship the loader's dtype unchanged (raw uint8 by default: 4x
            # less transfer than f32, normalization fused on device;
            # host-side bf16 conversion via ml_dtypes is slower than the copy)
            images = jnp.asarray(batch.images)
            if batch_sharding is not None:
                images = jax.device_put(images, batch_sharding)
            eval_fn = sharded_step if sharded_step is not None else (
                lambda p, b, im, t, valid: tm.eval_step_sorted(
                    p, b, im, t, valid=valid)
            )
            m = eval_fn(
                tm.params, bank_s, images, batch.target,
                valid=jnp.asarray(batch.valid),
            )
            total = accumulate(total, m)
            n_img += int(batch.valid.sum())
            if i % config.print_freq == 0:
                logger.log_eval(
                    summarize(total), tag=f"batch {i}/{loader.num_batches}")
            if 0 < config.max_test_batches <= i + 1:
                logger.log_text(
                    f"stopping early at {i + 1} batches (max_test_batches)")
                break
    finally:
        # reclaim decode workers + /dev/shm now, not at GC time — with
        # test_after_train a fresh pool spawns every epoch
        loader.close()
    dt = time.time() - t0
    summary = summarize(total)
    summary["imgs_per_sec"] = n_img / max(dt, 1e-9)
    logger.log_text("End of testing.")
    logger.log_eval(summary, tag="final")
    logger.log_global_summary(
        config.weights, config.out_ratio, config.in_ratio, summary
    )
    return summary


def run_train_flat(config: Config, tm: TreeModel, splits, logger: RunLogger) -> Any:
    """Flat CE fine-tune: ``--training_method flat`` — accepted but silently
    unimplemented in the reference (``main.py:55``, ``model/clip_tree.py:222``,
    SURVEY appendix item 6); implemented here via the CLIP-flat baseline step
    (shuffled multi-class batches, CE over seen-class cosine logits)."""
    import jax
    import jax.numpy as jnp
    import optax

    from .baselines.clip_flat import make_flat_train_step
    from .data import FlatTrainLoader
    from .train.schedule import cosine_lr
    from .utils.checkpoint import AsyncCheckpointSaver

    grouped = _grouped_split(
        config, config.data_split_train, splits[config.data_train], splits
    )
    seen_ids = tm.hier.ids(splits["train"])
    seen_pos = {int(c): i for i, c in enumerate(seen_ids)}
    loader = FlatTrainLoader(
        grouped,
        {c: tm.hier.name_to_id[c] for c in grouped},
        _image_source(config, tm.clip_cfg.image_resolution, grouped,
                      config.data_split_train),
        config.batch_size,
        seed=config.seed,
        num_threads=config.num_workers,
        num_procs=config.num_proc_workers,
    )
    seen_tokens = jnp.asarray(tm.node_tokens[seen_ids])
    total_steps = config.epochs * max(1, len(loader))
    tx = optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.adamw(cosine_lr(config.lr, config.warmup_length, total_steps),
                    weight_decay=config.wd),
    )
    params = {"clip": tm.params}
    opt = tx.init(params)
    step = make_flat_train_step(tm.clip_cfg, tx, dtype=tm.dtype)
    logger.log_config(config)
    from contextlib import closing

    from .utils.preempt import GracefulShutdown

    with AsyncCheckpointSaver(keep=config.keep_checkpoints) as saver, \
            GracefulShutdown() as shutdown, closing(loader):
        for epoch in range(config.from_epoch + 1, config.epochs):
            loader.set_epoch(epoch)  # restart-deterministic shuffles
            for i, (images, labels, valid) in enumerate(loader):
                labels = np.asarray([seen_pos.get(int(l), 0) for l in labels])
                params, opt, loss = step(
                    params, opt, jnp.asarray(images), seen_tokens,
                    jnp.asarray(labels),
                )
                if i % config.print_freq == 0:
                    logger.log_train(epoch, i, len(loader), float(loss))
                if shutdown.requested:
                    break  # preemption: checkpoint below, then exit cleanly
            tm.params = params["clip"]

            class _S:  # minimal TrainState-shaped payload for the saver
                pass

            s = _S()
            s.params = {"clip": tm.params, "layer_weight": tm.layer_weight}
            s.opt_state = opt
            s.step = jnp.asarray((epoch + 1) * len(loader), jnp.int32)
            saver.save(config.save_path, epoch, s)
            logger.log_text(f"Model saved. epoch={epoch}")
            if shutdown.requested:
                logger.log_text(
                    f"preempted (SIGTERM): saved epoch={epoch}; continue "
                    f"with --resume True --from_epoch {epoch}"
                )
                break
            if config.test_after_train:
                run_test(config, tm, splits, logger)
    return params


def run_train(config: Config, tm: TreeModel, splits, logger: RunLogger) -> Any:
    """OM fine-tuning (reference ``train()`` + driver, ``main.py:72-101,
    225-258``)."""
    import jax
    import jax.numpy as jnp

    from .train import (
        NegativeSampler,
        ScheduleBuilder,
        init_train_state,
        make_optimizer,
        make_train_step,
        sched_to_device,
    )

    grouped = _grouped_split(
        config, config.data_split_train, splits[config.data_train], splits
    )
    loader = GroupedTrainLoader(
        grouped,
        {c: tm.hier.name_to_id[c] for c in grouped},
        _image_source(config, tm.clip_cfg.image_resolution, grouped,
                      config.data_split_train),
        config.batch_size,
        n_episodes=config.n_episodes,
        seed=config.seed,
        num_threads=config.num_workers,
        num_procs=config.num_proc_workers,
        serial_batches=config.serial_batches,
    )
    num_batches = loader.n_episodes
    total_steps = config.epochs * num_batches

    text_fn = None
    extra_params = None
    extra_labels = None
    coop_static = None
    if config.coop:
        coop_static, ctx = tm.coop_setup(config.seed)
        text_fn = tm.coop_text_fn(coop_static)
        extra_params = {"coop_ctx": ctx}
        extra_labels = {
            "ctx": {"clip": "frozen", "coop_ctx": "clip"},
            "clip": {"coop_ctx": "frozen"},
            "both": {"coop_ctx": "clip"},
        }[config.coop_train]

    tx = make_optimizer(config, total_steps, extra_labels=extra_labels)
    state = init_train_state(tm.params, tm.layer_weight, tx,
                             extra_params=extra_params)
    resume_meta = None
    if config.resume:
        from .utils.checkpoint import (
            latest_epoch,
            read_ckpt_meta,
            restore_checkpoint,
        )

        # --resume without --from_epoch picks the newest clip_{N}: a
        # preempted/restarted worker re-runs its original command verbatim
        # (utils/preempt.py pairs with this)
        epoch = (config.from_epoch if config.from_epoch >= 0
                 else latest_epoch(config.save_path))
        if epoch is None:
            logger.log_text("resume: no checkpoint found; starting fresh")
        else:
            ckpt = os.path.join(config.save_path, f"clip_{epoch}")
            state = restore_checkpoint(ckpt, state)
            config.from_epoch = epoch
            resume_meta = read_ckpt_meta(config.save_path, epoch)
            logger.log_text(
                f"resumed full state from {ckpt} (step {int(state.step)})"
            )
    # frozen subtrees are stop-gradient'd in the step so their backward is
    # DCE'd (ctx-only CoOp skips the whole image-encoder backward)
    frozen = tuple(k for k, v in (extra_labels or {}).items() if v == "frozen")
    step_fn = make_train_step(config, tm.clip_cfg, tx, dtype=tm.dtype,
                              donate=config.donate, text_fn=text_fn,
                              frozen=frozen)

    sampler = NegativeSampler(
        tm.hier,
        tm.train_index,
        config.num_compare,
        k=config.k,
        seed=config.seed,
        topk_window="both" if config.coop else "below",
        exclu_bro=config.exclu_bro,
    )
    builder = ScheduleBuilder(
        tm.hier,
        sampler,
        config.out_ratio,
        config.in_ratio,
        config.num_compare,
        method=config.training_method,
        strategy=config.sample_strategy,
    )
    node_tokens = jnp.asarray(tm.node_tokens)

    # multi-replica SPMD: one class per replica per step (train/spmd.py)
    n_replicas = 1
    spmd_step = None
    if len(jax.devices()) > 1 and config.mesh_model >= 1 and config.mesh_data != 1:
        from .parallel.mesh import make_mesh
        from .train.spmd import make_spmd_train_step

        mesh = make_mesh(data=config.mesh_data, model=config.mesh_model)
        n_replicas = mesh.shape["data"]
        if n_replicas > 1:
            spmd_step = make_spmd_train_step(
                config, tm.clip_cfg, tx, mesh, dtype=tm.dtype,
                donate=config.donate, text_fn=text_fn, frozen=frozen,
            )
            # every step consumes n_replicas batches; round the episode
            # count UP so no batch is silently dropped (the reference's
            # n_episodes = num_data//bs + 1 is itself a rounding, so
            # at-least semantics are preserved; the loader's per-class
            # streams are infinite)
            loader.n_episodes += (-loader.n_episodes) % n_replicas
            num_batches = loader.n_episodes

    from .data import Prefetcher
    from .train.spmd import stack_schedules

    steps_per_epoch = num_batches // n_replicas
    # mid-epoch resume: if the checkpoint's sidecar says the saved epoch was
    # preempted partway through (steps_done < steps_per_epoch) and the run
    # geometry matches, RE-ENTER that epoch at the saved step instead of
    # skipping its remaining data. On geometry mismatch (different
    # n_episodes/batch layout) — or a loader without the skip_next API,
    # mirroring the hasattr(set_epoch) guard in _epoch_loop — fall back to
    # next-epoch semantics rather than crashing the prefetch thread.
    resume_skip = 0
    if (resume_meta is not None
            and hasattr(loader, "skip_next")
            and resume_meta.get("steps_per_epoch") == steps_per_epoch
            and 0 < resume_meta.get("steps_done", steps_per_epoch)
            < steps_per_epoch):
        resume_skip = int(resume_meta["steps_done"])
        config.from_epoch -= 1
        logger.log_text(
            f"resume: re-entering epoch {config.from_epoch + 1} at step "
            f"{resume_skip}/{steps_per_epoch} (mid-epoch preemption)"
        )
    _pending_skip = {"steps": resume_skip}

    def _prefetch_steps():
        """Batch + schedule producer: ScheduleBuilder.build runs in this
        background thread, overlapping host-side schedule construction with
        the device step (VERDICT r1 weak-item 5)."""
        skip = _pending_skip.pop("steps", 0)  # one-shot: first epoch only
        if skip:
            loader.skip_next(skip * n_replicas)
        it = iter(loader)
        if n_replicas > 1:
            for _ in range(num_batches // n_replicas - skip):
                batches = [next(it) for _ in range(n_replicas)]
                scheds = stack_schedules(
                    [builder.build(b.target) for b in batches]
                )
                yield np.stack([b.images for b in batches]), scheds
        else:
            for batch in it:
                yield batch.images, builder.build(batch.target)

    logger.log_config(config)
    from .utils.profiling import TraceWindow

    tracer = TraceWindow(config.trace_dir)
    try:
        state = _epoch_loop(
            config, tm, splits, logger, tracer, state, step_fn, spmd_step,
            sampler, builder, loader, node_tokens, _prefetch_steps,
            steps_per_epoch, num_batches, resume_skip,
        )
    finally:
        tracer.close()
        loader.close()
    return state


def _epoch_loop(config, tm, splits, logger, tracer, state, step_fn, spmd_step,
                sampler, builder, loader, node_tokens, _prefetch_steps,
                steps_per_epoch, num_batches, resume_skip=0):
    import jax.numpy as jnp

    from .data import Prefetcher
    from .train import sched_to_device
    from .utils.checkpoint import AsyncCheckpointSaver
    from .utils.preempt import GracefulShutdown

    with AsyncCheckpointSaver(keep=config.keep_checkpoints) as saver, \
            GracefulShutdown() as shutdown:
        for epoch in range(config.from_epoch + 1, config.epochs):
            epoch_t0 = time.time()
            # pin the loader's streams to the ABSOLUTE epoch: with
            # (seed, epoch)-derived streams, a restarted process re-enters
            # a preempted epoch on the exact batch sequence the original
            # served (pipeline.set_epoch + skip_next)
            if hasattr(loader, "set_epoch"):
                loader.set_epoch(epoch)
            if config.sample_strategy in ("simi", "near_simi"):
                # refresh the similarity-ranking bank once per epoch (the
                # reference re-encodes per step inside no_grad; sampling.py)
                bank = tm.update_classifier(state.params["clip"])
                sampler.set_class_feats(
                    np.asarray(bank[: tm.hier.num_nodes], np.float32)
                )
            # resume_skip offsets the first (re-entered) epoch only
            skip_base = resume_skip if epoch == config.from_epoch + 1 else 0
            steps_done = skip_base
            for i, (images, sched_host) in enumerate(
                Prefetcher(_prefetch_steps, depth=2)
            ):
                tracer.before(i)
                if spmd_step is not None:
                    state, loss = spmd_step(
                        state, jnp.asarray(images), node_tokens,
                        {k: jnp.asarray(v) for k, v in sched_host.items()},
                    )
                else:
                    state, loss = step_fn(
                        state, jnp.asarray(images), node_tokens,
                        sched_to_device(sched_host),
                    )
                tracer.after(i, loss)
                if i % config.print_freq == 0:
                    logger.log_train(
                        epoch, skip_base + i, steps_per_epoch, float(loss)
                    )
                steps_done = skip_base + i + 1
                if shutdown.requested:
                    # preemption (SIGTERM): stop at this step boundary; the
                    # epoch bookkeeping + checkpoint below still run, then
                    # the run exits cleanly for --resume (utils/preempt.py)
                    break
            # drain the device queue by FETCHING a scalar — block_until_ready
            # does not reliably sync through the axon TPU tunnel (CLAUDE.md),
            # so epoch timing would over-report without this materialization
            np.asarray(jnp.sum(state.params["layer_weight"]))
            epoch_dt = time.time() - epoch_t0
            steps_run = steps_done - skip_base
            logger.log_jsonl({
                "event": "epoch_perf",
                "epoch": epoch,
                "steps": steps_run,
                "step_ms": round(epoch_dt / max(steps_run, 1) * 1e3, 1),
                "imgs_per_sec": round(
                    steps_run * (num_batches // max(steps_per_epoch, 1))
                    * config.batch_size / max(epoch_dt, 1e-9), 1
                ),
            })
            tm.params = state.params["clip"]
            tm.layer_weight = state.params["layer_weight"]
            if config.coop:
                tm.coop_ctx = state.params["coop_ctx"]
            # async: epoch N's checkpoint commits to disk behind epoch N+1's
            # compute (arrays are copied off-device before save returns, so
            # the donating train step cannot clobber them)
            saver.save(
                config.save_path, epoch, state,
                meta={"steps_done": steps_done,
                      "steps_per_epoch": steps_per_epoch},
            )
            logger.log_text(f"Model saved. epoch={epoch}")
            if shutdown.requested:
                logger.log_text(
                    f"preempted (SIGTERM): saved epoch={epoch} after "
                    f"{steps_done}/{steps_per_epoch} steps; --resume True "
                    f"re-enters this epoch at the saved step"
                )
                break
            if config.test_after_train:
                run_test(config, tm, splits, logger)
    return state


def main(argv=None) -> None:
    config = Config.from_args(argv)
    hier, splits = build_hierarchy(config)
    print("Creating models", flush=True)
    tm = build_model(config, hier, splits)
    logger = RunLogger(config.save_path)
    if config.train:
        print("Training.", flush=True)
        if config.training_method == "flat":
            run_train_flat(config, tm, splits, logger)
        else:
            run_train(config, tm, splits, logger)
    else:
        print("Direct testing.", flush=True)
        run_test(config, tm, splits, logger)
