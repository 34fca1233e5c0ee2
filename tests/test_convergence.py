"""End-to-end learning proof for the OM training stack.

The oracle tests (``test_train.py``, ``test_om_oracle.py``) prove the loss
and gradients MATCH the reference's math on a batch; none of them prove that
descending that loss actually teaches the model anything. This test closes
that class of bug (optimizer-group mislabeling, label/compare-set
misalignment, sign errors in the CE, bank/encoder feature-space mismatch):
after OM training on a handful of (image, class) groups — the reference's
single-class-batch regime, ``dataset/imagenet_group.py:37-184`` — the
trained model must retrieve each training image's class from the prompt
bank at high accuracy, starting from near-chance at init.

Zero-shot transfer to unseen classes is NOT testable with synthetic noise
images (there is no image→text-generalizable signal to learn), so the
assertion is alignment on the trained classes against the full leaf bank —
exactly the geometry the OM loss is supposed to create
(``model/clip_tree.py:222-281``).

The test uses the ViT encoder. The ModifiedResNet is NOT trainable from
random init in this framework — measured: cos(features(red), features(blue))
= 0.9995 at init, and training collapses it further — because frozen-stats
BatchNorm (the reference's own default regime: ``--open_eval True`` keeps
the CLIP model in ``eval()`` while fine-tuning, ``main.py:46,76-79``)
provides no per-layer renormalization, so torch-default conv init shrinks
the input-dependent signal geometrically until the attention pool's
positional/bias constants dominate. Neither the reference nor this
framework ever trains RN from scratch (both start from pretrained CLIP);
ViT's LayerNorm renormalizes per sample, so random init stays trainable and
exercises the same OM stack.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hgr_tpu.config import Config  # noqa: E402
from hgr_tpu.train import (  # noqa: E402
    NegativeSampler,
    ScheduleBuilder,
    init_train_state,
    make_optimizer,
    make_train_step,
    sched_to_device,
)
from hgr_tpu.tree_model import TreeModel  # noqa: E402


def test_om_training_aligns_images_to_class_prompts(tiny_hierarchy):
    hier = tiny_hierarchy
    # ratios ~0 reduce the schedule to the single (target, target) pair, so
    # the loss is exactly leaf-vs-leaf contrastive CE over the candidate
    # pool and minimizing it PROVABLY implies retrieval (the multi-pair
    # hierarchy machinery is oracle-tested in test_train/test_om_oracle;
    # with the reference's `topk` strategy negatives come only from levels
    # above the inner node — clip_tree.py:127-131 — so same-level classes
    # are never contrasted and prompts can collapse onto one image
    # direction: loss -> 0 at chance retrieval, observed here).
    cfg = Config(
        arch="TEST-ViT", dtype="float32", num_compare=6, batch_size=4,
        lr=2e-3, remat=False, out_ratio=0.01, in_ratio=0.01,
        sample_strategy="random",
    )
    tm = TreeModel.build(cfg, hier, pad_multiple=64)
    tm.init_params(0)

    leaves = np.asarray(hier.level(hier.max_depth), np.int32)[:6]
    rng = np.random.default_rng(0)
    res = tm.clip_cfg.image_resolution
    # each class = a global color shift + per-image noise: a signal that
    # survives any spatial pooling, so encoder features separate already at
    # init and the contrastive loss has a non-degenerate optimum (noise
    # PATTERNS with identical marginals do not survive random-init pooling;
    # with them the text prompts just oscillate class-to-class).
    imgs = {}
    for c in leaves:
        color = 2.0 * rng.standard_normal((1, 1, 1, 3))
        noise = 0.5 * rng.standard_normal((cfg.batch_size, res, res, 3))
        imgs[int(c)] = jnp.asarray((color + noise).astype(np.float32))

    def hit1(params):
        bank = tm.update_classifier(params["clip"])
        correct = total = 0
        for i, c in enumerate(leaves):
            logits = np.asarray(tm.forward(params["clip"], bank, imgs[int(c)]))
            pred = logits[:, leaves].argmax(axis=1)
            correct += int((pred == i).sum())
            total += len(pred)
        return correct / total

    rounds = 24
    tx = make_optimizer(cfg, total_steps=rounds * len(leaves))
    state = init_train_state(tm.params, tm.layer_weight, tx)
    step = make_train_step(cfg, tm.clip_cfg, tx, dtype=jnp.float32, donate=False)
    # negatives drawn from the trained classes (the reference's candidate
    # pool is the seen classes, dataset/imagenet_group.py:67-77), and
    # num_compare == len(leaves) so every compare set is exactly the full
    # leaf pool: zero loss then PROVABLY implies perfect retrieval. With
    # incomplete sets the missing competitor can outscore the target at
    # eval, and with sets that never include same-level classes (the
    # reference's `topk` strategy samples only from levels above,
    # clip_tree.py:127-131) all prompts can collapse onto one common image
    # direction — loss -> 0 at chance retrieval, observed here.
    sampler = NegativeSampler(hier, leaves, cfg.num_compare, seed=0)
    builder = ScheduleBuilder(
        hier, sampler, cfg.out_ratio, cfg.in_ratio, cfg.num_compare,
        strategy=cfg.sample_strategy,
    )
    node_tokens = jnp.asarray(tm.node_tokens)
    scheds = {int(c): sched_to_device(builder.build(int(c))) for c in leaves}

    acc0 = hit1(state.params)
    losses = []
    for _ in range(rounds):
        for c in leaves:
            state, loss = step(state, imgs[int(c)], node_tokens, scheds[int(c)])
            losses.append(float(loss))

    acc1 = hit1(state.params)
    assert acc0 <= 0.5, f"init accuracy suspiciously high: {acc0}"
    assert acc1 >= 0.875, (
        f"OM training failed to align images to class prompts: "
        f"hit@1 {acc0:.3f} -> {acc1:.3f}, loss {losses[0]:.3f} -> {losses[-1]:.3f}"
    )
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_coop_training_gradients_reach_ctx_and_align(tiny_hierarchy):
    """Same learning proof through the CoOp prompt-learner path
    (``--coop --coop_train both``): retrieval must rise above chance AND the
    learned context vectors must actually move — catching optimizer-label
    mistakes (a frozen-by-accident ctx) and dead text_fn wiring (the
    reference's CoOp OM path is dead code, ``model/clip_coop.py:187-189``)."""
    from hgr_tpu.eval.bank import build_bank_ids

    hier = tiny_hierarchy
    cfg = Config(
        arch="TEST-ViT", dtype="float32", num_compare=6, batch_size=4,
        lr=2e-3, remat=False, out_ratio=0.01, in_ratio=0.01,
        sample_strategy="random", coop=True, coop_train="both", n_ctx=4,
    )
    tm = TreeModel.build(cfg, hier, pad_multiple=64)
    tm.init_params(0)
    static, ctx0 = tm.coop_setup(0)
    text_fn = tm.coop_text_fn(static)

    leaves = np.asarray(hier.level(hier.max_depth), np.int32)[:6]
    rng = np.random.default_rng(0)
    res = tm.clip_cfg.image_resolution
    imgs = {}
    for c in leaves:
        color = 2.0 * rng.standard_normal((1, 1, 1, 3))
        noise = 0.5 * rng.standard_normal((cfg.batch_size, res, res, 3))
        imgs[int(c)] = jnp.asarray((color + noise).astype(np.float32))

    def hit1(params):
        bank = build_bank_ids(
            params, tm.n_pad, text_fn, chunk=min(64, tm.n_pad),
            out_dtype=jnp.float32,
        )
        correct = total = 0
        for i, c in enumerate(leaves):
            logits = np.asarray(tm.forward(params["clip"], bank, imgs[int(c)]))
            pred = logits[:, leaves].argmax(axis=1)
            correct += int((pred == i).sum())
            total += len(pred)
        return correct / total

    rounds = 24
    extra_labels = {"coop_ctx": "clip"}  # driver's coop_train="both" mapping
    tx = make_optimizer(cfg, total_steps=rounds * len(leaves),
                        extra_labels=extra_labels)
    state = init_train_state(tm.params, tm.layer_weight, tx,
                             extra_params={"coop_ctx": ctx0})
    step = make_train_step(cfg, tm.clip_cfg, tx, dtype=jnp.float32,
                           donate=False, text_fn=text_fn)
    sampler = NegativeSampler(hier, leaves, cfg.num_compare, seed=0)
    builder = ScheduleBuilder(
        hier, sampler, cfg.out_ratio, cfg.in_ratio, cfg.num_compare,
        strategy=cfg.sample_strategy,
    )
    node_tokens = jnp.asarray(tm.node_tokens)
    scheds = {int(c): sched_to_device(builder.build(int(c))) for c in leaves}

    acc0 = hit1(state.params)
    for _ in range(rounds):
        for c in leaves:
            state, loss = step(state, imgs[int(c)], node_tokens, scheds[int(c)])
    acc1 = hit1(state.params)

    ctx_delta = float(np.abs(np.asarray(state.params["coop_ctx"])
                             - np.asarray(ctx0)).max())
    assert ctx_delta > 1e-4, "coop ctx never received gradient updates"
    assert acc0 <= 0.5
    assert acc1 >= 0.875, (
        f"CoOp OM training failed: hit@1 {acc0:.3f} -> {acc1:.3f}, "
        f"ctx_delta {ctx_delta:.2e}"
    )
