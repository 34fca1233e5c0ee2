"""Pallas-op tests (interpret mode / XLA fallbacks on CPU) + sorted fast path."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hgr_tpu.models.layers import causal_mask  # noqa: E402
from hgr_tpu.ops.attention import pallas_attention, reference_attention  # noqa: E402
from hgr_tpu.ops.bank_topk import (  # noqa: E402
    level_argmax_sorted,
    level_argmax_xla,
)


@pytest.mark.parametrize(
    "shape,masked", [((2, 4, 77, 64), True), ((2, 2, 30, 40), False)]
)
def test_pallas_attention_interpret_matches_reference(shape, masked):
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal(shape), jnp.float32) for _ in range(3)
    )
    m = jnp.asarray(causal_mask(shape[2])) if masked else None
    out_p = pallas_attention(q, k, v, m, interpret=True)
    out_r = reference_attention(q, k, v, m)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=2e-6)


def _setup(B=16, N=512, n_depths=5, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, N)).astype(np.float32)
    depth = rng.integers(0, n_depths, N).astype(np.int32)
    train = rng.random(N) < 0.8
    levels = np.asarray(list(range(n_depths)) + [-1], np.int32)
    return logits, depth, train, levels


def test_level_argmax_sorted_matches_xla():
    # std-normal logits over ~56-node levels: the probability that a whole
    # level scores below the reference's -1 fill is ~0, so the xla path's
    # out-of-level fill branch never fires and raw preds must agree
    logits, depth, train, levels = _setup(N=300, n_depths=4)
    order = np.argsort(depth, kind="stable")
    offsets = [0]
    for d in range(4):
        offsets.append(offsets[-1] + int((depth == d).sum()))
    preds_s, vals = level_argmax_sorted(
        jnp.asarray(logits[:, order]), tuple(offsets),
        jnp.asarray(train[order]),
    )
    preds_global = order[np.asarray(preds_s)]
    want = level_argmax_xla(
        jnp.asarray(logits), jnp.asarray(levels), jnp.asarray(depth),
        jnp.asarray(train),
    )
    np.testing.assert_array_equal(preds_global, np.asarray(want))


def test_level_argmax_fill_semantics():
    """When every train candidate of a level scores below the reference's
    -1 fill (main.py:169-171), the xla path predicts an out-of-level node
    and the sorted path reports a slot max <= FILL — the signal the metric
    layer uses to count the slot as a miss."""
    from hgr_tpu.ops.bank_topk import FILL

    logits, depth, train, levels = _setup(N=300, n_depths=4)
    sunk = depth == 2
    logits[:, sunk] = -2.0  # entire level below the fill value

    want = np.asarray(level_argmax_xla(
        jnp.asarray(logits), jnp.asarray(levels), jnp.asarray(depth),
        jnp.asarray(train),
    ))
    lvl2 = int(np.where(levels == 2)[0][0])
    assert (depth[want[lvl2]] != 2).all(), "xla path should leave the level"

    order = np.argsort(depth, kind="stable")
    offsets = [0]
    for d in range(4):
        offsets.append(offsets[-1] + int((depth == d).sum()))
    _preds, vals = level_argmax_sorted(
        jnp.asarray(logits[:, order]), tuple(offsets),
        jnp.asarray(train[order]),
    )
    assert (np.asarray(vals)[2] <= FILL).all()
    assert (np.asarray(vals)[1] > FILL).all()


def test_sorted_eval_step_matches_unsorted(tiny_hierarchy):
    from hgr_tpu.config import Config
    from hgr_tpu.tree_model import TreeModel

    h = tiny_hierarchy
    cfg = Config(arch="TEST-RN", dtype="float32")
    tm = TreeModel.build(cfg, h, pad_multiple=64)
    tm.init_params(0)
    bank = tm.update_classifier()
    bank_s = tm.sort_bank(bank)
    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 32, 32, 3)), jnp.float32
    )
    for target in [0, int(h.level(h.max_depth)[0]), h.num_nodes - 1]:
        m1 = tm.eval_step(tm.params, bank, imgs, target)
        m2 = tm.eval_step_sorted(tm.params, bank_s, imgs, target)
        for a, b in zip(m1, m2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_transformer_policy_remat_matches_full_remat():
    """remat may name a jax.checkpoint_policies policy (selective
    checkpointing); outputs and grads must equal the full-remat path."""
    from hgr_tpu.models.transformer import transformer_apply, transformer_init

    rng = np.random.default_rng(0)
    p = transformer_init(jax.random.PRNGKey(0), width=32, layers=3)
    x = jnp.asarray(rng.standard_normal((4, 8, 32)), jnp.float32)

    def loss(p, remat):
        out = transformer_apply(p, x, num_heads=4, remat=remat)
        return jnp.sum(out**2)

    for variant in ("dots_saveable", "dots_with_no_batch_dims_saveable"):
        l_full, g_full = jax.value_and_grad(loss)(p, True)
        l_pol, g_pol = jax.value_and_grad(loss)(p, variant)
        np.testing.assert_allclose(float(l_full), float(l_pol), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g_full), jax.tree_util.tree_leaves(g_pol)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_transformer_unroll_matches_scan():
    """scan unroll>1 is a pure scheduling knob: outputs and grads must be
    bit-comparable to the default scan (layers=3 also exercises the
    non-divisible unroll=2 remainder path)."""
    from hgr_tpu.models.transformer import transformer_apply, transformer_init

    rng = np.random.default_rng(1)
    p = transformer_init(jax.random.PRNGKey(1), width=32, layers=3)
    x = jnp.asarray(rng.standard_normal((4, 8, 32)), jnp.float32)

    def loss(p, unroll):
        out = transformer_apply(p, x, num_heads=4, remat=True, unroll=unroll)
        return jnp.sum(out**2)

    l1, g1 = jax.value_and_grad(loss)(p, 1)
    for u in (2, 3):
        lu, gu = jax.value_and_grad(loss)(p, u)
        np.testing.assert_allclose(float(l1), float(lu), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(gu)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_s2d_stem_matches_conv1():
    """The space-to-depth stem transform (models/resnet.py:s2d_stem_conv1)
    must equal the plain 3x3/stride-2/pad-1 conv1 — same math, re-tiled for
    the MXU (kernel zero-pad offset and the (dh, dw, c) channel regrouping
    are the easy things to get off-by-one)."""
    from hgr_tpu.models.layers import conv2d
    from hgr_tpu.models.resnet import s2d_stem_conv1

    rng = np.random.default_rng(3)
    for H, cout in [(224, 32), (32, 8)]:
        x = jnp.asarray(rng.standard_normal((2, H, H, 3)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, cout)), jnp.float32)
        a = conv2d({"w": w}, x, stride=2, padding=1)
        b = s2d_stem_conv1(w, x)
        assert a.shape == b.shape == (2, H // 2, H // 2, cout)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
