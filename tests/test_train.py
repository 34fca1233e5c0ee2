"""Training stack tests: weights, sampling, schedule structure, OM loss.

The OM loss is checked against a *serial oracle* that reproduces the
reference's accumulation literally (one CE per (outer, inner) pair over the
same compare sets, weighted and summed — ``model/clip_tree.py:222-281``);
losses and gradients must match the batched one-backward version.
"""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hgr_tpu.config import Config  # noqa: E402
from hgr_tpu.hierarchy import synthetic_hierarchy  # noqa: E402
from hgr_tpu.models.clip import encode_image, encode_text, get_config  # noqa: E402
from hgr_tpu.models.layers import l2_normalize  # noqa: E402
from hgr_tpu.train import (  # noqa: E402
    NegativeSampler,
    ScheduleBuilder,
    init_train_state,
    make_om_loss_fn,
    make_optimizer,
    make_train_step,
    max_pairs,
    pair_weights,
    sched_to_device,
)
from hgr_tpu.tree_model import TreeModel  # noqa: E402


# ---------------------------------------------------------------------------
# pair_weights vs reference get_weights semantics
# ---------------------------------------------------------------------------

def ref_get_weights(method, max_depth, layer_weight=None):
    """Literal re-derivation of model/clip_tree.py:198-219 in numpy."""
    if method == "equal":
        return np.ones(max_depth) / max_depth
    if method == "decreasing":
        w = np.arange(max_depth, 0, -1, dtype=np.float64)
        return w / w.sum()
    if method == "increasing":
        w = np.arange(1, max_depth + 1, dtype=np.float64)
        return w / w.sum()
    if method == "nl_increasing":
        w = np.arange(1, max_depth + 1, dtype=np.float64) ** 3
        return w / w.sum()
    if method == "nl_decreasing":
        w = np.arange(max_depth, 0, -1, dtype=np.float64) ** 3
        return w / w.sum()
    if method == "adaptive":
        x = 100.0 ** np.asarray(layer_weight[:max_depth], np.float64)
        e = np.exp(x - x.max())
        return e / e.sum()
    raise ValueError(method)


@pytest.mark.parametrize(
    "method",
    ["equal", "increasing", "decreasing", "nl_increasing", "nl_decreasing", "adaptive"],
)
def test_pair_weights_match_reference(method):
    lw = np.asarray([0.3, 0.1, 0.25, 0.2, 0.15], np.float32)
    pos, length = [], []
    for L in range(1, 6):
        for p in range(L):
            pos.append(p)
            length.append(L)
    got = pair_weights(
        method,
        jnp.asarray(pos, jnp.int32),
        jnp.asarray(length, jnp.int32),
        jnp.asarray(lw),
    )
    want = np.concatenate(
        [ref_get_weights(method, L, lw) for L in range(1, 6)]
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# sampler properties (reference invariants at model/clip_tree.py:116-141)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def hier():
    return synthetic_hierarchy(branching=3, levels=4, extra_edges=6, seed=3)


@pytest.mark.parametrize("strategy", ["random", "topk", "brothers", "simi", "near_simi"])
def test_sampler_invariants(hier, strategy):
    n = hier.num_nodes
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((n, 16)).astype(np.float32)
    sampler = NegativeSampler(
        hier, np.arange(n), num_compare=8, k=1, seed=0, class_feats=feats
    )
    for target in [0, n // 2, n - 1]:
        parents = hier.chain_with_self(target)
        depth = len(parents) - 1
        ids, label = sampler.sample(strategy, target, depth, parents)
        assert len(ids) <= 9
        assert ids[label] == target
        assert len(set(ids)) == len(ids)
        if strategy in ("topk", "simi", "near_simi"):
            # ancestors must be excluded (the positive is appended last)
            for a in parents[:-1]:
                assert a not in ids[:-1] or ids.index(a) == label


def test_topk_window(hier):
    n = hier.num_nodes
    sampler = NegativeSampler(hier, np.arange(n), num_compare=500, k=1, seed=0)
    target = int(hier.level(hier.max_depth)[0])
    parents = hier.chain_with_self(target)
    depth = len(parents) - 1
    ids, label = sampler.sample("topk", target, depth, parents)
    # with k=1 and a deep target, negatives come from the layer above only
    for i in ids:
        if i == target:
            continue
        assert int(hier.depth[i]) in range(max(0, depth - 1), depth)


# ---------------------------------------------------------------------------
# schedule structure vs a literal loop oracle
# ---------------------------------------------------------------------------

def oracle_pairs(hier, target, out_ratio, in_ratio):
    """(p_out, depth_of_p_in, m_loop, m, k_loop, k) rows in reference order."""
    parents = hier.chain_with_self(target)
    k = max(1, math.ceil(out_ratio * len(parents)))
    rows = []
    for k_loop, p_out in enumerate(list(reversed(parents))[:k]):
        parents_in = hier.chain_with_self(p_out)
        m = max(1, math.ceil(in_ratio * len(parents_in)))
        for m_loop, p_in in enumerate(list(reversed(parents_in))[:m]):
            rows.append((p_out, parents_in.index(p_in), m_loop, m, k_loop, k))
    return rows


def test_schedule_matches_loop_oracle(hier):
    n = hier.num_nodes
    sampler = NegativeSampler(hier, np.arange(n), num_compare=6, k=1, seed=0)
    builder = ScheduleBuilder(
        hier, sampler, out_ratio=0.25, in_ratio=0.5, num_compare=6
    )
    deep = int(hier.level(hier.max_depth)[0])
    for target in [0, deep]:
        s = builder.build(target)
        rows = oracle_pairs(hier, target, 0.25, 0.5)
        assert int(s.pair_valid.sum()) == len(rows)
        for i, (p_out, depth, m_loop, m, k_loop, k) in enumerate(rows):
            assert s.pair_valid[i]
            # positive of each pair is the outer node
            assert s.compare[i, s.label[i]] == p_out
            assert (s.in_pos[i], s.in_len[i]) == (m_loop, m)
            assert (s.out_pos[i], s.out_len[i]) == (k_loop, k)
        # unique/inv roundtrip reconstructs the compare matrix
        np.testing.assert_array_equal(s.unique[s.inv], s.compare)
        assert s.compare.shape[0] == builder.p_max


def test_max_pairs_is_a_bound(hier):
    pm = max_pairs(hier, 0.25, 0.5)
    for t in range(0, hier.num_nodes, 7):
        assert len(oracle_pairs(hier, t, 0.25, 0.5)) <= pm


@pytest.mark.parametrize("ratios", [(0.25, 0.5), (1.0, 1.0), (0.0, 0.0)])
def test_schedule_structure_every_node(hier, ratios):
    """Property sweep: pair structure matches the loop oracle for EVERY node
    and for edge-case ratios (0.0 must still produce >=1 pair per loop,
    reference model/clip_tree.py:236-238,251-253)."""
    out_r, in_r = ratios
    sampler = NegativeSampler(hier, np.arange(hier.num_nodes), 4, seed=0)
    builder = ScheduleBuilder(hier, sampler, out_r, in_r, num_compare=4)
    for t in range(hier.num_nodes):
        s = builder.build(t)
        rows = oracle_pairs(hier, t, out_r, in_r)
        assert int(s.pair_valid.sum()) == len(rows)
        for i, (p_out, depth, m_loop, m, k_loop, k) in enumerate(rows):
            assert s.compare[i, s.label[i]] == p_out
            assert (s.in_pos[i], s.in_len[i], s.out_pos[i], s.out_len[i]) == (
                m_loop, m, k_loop, k
            )


# ---------------------------------------------------------------------------
# OM loss: batched == serial oracle (values AND grads)
# ---------------------------------------------------------------------------

def serial_om_loss(params, images, node_tokens, sched, clip_cfg, in_mode, out_mode):
    """Reference-style accumulation: one CE per pair, separate text encodes."""
    img = l2_normalize(
        encode_image(params["clip"], clip_cfg, images, dtype=jnp.float32)
    )
    scale = jnp.exp(params["clip"]["logit_scale"])
    total = 0.0
    P = sched["compare"].shape[0]
    for p in range(P):
        if not bool(sched["pair_valid"][p]):
            continue
        n_valid = int(np.asarray(sched["compare_valid"][p]).sum())
        ids = sched["compare"][p, :n_valid]
        toks = node_tokens[ids]
        tf = l2_normalize(
            encode_text(params["clip"], clip_cfg, toks, dtype=jnp.float32)
        )
        logits = (img @ tf.T) * scale
        lab = int(sched["label"][p])
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -logp[:, lab].mean()
        w_in = pair_weights(
            in_mode,
            sched["in_pos"][p : p + 1],
            sched["in_len"][p : p + 1],
            params["layer_weight"],
        )[0]
        w_out = pair_weights(
            out_mode,
            sched["out_pos"][p : p + 1],
            sched["out_len"][p : p + 1],
            params["layer_weight"],
        )[0]
        total = total + ce * w_in * w_out
    return total


def test_om_loss_matches_serial_oracle(hier):
    cfg = Config(arch="TEST-RN", num_compare=4, weights="adaptive")
    tm = TreeModel.build(cfg, hier, pad_multiple=64)
    tm.init_params(0)
    clip_cfg = get_config("TEST-RN")

    sampler = NegativeSampler(hier, np.arange(hier.num_nodes), num_compare=4, seed=1)
    builder = ScheduleBuilder(hier, sampler, 0.25, 0.5, num_compare=4)
    target = int(hier.level(hier.max_depth)[1])
    sched = sched_to_device(builder.build(target))

    params = {"clip": tm.params, "layer_weight": tm.layer_weight}
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 3)), jnp.float32
    )
    node_tokens = jnp.asarray(tm.node_tokens)

    loss_fn = make_om_loss_fn(clip_cfg, jnp.float32, "OM", "adaptive", "both")
    batched = loss_fn(params, images, node_tokens, sched)
    serial = serial_om_loss(
        params, images, node_tokens, sched, clip_cfg, "adaptive", "adaptive"
    )
    np.testing.assert_allclose(float(batched), float(serial), rtol=1e-5)

    g1 = jax.grad(lambda p: loss_fn(p, images, node_tokens, sched))(params)
    g2 = jax.grad(
        lambda p: serial_om_loss(
            p, images, node_tokens, sched, clip_cfg, "adaptive", "adaptive"
        )
    )(params)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)
    # adaptive layer_weight must receive a nonzero gradient (reference bug fixed)
    assert float(jnp.abs(g1["layer_weight"]).max()) > 0


def test_train_step_runs_and_updates(hier):
    cfg = Config(arch="TEST-RN", num_compare=4, lr=1e-3, w_lr=1e-3, remat=False)
    tm = TreeModel.build(cfg, hier, pad_multiple=64)
    tm.init_params(0)
    clip_cfg = get_config("TEST-RN")
    tx = make_optimizer(cfg, total_steps=10)
    state = init_train_state(tm.params, tm.layer_weight, tx)

    sampler = NegativeSampler(hier, np.arange(hier.num_nodes), num_compare=4, seed=1)
    builder = ScheduleBuilder(hier, sampler, 0.25, 0.5, num_compare=4)
    step_fn = make_train_step(cfg, clip_cfg, tx, dtype=jnp.float32, donate=False)

    images = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 32, 32, 3)), jnp.float32
    )
    node_tokens = jnp.asarray(tm.node_tokens)
    lw0 = np.asarray(state.params["layer_weight"])
    losses = []
    deep = hier.level(hier.max_depth)  # deep targets so the adaptive softmax
    for t in deep[:3]:                 # spans >1 level and lw gets gradients
        sched = sched_to_device(builder.build(t))
        state, loss = step_fn(state, images, node_tokens, sched)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert int(state.step) == 3
    assert not np.allclose(np.asarray(state.params["layer_weight"]), lw0)


def test_cosine_lr_matches_executed_reference():
    """Execute the reference's cosine_lr closure (utils.py:82-95) against a
    fake single-group optimizer and compare every step's lr."""
    import ast
    import os

    ref_path = "/root/reference/utils.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference checkout not available")
    tree = ast.parse(open(ref_path).read())
    fns = [n for n in tree.body if isinstance(n, ast.FunctionDef)
           and n.name in ("cosine_lr", "_warmup_lr", "assign_learning_rate")]
    assert len(fns) == 3
    ns = {"np": np}
    exec(compile(ast.Module(body=fns, type_ignores=[]), ref_path, "exec"), ns)

    from hgr_tpu.train.schedule import cosine_lr as ours

    for base, warmup, steps in [(3e-7, 5, 40), (1e-3, 0, 12), (2e-4, 10, 10)]:
        group = {"lr": None}
        opt = type("O", (), {"param_groups": [group]})()
        adjust = ns["cosine_lr"](opt, base, warmup, steps)
        sched = ours(base, warmup, steps)
        for step in range(steps):
            adjust(step)
            # ours computes the cosine in fp32 (device schedule), the
            # reference in float64 numpy: allow fp32 noise, absolute near
            # the decay tail where lr -> 0
            np.testing.assert_allclose(
                float(sched(step)), group["lr"], rtol=1e-4, atol=base * 1e-6,
                err_msg=f"base={base} warmup={warmup} steps={steps} step={step}",
            )
