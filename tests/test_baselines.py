"""Baseline family tests: GCN (vs dense oracle), CNZSL, CLIP-flat, FREE."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from hgr_tpu.baselines import (  # noqa: E402
    Adjacency,
    CNZSLConfig,
    FREEConfig,
    GCNConfig,
    basic_edges,
    cnzsl_init,
    cnzsl_logits,
    dense_edges,
    free_init,
    gcn_apply,
    gcn_init,
    make_cnzsl_train_step,
    make_flat_train_step,
    make_free_steps,
    make_gcn_train_step,
    synthesize_features,
    train_softmax_classifier,
)
from hgr_tpu.baselines.clip_flat import step_lr  # noqa: E402
from hgr_tpu.baselines.free import other_labels  # noqa: E402
from hgr_tpu.hierarchy import synthetic_hierarchy  # noqa: E402


# ---------------------------------------------------------------------------
# GCN
# ---------------------------------------------------------------------------

def dense_oracle(edges, n, x):
    """The reference's normt_spm('in') + spmm as dense numpy
    (baseline/DGP/utils.py:56-79, models/gcn.py:85)."""
    A = np.zeros((n, n), np.float64)
    for u, v in edges:
        A[u, v] = 1.0
    At = A.T
    rowsum = At.sum(1)
    r_inv = np.where(rowsum > 0, 1.0 / np.maximum(rowsum, 1e-30), 0.0)
    Ahat = (np.diag(r_inv) @ At)
    return Ahat @ x


def test_adjacency_matvec_matches_dense_oracle():
    rng = np.random.default_rng(0)
    n = 12
    edges = np.asarray(
        [(0, 3), (0, 4), (1, 4), (2, 5), (4, 6), (5, 6), (3, 7)] +
        [(i, i) for i in range(n)], np.int64
    )
    x = rng.standard_normal((n, 5)).astype(np.float32)
    adj = Adjacency.build(edges, n)
    got = np.asarray(adj.matvec(jnp.asarray(x)))
    want = dense_oracle(edges, n, x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gcn_training_fits_seen_targets():
    hier = synthetic_hierarchy(3, 3, 3, 0)
    n = hier.num_nodes
    rng = np.random.default_rng(0)
    edges = basic_edges(hier)
    adj = [Adjacency.build(edges, n)]
    cfg = GCNConfig(n=n, in_channels=16, out_channels=8, hidden_layers="32",
                    mode="basic")
    params = gcn_init(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-2)
    opt = tx.init(params)
    x = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
    target = rng.standard_normal((n, 8)).astype(np.float32)
    target /= np.linalg.norm(target, axis=1, keepdims=True)
    target = jnp.asarray(target)
    seen = jnp.asarray(np.arange(n // 2))
    step = make_gcn_train_step(cfg, tx, adj)
    losses = []
    for i in range(60):
        params, opt, loss = step(params, opt, x, target, seen, None)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0]
    out = gcn_apply(params, cfg, x, adj)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(out, axis=1)), 1.0, rtol=1e-4
    )


def test_gcn_dense_att_runs_and_attention_grads():
    hier = synthetic_hierarchy(3, 3, 2, 1)
    n = hier.num_nodes
    groups = dense_edges(hier, max_hops=3)
    assert len(groups) <= 3
    # group 0 is self-loops
    assert all(u == v for u, v in groups[0])
    adj = [Adjacency.build(g, n) for g in groups]
    r_adj = [Adjacency.build(g, n, transpose=True) for g in groups]
    cfg = GCNConfig(n=n, in_channels=8, out_channels=4, hidden_layers="16",
                    mode="dense_att", n_hops=len(groups))
    params = gcn_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((n, 8)), jnp.float32)

    def loss(p):
        return jnp.sum(gcn_apply(p, cfg, x, adj, r_adj) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["a_att"]).max()) > 0
    assert float(jnp.abs(g["r_att"]).max()) > 0


def test_dense_edges_hops():
    hier = synthetic_hierarchy(2, 3, 0, 0)  # pure tree
    groups = dense_edges(hier)
    # hop-1 edges == parent->child edges
    direct = {tuple(e) for e in basic_edges(hier, self_loops=False)}
    assert {tuple(e) for e in groups[1]} == direct
    # hop-2: grandparent -> grandchild
    for anc, node in groups[2]:
        chain = hier.chain_with_self(int(node))
        assert chain[-3] == anc


# ---------------------------------------------------------------------------
# CNZSL
# ---------------------------------------------------------------------------

def test_cnzsl_train_reduces_loss_and_eval_uses_running_stats():
    rng = np.random.default_rng(0)
    C, A, D = 10, 16, 32
    cfg = CNZSLConfig(attr_dim=A, proto_dim=D, hid_dim=24)
    params, state = cnzsl_init(jax.random.PRNGKey(0), cfg)
    attrs = jnp.asarray(rng.standard_normal((C, A)), jnp.float32)
    protos_true = rng.standard_normal((C, D)).astype(np.float32)
    tx = optax.adam(3e-3)
    opt = tx.init(params)
    step = make_cnzsl_train_step(cfg, tx)
    losses = []
    for i in range(50):
        labels = jnp.asarray(rng.integers(0, C, 64))
        feats = jnp.asarray(
            protos_true[np.asarray(labels)] + 0.1 * rng.standard_normal((64, D)),
            jnp.float32,
        )
        params, state, opt, loss = step(params, state, opt, feats, attrs, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    feats = jnp.asarray(protos_true, jnp.float32)
    eval_logits, st2 = cnzsl_logits(params, state, feats, attrs, cfg, training=False)
    # eval must not mutate state
    assert jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: bool(jnp.all(a == b)), state, st2)
    )
    acc = (jnp.argmax(eval_logits, 1) == jnp.arange(C)).mean()
    assert float(acc) > 0.5


# ---------------------------------------------------------------------------
# CLIP flat fine-tune
# ---------------------------------------------------------------------------

def test_flat_train_step_and_steplr():
    from hgr_tpu.models.clip import clip_init, get_config

    cfg = get_config("TEST-RN")
    params = {"clip": clip_init(jax.random.PRNGKey(0), cfg)}
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    step = make_flat_train_step(cfg, tx, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    toks = np.zeros((6, cfg.context_length), np.int64)
    toks[:, 0] = cfg.vocab_size - 2
    toks[:, 1] = rng.integers(1, 100, 6)
    toks[:, 2] = cfg.vocab_size - 1
    images = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3])
    l0 = None
    for i in range(5):
        params, opt, loss = step(params, opt, images, jnp.asarray(toks), labels)
        l0 = l0 or float(loss)
    assert float(loss) < l0

    sched = step_lr(1.0, 0.1, 25)
    assert float(sched(0)) == 1.0
    assert abs(float(sched(25)) - 0.1) < 1e-6
    assert abs(float(sched(50)) - 0.01) < 1e-7


# ---------------------------------------------------------------------------
# FREE
# ---------------------------------------------------------------------------

def test_free_adversarial_steps_and_synthesis():
    cfg = FREEConfig(
        res_size=32, att_size=8, latent_size=8, ngh=64, ndh=64,
        nclass_seen=5, center_margin=10.0,
    )
    params = free_init(jax.random.PRNGKey(0), cfg)
    d_step, g_step, init_opts = make_free_steps(cfg)
    optD, optFR, optC, optEG = init_opts(params)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    feats = jnp.asarray(rng.uniform(0, 1, (16, 32)), jnp.float32)
    att = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 5, 16))
    for i in range(3):
        key, k1, k2, k3 = jax.random.split(key, 4)
        ol = other_labels(k1, labels, 5)
        params, optD, optFR, optC, d_cost, wass, gp = d_step(
            params, optD, optFR, optC, feats, att, labels, ol,
            jnp.asarray(cfg.lambda1), k2,
        )
        params, optEG, g_loss = g_step(params, optEG, feats, att, k3)
        assert np.isfinite(float(d_cost)) and np.isfinite(float(g_loss))
        assert np.isfinite(float(wass)) and float(gp) >= 0

    syn, syn_labels = synthesize_features(
        params, cfg, att[:3], num_per_class=4, rng=jax.random.PRNGKey(2)
    )
    assert syn.shape == (12, 32)
    assert list(np.asarray(syn_labels[:4])) == [0, 0, 0, 0]
    clf = train_softmax_classifier(
        jax.random.PRNGKey(3), syn, syn_labels, 3, epochs=2, batch=6
    )
    assert clf["w"].shape == (32, 3)


def test_resnet50_features_shape():
    from hgr_tpu.models.resnet_std import resnet50_features, resnet50_init

    p = resnet50_init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32
    )
    f = resnet50_features(p, x, dtype=jnp.float32)
    assert f.shape == (2, 2048)


def test_suppress_seen_keeps_seen_in_the_race():
    """DGP ZSL suppression sets seen columns to 1e-7 rather than removing
    them (evaluate_21kp.py:93-95): when every unseen logit is negative, a
    SEEN class still wins — faithful quirk, not an exclusion."""
    import numpy as np

    from hgr_tpu.baselines.materials import suppress_seen

    table = np.asarray([[5.0, 3.0, -0.2, -0.4],
                        [5.0, 3.0, 0.2, -0.4]], np.float32)
    out = np.asarray(suppress_seen(table, 2))
    np.testing.assert_allclose(out[:, :2], 1e-7)
    assert out[0].argmax() < 2      # all unseen negative -> a seen col wins
    assert out[1].argmax() == 2     # a positive unseen logit wins normally

    # mask form (our node order interleaves seen/unseen)
    mask = np.asarray([True, False, True, False])
    out2 = np.asarray(suppress_seen(table, mask))
    np.testing.assert_allclose(out2[:, [0, 2]], 1e-7)
    np.testing.assert_allclose(out2[:, 1], table[:, 1])
