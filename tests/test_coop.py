"""CoOp prompt-learner tests.

Core equivalence: if every learned context vector equals the token embedding
of the placeholder token occupying its slot, the prompt-conditioned text
encoder must produce EXACTLY the standard ``encode_text`` features of the
assembled token sequence — this pins the whole assembly + encoder path
against the already-parity-tested text encoder, for all three class-token
positions (reference ``model/CoOp.py:106-160``).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hgr_tpu.models.clip import clip_init, encode_text, get_config  # noqa: E402
from hgr_tpu.models.coop import (  # noqa: E402
    build_coop_static,
    coop_ctx_init,
    coop_encode_text,
)

CFG = get_config("TEST-RN")
SOT = CFG.vocab_size - 2
EOT = CFG.vocab_size - 1
PLACEHOLDER = 7


def _names(rng, n=6):
    return [list(rng.integers(1, 400, size=int(rng.integers(1, 5)))) for _ in range(n)]


@pytest.mark.parametrize("position", ["end", "middle", "front"])
def test_layouts(position):
    rng = np.random.default_rng(0)
    names = _names(rng)
    st = build_coop_static(
        names, CFG.context_length, SOT, EOT, n_ctx=4, position=position,
        placeholder_id=PLACEHOLDER,
    )
    for i, ids in enumerate(names):
        row, cmap = st.tokenized[i], st.ctx_map[i]
        assert row[0] == SOT and cmap[0] == -1
        body_len = 4 + len(ids)
        assert row[1 + body_len] == EOT
        # every ctx slot holds the placeholder token and indexes 0..n_ctx-1
        ctx_slots = np.where(cmap >= 0)[0]
        assert len(ctx_slots) == 4
        assert (row[ctx_slots] == PLACEHOLDER).all()
        assert sorted(cmap[ctx_slots]) == [0, 1, 2, 3]
        # name tokens appear contiguously in prompt order
        name_slots = [
            t for t in range(1, 1 + body_len) if cmap[t] == -1
        ]
        assert [int(row[t]) for t in name_slots] == [int(x) for x in ids]
        if position == "end":
            assert ctx_slots.tolist() == list(range(1, 5))
        if position == "front":
            assert name_slots == list(range(1, 1 + len(ids)))


def test_coop_equals_plain_encode_when_ctx_is_placeholder_embedding():
    rng = np.random.default_rng(1)
    names = _names(rng, n=5)
    params = clip_init(jax.random.PRNGKey(0), CFG)
    for position in ["end", "middle", "front"]:
        st = build_coop_static(
            names, CFG.context_length, SOT, EOT, n_ctx=4, position=position,
            placeholder_id=PLACEHOLDER,
        )
        emb = params["text"]["token_embedding"]
        ctx = jnp.tile(emb[PLACEHOLDER][None, :], (4, 1))
        got = coop_encode_text(
            params, ctx, jnp.asarray(st.tokenized), jnp.asarray(st.ctx_map),
            CFG, dtype=jnp.float32,
        )
        want = encode_text(
            params, CFG, jnp.asarray(st.tokenized), dtype=jnp.float32
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_coop_static_truncation_is_exact():
    """build_coop_static drops the all-padding tail past the longest EOT
    (rounded to a multiple of 16, like the node-token bank): with a causal
    mask + EOT pooling the features must equal the full-77 layout's."""
    rng = np.random.default_rng(3)
    names = _names(rng, n=5)
    params = clip_init(jax.random.PRNGKey(0), CFG)
    st = build_coop_static(names, CFG.context_length, SOT, EOT, n_ctx=4)
    T = st.tokenized.shape[1]
    assert T < CFG.context_length and T % 16 == 0

    full_t = np.zeros((len(names), CFG.context_length), np.int32)
    full_t[:, :T] = st.tokenized
    full_c = np.full((len(names), CFG.context_length), -1, np.int32)
    full_c[:, :T] = st.ctx_map
    ctx = coop_ctx_init(jax.random.PRNGKey(1), 4, CFG.transformer_width)
    a = coop_encode_text(params, ctx, jnp.asarray(st.tokenized),
                         jnp.asarray(st.ctx_map), CFG, dtype=jnp.float32)
    b = coop_encode_text(params, ctx, jnp.asarray(full_t),
                         jnp.asarray(full_c), CFG, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_ctx_receives_gradient():
    rng = np.random.default_rng(2)
    names = _names(rng, n=3)
    params = clip_init(jax.random.PRNGKey(0), CFG)
    st = build_coop_static(names, CFG.context_length, SOT, EOT, n_ctx=4)
    ctx = coop_ctx_init(jax.random.PRNGKey(1), 4, CFG.transformer_width)

    def loss(ctx):
        f = coop_encode_text(
            params, ctx, jnp.asarray(st.tokenized), jnp.asarray(st.ctx_map),
            CFG, dtype=jnp.float32,
        )
        return jnp.sum(f ** 2)

    g = jax.grad(loss)(ctx)
    assert float(jnp.abs(g).max()) > 0


def test_coop_om_training_step():
    """OM train step with the CoOp text path; trainable subset honours
    coop_train (reference tree_coop trains CLIP, freezes ctx)."""
    from hgr_tpu.config import Config
    from hgr_tpu.hierarchy import synthetic_hierarchy
    from hgr_tpu.train import (
        NegativeSampler,
        ScheduleBuilder,
        init_train_state,
        make_optimizer,
        make_train_step,
        sched_to_device,
    )
    from hgr_tpu.tree_model import TreeModel

    hier = synthetic_hierarchy(3, 4, 5, 0)
    cfg = Config(
        arch="TEST-RN", num_compare=4, lr=1e-3, w_lr=1e-3, coop=True,
        coop_train="ctx", sample_strategy="topk",
    )
    tm = TreeModel.build(cfg, hier, pad_multiple=64)
    tm.init_params(0)
    static, ctx = tm.coop_setup(0)
    text_fn = tm.coop_text_fn(static)

    tx = make_optimizer(cfg, 10, extra_labels={"clip": "frozen", "coop_ctx": "clip"})
    state = init_train_state(tm.params, tm.layer_weight, tx,
                             extra_params={"coop_ctx": ctx})
    step_fn = make_train_step(cfg, tm.clip_cfg, tx, dtype=jnp.float32,
                              donate=False, text_fn=text_fn)

    sampler = NegativeSampler(
        hier, np.arange(hier.num_nodes), 4, seed=0,
        topk_window="both", exclu_bro=True,
    )
    builder = ScheduleBuilder(hier, sampler, 0.25, 0.5, 4)
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 3)), jnp.float32
    )
    node_tokens = jnp.asarray(tm.node_tokens)
    clip_before = state.params["clip"]["logit_scale"]
    ctx_before = np.asarray(state.params["coop_ctx"])
    deep = int(hier.level(hier.max_depth)[0])
    state, loss = step_fn(state, images, node_tokens,
                          sched_to_device(builder.build(deep)))
    assert np.isfinite(float(loss))
    # ctx moved, clip frozen
    assert not np.allclose(np.asarray(state.params["coop_ctx"]), ctx_before)
    np.testing.assert_array_equal(
        np.asarray(state.params["clip"]["logit_scale"]), np.asarray(clip_before)
    )


def test_coop_bank_eval():
    """Classifier bank through the CoOp path feeds the standard eval."""
    from hgr_tpu.config import Config
    from hgr_tpu.eval.bank import build_bank_ids
    from hgr_tpu.hierarchy import synthetic_hierarchy
    from hgr_tpu.tree_model import TreeModel

    hier = synthetic_hierarchy(3, 3, 3, 0)
    cfg = Config(arch="TEST-RN", coop=True)
    tm = TreeModel.build(cfg, hier, pad_multiple=64)
    tm.init_params(0)
    static, ctx = tm.coop_setup(0)
    text_fn = tm.coop_text_fn(static)
    params = {"clip": tm.params, "coop_ctx": ctx}
    bank = build_bank_ids(params, tm.n_pad, text_fn, chunk=32,
                          out_dtype=jnp.float32)
    assert bank.shape == (tm.n_pad, CFG.embed_dim)
    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 32, 32, 3)), jnp.float32
    )
    m = tm.eval_step(tm.params, bank, imgs, target=3)
    assert float(m.num) == 4
