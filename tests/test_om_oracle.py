"""Cross-framework OM-loss oracle: execute the reference's ACTUAL torch code.

VERDICT r1 item 5: the OM loss was previously verified only against a JAX
re-derivation of the reference loop — a shared misreading of
``/root/reference/model/clip_tree.py:222-281`` would pass both sides. Here
the reference's literal ``train_batch`` / ``get_weights`` method bodies are
extracted from the source via ast (not re-typed, not imported — the module
has unimportable deps like ipdb) and EXECUTED against a tiny torch CLIP,
with ``get_contra`` injected to replay the exact compare sets produced by
``ScheduleBuilder``. Loss and gradients (image encoder, text embedding,
logit_scale, adaptive layer_weight) must match the JAX ``om_loss`` through
weight conversion.
"""

import ast
import copy as copy_mod
import math
import os
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hgr_tpu.hierarchy import synthetic_hierarchy  # noqa: E402
from hgr_tpu.models import clip as jclip  # noqa: E402
from hgr_tpu.models.convert import convert_state_dict  # noqa: E402
from hgr_tpu.train.om import make_om_loss_fn  # noqa: E402
from hgr_tpu.train.sampling import NegativeSampler, ScheduleBuilder  # noqa: E402
from hgr_tpu.train.trainer import sched_to_device  # noqa: E402
from hgr_tpu.tree_model import synthetic_tokens  # noqa: E402

REF_TREE = "/root/reference/model/clip_tree.py"
REF_CLIP = "/root/reference/clip/model.py"


def _extract_methods(*names):
    """Compile the named tree_model methods from the reference source."""
    if not os.path.exists(REF_TREE):
        pytest.skip("reference checkout not available")
    torch = pytest.importorskip("torch")
    src = open(REF_TREE).read()
    tree = ast.parse(src)
    cls = next(
        n for n in tree.body
        if isinstance(n, ast.ClassDef) and n.name == "tree_model"
    )
    fns = [m for m in cls.body if isinstance(m, ast.FunctionDef) and m.name in names]
    assert len(fns) == len(names), f"methods {names} not all found"
    mod = ast.Module(body=fns, type_ignores=[])
    ns = {
        "torch": torch,
        "nn": torch.nn,
        "F": torch.nn.functional,
        "math": math,
        "copy": copy_mod,
    }
    exec(compile(mod, REF_TREE, "exec"), ns)  # noqa: S102 — executing the oracle
    return {n: ns[n] for n in names}, torch


def _tiny_torch_clip(torch):
    import importlib.util

    if not os.path.exists(REF_CLIP):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("ref_clip_model_om", REF_CLIP)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cfg = jclip.get_config("TEST-RN")
    torch.manual_seed(0)
    ref = mod.CLIP(
        cfg.embed_dim, cfg.image_resolution, tuple(cfg.vision_layers),
        cfg.vision_width, None, cfg.context_length, cfg.vocab_size,
        cfg.transformer_width, cfg.transformer_heads, cfg.transformer_layers,
    ).float().eval()  # the reference trains with BN in eval mode
    # (frozen running stats): clip_tree.py:45 calls clip_model.eval() then
    # re-enables requires_grad on every parameter (:47-48)
    return ref, cfg


class _RecordingSampler(NegativeSampler):
    """Records every (ids, label, target, depth) the builder draws, in order."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.calls = []

    def sample(self, method, target, depth, parents):
        ids, lab = super().sample(method, target, depth, parents)
        self.calls.append((list(ids), lab, int(target), int(depth)))
        return ids, lab


@pytest.mark.parametrize("weights", ["equal", "increasing", "adaptive"])
def test_om_loss_and_grads_match_executed_reference(weights):
    fns, torch = _extract_methods("train_batch", "get_weights")
    ref, cfg = _tiny_torch_clip(torch)
    hier = synthetic_hierarchy(branching=3, levels=4, extra_edges=5, seed=0)
    n = hier.num_nodes
    tokens = synthetic_tokens(n, cfg.context_length, cfg.vocab_size, seed=0)

    out_ratio, in_ratio, num_compare = 0.5, 0.5, 6
    target = int(hier.level(hier.max_depth)[0])
    sampler = _RecordingSampler(hier, np.arange(n), num_compare, seed=0)
    builder = ScheduleBuilder(hier, sampler, out_ratio, in_ratio, num_compare)
    sched_host = builder.build(target)

    n_levels = hier.max_depth + 1
    lw_init = (1.0 / hier.level_sizes.astype(np.float32)) * 1.0

    # ---- reference side: execute the literal train_batch ------------------
    replay = iter(list(sampler.calls))

    def get_contra(method, target, batch_size, depth=None, parents=None):
        ids, lab, want_t, want_d = next(replay)
        # the builder must have drawn this set for the same (node, depth)
        assert int(target) == want_t and int(depth) == want_d
        return (
            torch.tensor(ids, dtype=torch.long),
            torch.tensor([lab] * batch_size, dtype=torch.long),
        )

    self_ns = types.SimpleNamespace(
        clip_model=ref,
        c2p={i: hier.chain(i) for i in range(n)},
        opts=types.SimpleNamespace(
            out_ratio=out_ratio, in_ratio=in_ratio,
            weights=weights, weighting="both", sample_strategy="topk",
        ),
        loss=torch.nn.CrossEntropyLoss(),
        device="cpu",
        node_tokens=torch.tensor(tokens, dtype=torch.long),
        get_contra=get_contra,
        layer_weight=torch.nn.Parameter(torch.tensor(lw_init)),
    )
    self_ns.get_weights = types.MethodType(fns["get_weights"], self_ns)

    rng = np.random.default_rng(0)
    x = rng.standard_normal(
        (2, cfg.image_resolution, cfg.image_resolution, 3)
    ).astype(np.float32)
    inputs = torch.from_numpy(x.transpose(0, 3, 1, 2))
    targets = torch.tensor([target, target], dtype=torch.long)
    ref.zero_grad(set_to_none=True)
    ref_loss = fns["train_batch"](self_ns, inputs, targets, "OM", "topk")
    assert next(replay, None) is None, "builder and reference drew different pair counts"

    # ---- JAX side ----------------------------------------------------------
    params = {
        "clip": convert_state_dict(ref.state_dict(), cfg),
        "layer_weight": jnp.asarray(lw_init),
    }
    loss_fn = make_om_loss_fn(cfg, jnp.float32, "OM", weights, "both")
    jax_loss, grads = jax.value_and_grad(loss_fn)(
        params, jnp.asarray(x), jnp.asarray(tokens), sched_to_device(sched_host)
    )

    np.testing.assert_allclose(float(jax_loss), float(ref_loss), rtol=2e-4)

    def t_grad(p):
        assert p.grad is not None
        return p.grad.detach().numpy()

    # image encoder grad (through the deferred img_feats backward)
    g_conv = np.asarray(grads["clip"]["visual"]["conv1"]["w"]).transpose(3, 2, 0, 1)
    want = t_grad(ref.visual.conv1.weight)
    np.testing.assert_allclose(
        g_conv, want, rtol=2e-3, atol=2e-4 * max(1.0, np.abs(want).max())
    )
    # text encoder grad (accumulated across every (k, m) pair)
    g_emb = np.asarray(grads["clip"]["text"]["token_embedding"])
    want = t_grad(ref.token_embedding.weight)
    np.testing.assert_allclose(
        g_emb, want, rtol=2e-3, atol=2e-4 * max(1.0, np.abs(want).max())
    )
    # logit_scale grad (every pair's logits contribute)
    np.testing.assert_allclose(
        float(grads["clip"]["logit_scale"]),
        float(t_grad(ref.logit_scale)),
        rtol=2e-3,
    )
    if weights == "adaptive":
        g_lw = np.asarray(grads["layer_weight"])
        want = t_grad(self_ns.layer_weight)
        np.testing.assert_allclose(g_lw, want, rtol=2e-3, atol=1e-6)


@pytest.mark.parametrize("weights", ["equal", "increasing", "adaptive"])
def test_hierarchical_loss_and_grads_match_executed_reference(weights):
    """Same executed-reference oracle for the 'hierarchical' method
    (``model/clip_tree.py:283-316``): one pair per chain position, label
    always the TARGET's slot, per-position get_weights factor."""
    fns, torch = _extract_methods("train_batch", "get_weights")
    ref, cfg = _tiny_torch_clip(torch)
    hier = synthetic_hierarchy(branching=3, levels=4, extra_edges=5, seed=0)
    n = hier.num_nodes
    tokens = synthetic_tokens(n, cfg.context_length, cfg.vocab_size, seed=0)

    num_compare = 6
    target = int(hier.level(hier.max_depth)[0])
    sampler = _RecordingSampler(hier, np.arange(n), num_compare, seed=0)
    builder = ScheduleBuilder(
        hier, sampler, 0.5, 0.5, num_compare, method="hierarchical"
    )
    sched_host = builder.build(target)

    lw_init = (1.0 / hier.level_sizes.astype(np.float32)) * 1.0
    replay = iter(list(sampler.calls))

    def get_contra(method, target, batch_size, depth=None, parents=None):
        ids, lab, want_t, want_d = next(replay)
        assert int(target) == want_t and int(depth) == want_d
        return (
            torch.tensor(ids, dtype=torch.long),
            torch.tensor([lab] * batch_size, dtype=torch.long),
        )

    self_ns = types.SimpleNamespace(
        clip_model=ref,
        c2p={i: hier.chain(i) for i in range(n)},
        opts=types.SimpleNamespace(
            out_ratio=0.5, in_ratio=0.5, weights=weights, weighting="both",
            sample_strategy="topk",
        ),
        loss=torch.nn.CrossEntropyLoss(),
        device="cpu",
        node_tokens=torch.tensor(tokens, dtype=torch.long),
        get_contra=get_contra,
        layer_weight=torch.nn.Parameter(torch.tensor(lw_init)),
    )
    self_ns.get_weights = types.MethodType(fns["get_weights"], self_ns)

    rng = np.random.default_rng(1)
    x = rng.standard_normal(
        (2, cfg.image_resolution, cfg.image_resolution, 3)
    ).astype(np.float32)
    inputs = torch.from_numpy(x.transpose(0, 3, 1, 2))
    targets = torch.tensor([target, target], dtype=torch.long)
    ref.zero_grad(set_to_none=True)
    ref_loss = fns["train_batch"](self_ns, inputs, targets, "hierarchical", "topk")
    assert next(replay, None) is None

    params = {
        "clip": convert_state_dict(ref.state_dict(), cfg),
        "layer_weight": jnp.asarray(lw_init),
    }
    loss_fn = make_om_loss_fn(cfg, jnp.float32, "hierarchical", weights, "both")
    jax_loss, grads = jax.value_and_grad(loss_fn)(
        params, jnp.asarray(x), jnp.asarray(tokens), sched_to_device(sched_host)
    )
    np.testing.assert_allclose(float(jax_loss), float(ref_loss), rtol=2e-4)

    def t_grad(p):
        assert p.grad is not None
        return p.grad.detach().numpy()

    g_conv = np.asarray(grads["clip"]["visual"]["conv1"]["w"]).transpose(3, 2, 0, 1)
    want = t_grad(ref.visual.conv1.weight)
    np.testing.assert_allclose(
        g_conv, want, rtol=2e-3, atol=2e-4 * max(1.0, np.abs(want).max())
    )
    g_emb = np.asarray(grads["clip"]["text"]["token_embedding"])
    want = t_grad(ref.token_embedding.weight)
    np.testing.assert_allclose(
        g_emb, want, rtol=2e-3, atol=2e-4 * max(1.0, np.abs(want).max())
    )
    if weights == "adaptive":
        np.testing.assert_allclose(
            np.asarray(grads["layer_weight"]), t_grad(self_ns.layer_weight),
            rtol=2e-3, atol=1e-6,
        )
