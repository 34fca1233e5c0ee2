"""Executed-reference oracle for the negative-sampling candidate pools.

``get_contra`` (``/root/reference/model/clip_tree.py:80-196``) is extracted
via ast and EXECUTED with our hierarchy's tables. The RNG and the
similarity ranking differ between frameworks, so the comparison neutralizes
both: ``num_compare`` is set to at least the pool size, which makes every
strategy return its ENTIRE candidate pool — the returned id SETS must then
be identical, pinning the exclusion-window semantics (the ``below`` depth
window, parent/child exclusion, sibling pools, the depth-0 special case)
against the reference's actual code.

``simi`` and ``near_simi`` are excluded from the pool comparison: NEITHER
can execute as written upstream — ``simi`` hands ``encode_text`` a list of
node ids instead of tokens (``clip_tree.py:99``), and ``near_simi`` slices
``argsort``'s [1, M] similarity on the wrong axis so the id list comes out
nested and the subsequent ``torch.tensor`` on the ragged result raises
(``clip_tree.py:170-176``; pinned by a test below). Both are repaired
rebuilds documented in sampling.py; only ``topk`` (the paper's default),
``random``, and ``brothers`` ever ran upstream.
"""

import ast
import copy as copy_mod
import os
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hgr_tpu.hierarchy import synthetic_hierarchy  # noqa: E402
from hgr_tpu.train.sampling import NegativeSampler  # noqa: E402

REF_TREE = "/root/reference/model/clip_tree.py"


def _extract_get_contra():
    if not os.path.exists(REF_TREE):
        pytest.skip("reference checkout not available")
    torch = pytest.importorskip("torch")
    import gc
    import random

    tree = ast.parse(open(REF_TREE).read())
    cls = next(
        n for n in tree.body
        if isinstance(n, ast.ClassDef) and n.name == "tree_model"
    )
    fn = next(
        m for m in cls.body
        if isinstance(m, ast.FunctionDef) and m.name == "get_contra"
    )
    ns = {"torch": torch, "random": random, "copy": copy_mod, "gc": gc}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), REF_TREE, "exec"), ns)  # noqa: S102
    return ns["get_contra"], torch


class _TinyTextModel:
    """encode_text stand-in for near_simi: deterministic feature per row
    (ranking differs from ours anyway; only the POOL matters here)."""

    def encode_text(self, toks):
        import torch

        t = toks.float()
        return torch.cat([t, t[:, :1]], dim=1)


@pytest.mark.parametrize("method", ["random", "topk", "brothers"])
def test_candidate_pools_match_executed_reference(method):
    get_contra, torch = _extract_get_contra()
    hier = synthetic_hierarchy(branching=3, levels=4, extra_edges=5, seed=0)
    n = hier.num_nodes
    train_ids = np.arange(n)

    d2n = {d: list(hier.level(d)) for d in range(hier.max_depth + 1)}
    p2c = {i: list(hier.children(i)) for i in range(n)}

    big = 10_000
    num_compare = n if method == "random" else big

    self_ns = types.SimpleNamespace(
        opts=types.SimpleNamespace(num_compare=num_compare, k=1),
        train_index=torch.arange(n),
        d2n=d2n,
        p2c=p2c,
        start_up=[int(x) for x in hier.root_children],
        device="cpu",
        node_tokens=torch.arange(n * 4).reshape(n, 4).long(),
        clip_model=_TinyTextModel(),
    )

    ours = NegativeSampler(hier, train_ids, num_compare, k=1, seed=0)

    targets = (
        [int(hier.level(d)[0]) for d in range(hier.max_depth + 1)]
        + [int(hier.level(hier.max_depth)[-1])]
    )
    for t in targets:
        parents = hier.chain_with_self(t)
        for depth in range(len(parents)):
            ref_ids, ref_lab = get_contra(
                self_ns, method, t, 2, depth=depth, parents=parents
            )
            ref_set = set(int(x) for x in ref_ids)
            assert int(ref_ids[int(ref_lab[0])]) == t

            ids, lab = ours.sample(method, t, depth, parents)
            assert ids[lab] == t
            assert set(ids) == ref_set, (
                f"{method} pool mismatch at target {t} depth {depth}: "
                f"ours-only {set(ids) - ref_set}, ref-only {ref_set - set(ids)}"
            )


def test_reference_near_simi_is_dead_code_as_written():
    """Pin WHY near_simi is excluded from the pool oracle: the reference
    slices the [1, M] argsort on the wrong axis (``clip_tree.py:170``), the
    id list comes out nested, and appending the scalar target makes the
    final ``torch.tensor`` ragged — it cannot have run upstream (the paper
    uses topk). Our sampling.py near_simi is a repaired rebuild."""
    get_contra, torch = _extract_get_contra()
    hier = synthetic_hierarchy(branching=3, levels=4, extra_edges=5, seed=0)
    n = hier.num_nodes
    self_ns = types.SimpleNamespace(
        opts=types.SimpleNamespace(num_compare=5, k=1),
        train_index=torch.arange(n),
        d2n={d: list(hier.level(d)) for d in range(hier.max_depth + 1)},
        p2c={i: list(hier.children(i)) for i in range(n)},
        start_up=[int(x) for x in hier.root_children],
        device="cpu",
        node_tokens=torch.arange(n * 4).reshape(n, 4).long(),
        clip_model=_TinyTextModel(),
    )
    t = int(hier.level(hier.max_depth)[0])
    parents = hier.chain_with_self(t)
    with pytest.raises((TypeError, ValueError)):
        get_contra(self_ns, "near_simi", t, 2, depth=1, parents=parents)
