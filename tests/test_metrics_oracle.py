"""Cross-framework metrics oracle: execute the reference's ACTUAL eval code.

Same pattern as ``test_om_oracle``: the reference's ``test()`` function
(``/root/reference/main.py:104-222``) and its ``gen_tree``/``count_acc``
helpers (``utils.py``) are extracted via ast (the modules have unimportable
deps: nltk corpus, ipdb, clip) and EXECUTED with a fake grouped loader and a
fake model that serves pre-drawn random logits. The same logits, hierarchy,
and candidate sets then go through our vectorized metric engine; every
reported number (Hit@{1,2,5,10,20}, TOR, path_ratio, point_ratio) must
match the reference's own printed output.

This specifically covers the ``index_fill(1, rest, -1)`` semantics of the
per-level constrained argmax (``main.py:169-171``): -1 is a REACHABLE value
for cosine*scale logits, so when every same-level candidate scores below -1
the reference predicts an out-of-level node (always a miss at that level).
A -inf-style mask would silently inflate POR/path relative to the
reference.
"""

import ast
import copy as copy_mod
import json
import os
import types
from collections import defaultdict

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REF_MAIN = "/root/reference/main.py"
REF_UTILS = "/root/reference/utils.py"


def _edges():
    """~50-node DAG with multi-parent nodes, depth 4, >=25 leaves."""
    edges = []
    k = 0

    def name(i):
        return f"n{i:03d}"

    tops = [name(k + i) for i in range(4)]
    k += 4
    edges += [("fall11", t) for t in tops]
    mids = []
    for t in tops:
        for _ in range(3):
            m = name(k)
            k += 1
            edges.append((t, m))
            mids.append(m)
    leaves = []
    for m in mids:
        for _ in range(3):
            lf = name(k)
            k += 1
            edges.append((m, lf))
            leaves.append(lf)
    # multi-parent cross edges (second parents; shortest path unchanged)
    edges.append((mids[0], leaves[-1]))
    edges.append((tops[1], mids[0]))
    return edges, tops, mids, leaves


def _extract(path, names, ns):
    import torch  # noqa: F401

    src = open(path).read()
    tree = ast.parse(src)
    fns = [
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name in names
    ]
    assert len(fns) == len(names), f"{names} not all found in {path}"
    mod = ast.Module(body=fns, type_ignores=[])
    exec(compile(mod, path, "exec"), ns)  # noqa: S102 — executing the oracle
    return ns


@pytest.mark.slow
def test_metrics_match_executed_reference(tmp_path, monkeypatch):
    if not (os.path.exists(REF_MAIN) and os.path.exists(REF_UTILS)):
        pytest.skip("reference checkout not available")
    torch = pytest.importorskip("torch")
    import networkx as nx

    monkeypatch.chdir(tmp_path)  # the reference writes {weights}.txt to cwd
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)

    edges, tops, mids, leaves = _edges()
    graph_path = tmp_path / "edges.json"
    json.dump(edges, open(graph_path, "w"))

    # ---- reference side: gen_tree + count_acc + test(), executed ----------
    uns = {"nx": nx, "json": json, "defaultdict": defaultdict}
    _extract(REF_UTILS, ["map_label", "gen_tree", "count_acc"], uns)
    opts = types.SimpleNamespace(
        graph_path=str(graph_path), print_freq=10_000, out_ratio=0.25,
        in_ratio=0.5, weights="adaptive", data_split_test="zsl_test",
        data_test="rest",
    )
    p2c, c2p, d2n, nodes, start_up = uns["gen_tree"](opts)
    n = len(nodes)

    train_names = [nd for nd in nodes if nd not in leaves[:6]]  # candidates
    test_names = list(leaves)  # 25+ unseen classes (top-20 needs >= 20)
    train_index = torch.tensor([nodes.index(x) for x in train_names])
    test_index = torch.tensor([nodes.index(x) for x in test_names])

    rng = np.random.default_rng(0)
    B = 6
    batch_classes = [
        nodes.index(x) for x in (leaves[0], leaves[7], leaves[-1], leaves[1])
    ]
    batch_logits = [
        rng.standard_normal((B, n)).astype(np.float32) for _ in batch_classes
    ]
    # force the index_fill(-1) branch in the last batch: every node at the
    # target's mid level scores BELOW the fill value, with the gt ancestor
    # the best of them. The reference then predicts an out-of-level node
    # (value -1 beats all level candidates) — a guaranteed miss at that
    # level — while a -inf-style mask would pick the gt and count a hit.
    mid_level_ids = [i for i in range(n) if len(c2p[i]) == 1]
    batch_logits[-1][:, mid_level_ids] = -3.0 + 0.5 * rng.random(
        (B, len(mid_level_ids))
    ).astype(np.float32)
    gt_mid = c2p[batch_classes[-1]][1]
    batch_logits[-1][:, gt_mid] = -2.0  # best in level, still below the fill

    class FakeModel:
        save_path = str(tmp_path) + os.sep
        resolution = 4

        def __init__(self):
            self.nodes = nodes
            self.c2p = c2p
            self.d2n = d2n
            self.train_index = train_index
            self.test_index = test_index
            self._i = 0

        def eval(self):
            return self

        def update_classifier(self):
            pass

        def __call__(self, imgs, targets):
            out = torch.tensor(batch_logits[self._i])
            self._i += 1
            return out

    class FakeLoader:
        batch_sampler = types.SimpleNamespace(num_batch=len(batch_classes))

        def __iter__(self):
            for c in batch_classes:
                yield {
                    "img": torch.zeros((1, B, 3, 4, 4)),
                    "label": torch.full((1, B), c, dtype=torch.long),
                }

    class FakeDM:
        def __init__(self, **kw):
            pass

        def get_data_loader(self):
            return FakeLoader()

    mns = {
        "torch": torch, "copy": copy_mod, "count_acc": uns["count_acc"],
        "DataManager_test": FakeDM,
    }
    _extract(REF_MAIN, ["test"], mns)
    mns["test"](opts, FakeModel(), "cpu", {"rest": test_names})

    ref_log = open(str(tmp_path) + os.sep + "arugements.log").read()
    last = ref_log.strip().splitlines()[-1]

    def parse(tag):
        return float(last.split(tag)[1].split(",")[0].split(" ")[0].rstrip("."))

    ref = {
        "hit@1": parse("Top@1(%):"), "hit@2": parse("Top@2(%):"),
        "hit@5": parse("Top@5(%):"), "hit@10": parse("Top@10(%):"),
        "hit@20": parse("Top@20(%):"), "tor": parse("hit_ratio(%):"),
        "path_ratio": parse("path_ratio(%):"),
        "point_ratio": parse("point_ratio(%):"),
    }

    # ---- our side: same hierarchy, same logits, vectorized engine ---------
    from hgr_tpu.eval.metrics import (
        accumulate,
        batch_metrics,
        summarize,
        zeros_metrics,
    )
    from hgr_tpu.hierarchy import Hierarchy

    hier = Hierarchy.from_edges(edges)
    assert list(hier.names) == nodes  # id spaces must align

    train_mask = np.zeros(n, bool)
    train_mask[np.asarray(train_index)] = True
    test_mask = np.zeros(n, bool)
    test_mask[np.asarray(test_index)] = True

    total = zeros_metrics()
    for c, logits in zip(batch_classes, batch_logits):
        chain = hier.chain_with_self(c)
        lmax = hier.max_chain + 1
        chain_pad = np.full(lmax, -1, np.int32)
        chain_pad[: len(chain)] = chain
        total = accumulate(total, batch_metrics(
            jnp.asarray(logits), jnp.asarray(c), jnp.asarray(chain_pad),
            jnp.asarray(np.int32(len(chain))),
            jnp.asarray(hier.depth.astype(np.int32)),
            jnp.asarray(train_mask), jnp.asarray(test_mask),
        ))
    ours = summarize(total)

    for key, want in ref.items():
        assert abs(round(ours[key], 2) - want) < 0.011, (
            f"{key}: ours {ours[key]:.4f} vs reference {want:.2f}\n"
            f"reference line: {last}"
        )

    # ---- depth-sorted fast path: same reference numbers -------------------
    from hgr_tpu.eval.metrics import metrics_from_preds
    from hgr_tpu.ops.bank_topk import level_argmax_sorted

    depth = hier.depth.astype(np.int32)
    order_np = np.argsort(depth, kind="stable").astype(np.int32)
    offsets = [0]
    for d in range(int(depth.max()) + 1):
        offsets.append(offsets[-1] + int((depth == d).sum()))
    train_sorted = train_mask[order_np]
    test_sorted = test_mask[order_np]
    total_train = int(train_mask.sum())
    fill_outside = jnp.asarray(
        [
            total_train - int(train_sorted[offsets[d]: offsets[d + 1]].sum()) > 0
            for d in range(len(offsets) - 1)
        ]
        + [False]
    )

    total2 = zeros_metrics()
    for c, logits in zip(batch_classes, batch_logits):
        chain = hier.chain_with_self(c)
        lmax = hier.max_chain + 1
        chain_pad = np.full(lmax, -1, np.int32)
        chain_pad[: len(chain)] = chain
        levels = np.where(chain_pad >= 0, depth[np.maximum(chain_pad, 0)], 0)
        logits_s = jnp.asarray(logits[:, order_np])
        preds_s, vals = level_argmax_sorted(
            logits_s, tuple(offsets), jnp.asarray(train_sorted)
        )
        preds_global = jnp.asarray(order_np)[preds_s]
        total2 = accumulate(total2, metrics_from_preds(
            preds_global, logits_s, jnp.asarray(order_np), jnp.asarray(c),
            jnp.asarray(chain_pad), jnp.asarray(np.int32(len(chain))),
            jnp.asarray(levels.astype(np.int32)), jnp.asarray(test_sorted),
            lvl_vals=vals, fill_outside=fill_outside,
        ))
    ours2 = summarize(total2)
    for key, want in ref.items():
        assert abs(round(ours2[key], 2) - want) < 0.011, (
            f"sorted path {key}: ours {ours2[key]:.4f} vs reference {want:.2f}"
        )
