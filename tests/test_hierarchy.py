"""Hierarchy tables: golden/property tests against a networkx oracle.

The oracle re-derives the reference's ``gen_tree`` semantics
(reference ``utils.py:39-72``) independently with networkx so our
padded-array build is checked against an implementation we didn't write.
"""

import networkx as nx
import numpy as np
import pytest

from hgr_tpu.hierarchy import (
    Hierarchy,
    ROOT,
    contract_graph,
    filter_splits,
    synthetic_hierarchy,
)

EDGES = [
    (ROOT, "a"),
    (ROOT, "b"),
    ("a", "c"),
    ("a", "d"),
    ("b", "d"),  # multi-parent node
    ("c", "e"),
    ("d", "f"),
    ("b", "g"),
    ("g", "h"),
    ("d", "h"),  # second multi-parent, differing depths via b->g vs a->d
]


def oracle(edges):
    G = nx.DiGraph()
    G.add_edges_from(edges)
    nodes = [n for n in G.nodes() if n != ROOT]
    start_up = [nodes.index(c) for c in G[ROOT]]
    p2c = [[nodes.index(c) for c in G[n]] for n in nodes]
    c2p = []
    for n in nodes:
        path = nx.shortest_path(G, source=ROOT, target=n)[1:-1]
        c2p.append([nodes.index(p) for p in path])
    d2n = {}
    for i, n in enumerate(nodes):
        d2n.setdefault(len(c2p[i]), []).append(i)
    return nodes, start_up, p2c, c2p, d2n


def test_node_ordering_and_children_match_networkx():
    h = Hierarchy.from_edges(EDGES)
    nodes, start_up, p2c, c2p, d2n = oracle(EDGES)
    assert h.names == nodes
    assert list(h.root_children) == start_up
    for i in range(len(nodes)):
        assert h.children(i) == p2c[i]


def test_chains_are_shortest_and_parent_linked():
    h = Hierarchy.from_edges(EDGES)
    nodes, _, p2c, c2p, _ = oracle(EDGES)
    for i in range(len(nodes)):
        # depth must equal the oracle's (any shortest path has the same length)
        assert h.depth[i] == len(c2p[i])
        chain = h.chain_with_self(i)
        for a, b in zip(chain[:-1], chain[1:]):
            assert b in p2c[a]


def test_levels_match_oracle():
    h = Hierarchy.from_edges(EDGES)
    _, _, _, _, d2n = oracle(EDGES)
    assert h.max_depth == max(d2n)
    for d, members in d2n.items():
        assert sorted(h.level(d)) == sorted(members)
    assert int(h.level_sizes.sum()) == h.num_nodes


def test_padding_is_consistent():
    h = synthetic_hierarchy(branching=3, levels=5, extra_edges=20, seed=1)
    for i in range(h.num_nodes):
        d = int(h.depth[i])
        assert (h.ancestors[i, d:] == -1).all()
        assert (h.ancestors[i, :d] >= 0).all()


def test_synthetic_has_multiparent_nodes():
    h = synthetic_hierarchy(branching=3, levels=4, extra_edges=5, seed=0)
    n_parents = np.zeros(h.num_nodes, dtype=int)
    for p in range(h.num_nodes):
        for c in h.children(p):
            n_parents[c] += 1
    assert (n_parents > 1).any()


def test_contract_graph_skips_removed_nodes():
    edges = [(ROOT, "a"), ("a", "x"), ("x", "b"), ("x", "c"), ("a", "c"), (ROOT, "y"), ("y", "d")]
    out = contract_graph(edges, keep=["a", "b", "c", "d"])
    G = dict()
    for u, v in out:
        G.setdefault(u, set()).add(v)
    # x removed: a inherits x's children; y removed: root inherits d
    assert G["a"] == {"b", "c"}
    assert "x" not in G and "y" not in G
    assert "d" in G[ROOT]
    # result must itself build into a valid hierarchy
    h = Hierarchy.from_edges(out)
    assert set(h.names) == {"a", "b", "c", "d"}


def test_contract_chain_of_removed_nodes():
    edges = [(ROOT, "a"), ("a", "x1"), ("x1", "x2"), ("x2", "b")]
    out = contract_graph(edges, keep=["a", "b"])
    assert ("a", "b") in out
    assert len(out) == 2


def test_filter_splits_order_and_dedup():
    testsets = {"train": ["a", "b", "z"], "all": ["c", "b", "w"]}
    s = filter_splits(testsets, winter_wnids=["a", "b", "c"], graph_nodes=["a", "b", "c", "w"])
    assert s["train"] == ["a", "b"]
    assert s["rest"] == ["c", "b"]
    assert s["all"] == ["a", "b", "c"]


def test_unreachable_node_raises():
    with pytest.raises(ValueError):
        Hierarchy.from_edges([(ROOT, "a"), ("q", "r")])
