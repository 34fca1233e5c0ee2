"""DGP / SGCN baseline family: GCN regression from class embeddings to
classifier weights.

Behavioural rebuild of the reference's GCN variants
(``baseline/DGP/models/gcn.py:42-88``, ``models/gcn_dense.py:84-92``,
``models/gcn_dense_att.py:31-116``) and the two-stage pipeline
(``baseline/DGP/train_gcn_dense_att.py``, ``evaluate_imagenet.py``):

stage A  regress word/CLIP-text vectors through a GCN over the WordNet DAG
         onto the (normalized) fc rows of a pretrained classifier for seen
         classes — masked L2 loss, Adam, full-graph epochs;
stage B  score features (+bias column) against ALL predicted classifiers and
         run the same hierarchical metrics.

TPU-native message passing: the reference multiplies scipy-sparse
adjacencies on GPU; here each adjacency is an edge list and aggregation is a
gather + ``segment_sum`` with in-degree normalization (``normt_spm('in')``:
receiver-mean over predecessors, ``baseline/DGP/utils.py:56-73``) — XLA
compiles these to efficient one-hot/scatter matmuls, with no sparse kernels
needed at WordNet scale (~60K edges).

Variants:
- :class:`GCNParams` with ``mode='basic'``  — one adjacency every layer (SGCN)
- ``mode='dense'``  — ancestor/descendant adjacencies alternating per layer
  (DGP two-sided propagation)
- ``mode='dense_att'`` — per-hop-distance adjacency sets with learned
  softmax attention per side (DGP attention variant; hop grouping capped at
  4, ``train_gcn_dense_att.py:49-53``)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Edges = np.ndarray  # [E, 2] int32 (src, dst) meaning src -> dst


@dataclass
class Adjacency:
    """Edge list + receiver in-degree normalization weights."""

    src: jnp.ndarray   # [E]
    dst: jnp.ndarray   # [E]
    wgt: jnp.ndarray   # [E] = 1 / indeg(dst)
    n: int

    @classmethod
    def build(cls, edges: Edges, n: int, transpose: bool = False) -> "Adjacency":
        e = np.asarray(edges, np.int64)
        src, dst = (e[:, 0], e[:, 1]) if not transpose else (e[:, 1], e[:, 0])
        indeg = np.bincount(dst, minlength=n).astype(np.float32)
        wgt = 1.0 / np.maximum(indeg[dst], 1.0)
        return cls(
            src=jnp.asarray(src, jnp.int32),
            dst=jnp.asarray(dst, jnp.int32),
            wgt=jnp.asarray(wgt, jnp.float32),
            n=n,
        )

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """Â @ x: receiver-mean aggregation over predecessors."""
        msgs = x[self.src] * self.wgt[:, None].astype(x.dtype)
        return jax.ops.segment_sum(msgs, self.dst, num_segments=self.n)


def graph_conv_init(key, c_in: int, c_out: int) -> Dict:
    # xavier-uniform like torch nn.Linear default-ish init used upstream
    bound = float(np.sqrt(6.0 / (c_in + c_out)))
    return {
        "w": jax.random.uniform(key, (c_in, c_out), jnp.float32, -bound, bound),
        "b": jnp.zeros((c_out,), jnp.float32),
    }


def parse_hidden_layers(spec: str) -> Tuple[List[int], List[bool], bool]:
    """The reference's 'd2048,d' style layer spec
    (``models/gcn.py:53-76``): leading 'd' = dropout before that conv;
    trailing lone 'd' = dropout before the output conv."""
    parts = spec.split(",")
    dropout_last = False
    if parts and parts[-1] == "d":
        dropout_last = True
        parts = parts[:-1]
    dims: List[int] = []
    drops: List[bool] = []
    for c in parts:
        d = c.startswith("d")
        drops.append(d)
        dims.append(int(c[1:] if d else c))
    return dims, drops, dropout_last


@dataclass
class GCNConfig:
    n: int
    in_channels: int
    out_channels: int
    hidden_layers: str = "d2048,d"
    mode: str = "basic"        # basic | dense | dense_att
    n_hops: int = 1            # adjacency sets for dense_att
    dropout_rate: float = 0.5


def gcn_init(key, cfg: GCNConfig) -> Dict:
    dims, _, _ = parse_hidden_layers(cfg.hidden_layers)
    chans = [cfg.in_channels] + dims + [cfg.out_channels]
    keys = jax.random.split(key, len(chans))
    params: Dict = {
        "convs": [
            graph_conv_init(k, a, b)
            for k, a, b in zip(keys, chans[:-1], chans[1:])
        ]
    }
    if cfg.mode == "dense_att":
        params["a_att"] = jnp.ones((cfg.n_hops,), jnp.float32)
        params["r_att"] = jnp.ones((cfg.n_hops,), jnp.float32)
    return params


def gcn_apply(
    params: Dict,
    cfg: GCNConfig,
    x: jnp.ndarray,                 # [N, in_channels]
    adj: Sequence[Adjacency],       # forward adjacency (per hop for dense_att)
    r_adj: Optional[Sequence[Adjacency]] = None,  # reverse side
    dropout_rng: Optional[jax.Array] = None,      # None = eval (no dropout)
) -> jnp.ndarray:
    """Full-graph forward -> L2-normalized predicted classifiers [N, out]."""
    dims, drops, dropout_last = parse_hidden_layers(cfg.hidden_layers)
    drops = drops + [dropout_last]
    n_layers = len(params["convs"])

    def maybe_dropout(h, i):
        if dropout_rng is None or not drops[i]:
            return h
        keep = 1.0 - cfg.dropout_rate
        rng = jax.random.fold_in(dropout_rng, i)
        mask = jax.random.bernoulli(rng, keep, h.shape)
        return jnp.where(mask, h / keep, 0.0)

    h = x
    for i, conv in enumerate(params["convs"]):
        h = maybe_dropout(h, i)
        support = h @ conv["w"] + conv["b"]
        use_reverse = cfg.mode in ("dense", "dense_att") and (i % 2 == 1)
        side = (r_adj if use_reverse else adj)
        if cfg.mode == "dense_att":
            att = params["r_att"] if use_reverse else params["a_att"]
            att = jax.nn.softmax(att)
            out = sum(a.matvec(support) * att[j] for j, a in enumerate(side))
        else:
            out = side[0].matvec(support)
        if i < n_layers - 1:
            out = jax.nn.relu(out)
        h = out
    norm = jnp.linalg.norm(h, axis=-1, keepdims=True)
    return h / jnp.maximum(norm, 1e-12)


def l2_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Reference ``l2_loss`` (``baseline/DGP/utils.py:52-53``)."""
    return jnp.sum((a - b) ** 2) / (a.shape[0] * 2)


def masked_l2_loss(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked L2 over seen-class rows (``train_gcn_dense_att.py:18-19``)."""
    return l2_loss(pred[mask], target[mask])


def make_gcn_train_step(cfg: GCNConfig, tx, adj, r_adj=None):
    """Jitted full-graph Adam step: (params, opt_state, rng) -> loss."""
    import optax

    def loss_fn(params, x, fc_vectors, seen_idx, rng):
        pred = gcn_apply(params, cfg, x, adj, r_adj, dropout_rng=rng)
        return masked_l2_loss(pred, fc_vectors, seen_idx)

    @jax.jit
    def step(params, opt_state, x, fc_vectors, seen_idx, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, x, fc_vectors, seen_idx, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def dense_edges(hier, max_hops: Optional[int] = None) -> List[Edges]:
    """Transitive-closure ancestor->descendant edges grouped by hop distance
    (reference ``materials/make_dense_grouped_graph.py``; hop grouping capped
    by the caller like ``train_gcn_dense_att.py:49-53``), plus self-loops in
    group 0."""
    n = hier.num_nodes
    groups: Dict[int, List[Tuple[int, int]]] = {0: [(i, i) for i in range(n)]}
    for node in range(n):
        chain = hier.chain(node)
        L = len(chain)
        for d, anc in enumerate(chain):
            hop = L - d
            groups.setdefault(hop, []).append((anc, node))
    hops = sorted(groups)
    if max_hops is not None and len(hops) > max_hops:
        head, tail = hops[:max_hops - 1], hops[max_hops - 1:]
        merged = []
        for h in tail:
            merged.extend(groups[h])
        out = [np.asarray(groups[h], np.int64) for h in head]
        out.append(np.asarray(merged, np.int64))
        return out
    return [np.asarray(groups[h], np.int64) for h in hops]


def basic_edges(hier, self_loops: bool = True) -> Edges:
    """Parent->child edges (+ self loops), the SGCN adjacency."""
    out: List[Tuple[int, int]] = []
    for p in range(hier.num_nodes):
        for c in hier.children(p):
            out.append((p, c))
    if self_loops:
        out.extend((i, i) for i in range(hier.num_nodes))
    return np.asarray(out, np.int64)
