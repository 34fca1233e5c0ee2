"""Baseline runner CLI: train + hierarchically evaluate each baseline family.

The reference ships one ad-hoc CLI per baseline, each re-implementing the
hierarchy tables and the full eval-metric block (SURVEY §2.4:
``baseline/CLIP/clip_train.py``, ``baseline/DGP/train_*.py`` +
``evaluate_imagenet.py``, ``baseline/CNZSL/cnzsl.py``, ``baseline/FREE/``).
Here one runner drives all of them through the SHARED hierarchy + metric
engine:

  python -m hgr_tpu.baselines.run --baseline cnzsl --synthetic True
  python -m hgr_tpu.baselines.run --baseline gcn --variant dense_att ...
  python -m hgr_tpu.baselines.run --baseline free ...
  python -m hgr_tpu.baselines.run --baseline clip_flat --arch TEST-RN ...

Feature inputs: with ``--synthetic`` the frozen-backbone features are
fabricated as class prototypes (a linear map of the class embedding) plus
noise, so every baseline's learning signal is real and the hierarchical
metrics are meaningful end-to-end without ImageNet. Real inputs plug in via
``--attrs_path`` (class embeddings: ``text_feats.json`` for the paper's
"Tr" rows — producer ``tools/export_text_feats.py`` — or ``glove:<txt>``
for "w2v") and ``--protos_path`` (``fc-weights.json`` / a torch ResNet-50
checkpoint / ``.npy``); ``--tr_concat`` applies the reference's Tr
embedding preprocessing (``train_gcn_dense_trans.py:70-77``). Real IMAGE
evaluation (the reference's stage-B ``evaluate_imagenet.py:65-152`` flow)
plugs in via ``--image_root`` + ``--manifest`` + ``--cnn`` (on-disk JPEGs
-> loader -> frozen ResNet-50 featurizer -> bias column -> shared metric
engine; see :func:`evaluate_real_images`) or ``--feature_file`` for
precomputed features; ``--train_feature_file`` additionally trains
cnzsl/free on real stored seen-class features, and ``--refit_backbone``
runs the DGP stage-A' backbone refit (``train_resnet_fit.py``) between
GCN stage A and eval.
"""

from __future__ import annotations

import argparse
import json
import numpy as np


def build_eval_tables(hier, splits):
    """Padded arrays for the shared metric engine (like TreeModel.build)."""
    n = hier.num_nodes
    train_ids = hier.ids(splits["all"])
    test_ids = hier.ids(splits["rest"])
    train_mask = np.zeros(n, bool)
    train_mask[train_ids] = True
    test_mask = np.zeros(n, bool)
    test_mask[test_ids] = True
    lmax = hier.max_chain + 1
    chains = np.full((n, lmax), -1, np.int32)
    chain_len = np.zeros(n, np.int32)
    for i in range(n):
        c = hier.chain_with_self(i)
        chains[i, : len(c)] = c
        chain_len[i] = len(c)
    return train_mask, test_mask, chains, chain_len


def load_attrs(path: str, hier, names_path: str = "") -> np.ndarray:
    """Real class-embedding sources, matching the reference consumers:

    - ``*.json`` — ``text_feats.json`` (list of ``[1, D]`` rows in node
      order; producer ``tools/export_text_feats.py``, consumed upstream at
      ``train_gcn_dense_trans.py:70``) — the paper's "Tr" rows;
    - ``glove:<vectors.txt>`` — GloVe word vectors keyed by class NAME
      (``materials/make_induced_graph.py`` / ``glove.py``) — the "w2v" rows;
      ``names_path`` maps wnid -> human name (``tools/export_wordnet_names``);
    - ``*.npy`` — any precomputed [N, D] matrix.
    """
    if path.startswith("glove:"):
        from .materials import GloVe, wnid_vectors

        names = json.load(open(names_path)) if names_path else {}
        g = GloVe.from_txt(path[len("glove:"):])
        a = wnid_vectors(g, list(hier.names), names)
    elif path.endswith(".json"):
        rows = json.load(open(path))
        a = np.asarray([r[0] for r in rows], np.float32)
    else:
        a = np.load(path).astype(np.float32)
    if a.shape[0] != hier.num_nodes:
        raise ValueError(
            f"attrs rows {a.shape[0]} != hierarchy nodes {hier.num_nodes}"
        )
    norm = np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    return (a / norm).astype(np.float32)


def load_protos(path: str) -> np.ndarray:
    """Real per-class feature prototypes: ``fc-weights.json`` rows
    (``train_gcn_dense_trans.py:57-68``), a torch ResNet checkpoint's fc
    (``materials/process_resnet.py``), or a [N, D] ``.npy``."""
    if path.endswith(".json"):
        from .materials import fc_vectors_from_json

        return fc_vectors_from_json(path)
    if path.endswith((".pt", ".pth")):
        from .materials import fc_vectors_from_torch_resnet

        return fc_vectors_from_torch_resnet(path)
    p = np.load(path).astype(np.float32)
    return p / np.maximum(np.linalg.norm(p, axis=1, keepdims=True), 1e-12)


def synthetic_problem(hier, splits, feat_dim=64, attr_dim=32, seed=0):
    """Class embeddings + per-class feature prototypes with a learnable
    attr->feature relationship."""
    rng = np.random.default_rng(seed)
    n = hier.num_nodes
    attrs = rng.standard_normal((n, attr_dim)).astype(np.float32)
    attrs /= np.linalg.norm(attrs, axis=1, keepdims=True)
    W = rng.standard_normal((attr_dim, feat_dim)).astype(np.float32) / np.sqrt(attr_dim)
    protos = attrs @ W
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)
    return attrs, protos


def sample_feats(protos, cls, batch, noise, rng):
    f = protos[cls][None, :] + noise * rng.standard_normal(
        (batch, protos.shape[1])
    ).astype(np.float32)
    return f.astype(np.float32)


def evaluate_logit_model(
    logit_fn, hier, splits, protos, noise, batch, n_batches_per_class, seed=0
):
    """Grouped synthetic eval through the shared metric engine."""
    import jax.numpy as jnp

    from ..eval.metrics import accumulate, batch_metrics, summarize, zeros_metrics

    rng = np.random.default_rng(seed + 1)
    train_mask, test_mask, chains, chain_len = build_eval_tables(hier, splits)
    node_depth = hier.depth.astype(np.int32)
    total = zeros_metrics()
    for wnid in splits["rest"]:
        c = hier.name_to_id[wnid]
        for _ in range(n_batches_per_class):
            feats = sample_feats(protos, c, batch, noise, rng)
            logits = np.asarray(logit_fn(feats))
            total = accumulate(
                total,
                batch_metrics(
                    jnp.asarray(logits),
                    jnp.asarray(c),
                    jnp.asarray(chains[c]),
                    jnp.asarray(chain_len[c]),
                    jnp.asarray(node_depth),
                    jnp.asarray(train_mask),
                    jnp.asarray(test_mask),
                ),
            )
    return summarize(total)


def evaluate_real_images(
    logit_fn,
    hier,
    splits,
    grouped,
    proto_dim: int,
    image_root: str = "",
    featurizer=None,
    feature_file=None,
    batch: int = 64,
    resolution: int = 256,
    num_threads: int = 8,
    num_procs: int = 0,
):
    """Stage-B evaluation on REAL images through the shared metric engine —
    the reference's ``test_on_subset`` flow (``evaluate_imagenet.py:65-152``):
    per-batch frozen-CNN featurization (``:84``), the bias ones-column
    (``:85``), then hierarchical metrics. ``featurizer`` is a jitted
    image->feature step (features.make_featurizer); ``feature_file``
    short-circuits the CNN with precomputed per-class rows."""
    import jax.numpy as jnp

    from ..eval.metrics import accumulate, batch_metrics, summarize, zeros_metrics
    from .features import with_bias_column

    train_mask, test_mask, chains, chain_len = build_eval_tables(hier, splits)
    node_depth = jnp.asarray(hier.depth.astype(np.int32))
    train_mask = jnp.asarray(train_mask)
    test_mask = jnp.asarray(test_mask)
    total = zeros_metrics()

    def _accumulate(total, feats, c, valid=None):
        feats = with_bias_column(np.asarray(feats, np.float32), proto_dim)
        logits = jnp.asarray(logit_fn(feats))
        return accumulate(
            total,
            batch_metrics(
                logits,
                jnp.asarray(c),
                jnp.asarray(chains[c]),
                jnp.asarray(chain_len[c]),
                node_depth,
                train_mask,
                test_mask,
                valid=None if valid is None else jnp.asarray(valid),
            ),
        )

    if feature_file is not None:
        for cls in grouped:
            c = hier.name_to_id[cls]
            rows = feature_file.rows(cls)
            for lo in range(0, rows.shape[0], batch):
                total = _accumulate(total, rows[lo : lo + batch], c)
        return summarize(total)

    from ..data.pipeline import FileImageSource, GroupedTestLoader

    loader = GroupedTestLoader(
        grouped,
        {c: hier.name_to_id[c] for c in grouped},
        FileImageSource(resolution, image_root=image_root),
        batch,
        num_threads=num_threads,
        num_procs=num_procs,
    )
    try:
        for b in loader:
            feats = featurizer(jnp.asarray(b.images))
            total = _accumulate(total, feats, b.target, valid=b.valid)
    finally:
        loader.close()
    return summarize(total)


class TrainFeatureBank:
    """Real seen-class training features from a FeatureFile — the
    reference's regime, where CNZSL/FREE train on precomputed frozen-CNN
    feature matrices (``baseline/CNZSL/cnzsl.py`` feature loading,
    ``train_free.py:246-247``) rather than fabricated prototypes+noise."""

    def __init__(self, feature_file, seen_wnids):
        self.rows = []          # [n_seen] arrays [n_i, D], splits['train'] order
        for w in seen_wnids:
            self.rows.append(feature_file.rows(w))
        self.dim = self.rows[0].shape[1]

    def sample(self, seen_positions, rng) -> np.ndarray:
        """One random stored row per requested seen-class position."""
        return np.stack([
            self.rows[p][int(rng.integers(self.rows[p].shape[0]))]
            for p in seen_positions
        ])

    def all_rows(self) -> np.ndarray:
        return np.concatenate(self.rows, axis=0)


def _seen_grouped(train_manifest_path: str, seen) -> dict:
    """Seen-class slice of a train manifest ({wnid: [paths]}); SystemExit
    if it contains no images for any seen class (wrong-manifest guard), and
    a loud warning when coverage is partial — the reference asserts FULL
    seen-class alignment against its train dir (train_resnet_fit.py:43),
    so silently training on a subset would skew results undetectably."""
    manifest = json.load(open(train_manifest_path))
    grouped = {c: manifest[c] for c in seen if manifest.get(c)}
    if not sum(len(p) for p in grouped.values()):
        raise SystemExit(f"--train_manifest {train_manifest_path}: no "
                         "images for any seen class")
    if len(grouped) != len(seen):
        missing = [c for c in seen if not manifest.get(c)]
        print(f"# WARNING: --train_manifest covers {len(grouped)}/"
              f"{len(seen)} seen classes; {len(missing)} absent (first 5: "
              f"{missing[:5]}) — their frozen fc rows train on NO images",
              flush=True)
    return grouped


def _seen_train_loader(grouped_seen, seen, src, batch, seed,
                       num_threads, num_procs):
    """Seen-class grouped paths -> FlatTrainLoader whose labels index the
    ``seen`` ORDER (splits['train']) — the alignment the reference asserts
    against its train dir (train_resnet_fit.py:43) and that both the
    clip_flat prompt bank and the refit's frozen pred[seen] rows rely on."""
    from ..data.pipeline import FlatTrainLoader

    n_items = sum(len(p) for p in grouped_seen.values())
    return FlatTrainLoader(
        grouped_seen, {c: i for i, c in enumerate(seen)}, src,
        max(1, min(batch, n_items)), seed=seed,
        num_threads=num_threads, num_procs=num_procs,
    )


def _test_grouped(manifest_path: str, rest) -> dict:
    """Test-class slice of an eval manifest; SystemExit when the manifest
    shares no classes with splits['rest'] (wrong-manifest guard)."""
    test_set = set(rest)
    manifest = json.load(open(manifest_path))
    grouped = {c: p for c, p in manifest.items() if c in test_set and p}
    if not grouped:
        raise SystemExit(
            f"--manifest {manifest_path}: none of its {len(manifest)} "
            f"classes are in splits['rest'] ({len(test_set)} wnids) — "
            "wrong manifest for this split?"
        )
    return grouped


def run_cnzsl(args, hier, splits, attrs, protos, train_bank=None):
    import jax
    import jax.numpy as jnp
    import optax

    from .cnzsl import CNZSLConfig, cnzsl_init, cnzsl_logits, make_cnzsl_train_step

    proto_dim = train_bank.dim if train_bank is not None else protos.shape[1]
    cfg = CNZSLConfig(attr_dim=attrs.shape[1], proto_dim=proto_dim,
                      hid_dim=args.hid_dim)
    params, state = cnzsl_init(jax.random.PRNGKey(args.seed), cfg)
    tx = optax.adam(args.lr)
    opt = tx.init(params)
    step = make_cnzsl_train_step(cfg, tx)

    seen_ids = hier.ids(splits["train"])
    seen_attrs = jnp.asarray(attrs[seen_ids])
    rng = np.random.default_rng(args.seed)
    for i in range(args.steps):
        labels = rng.integers(0, len(seen_ids), args.batch)
        if train_bank is not None:
            feats = train_bank.sample(labels, rng)
        else:
            feats = np.stack([
                sample_feats(protos, int(seen_ids[l]), 1, args.noise, rng)[0]
                for l in labels
            ])
        params, state, opt, loss = step(
            params, state, opt, jnp.asarray(feats), seen_attrs,
            jnp.asarray(labels),
        )
        if i % max(1, args.steps // 5) == 0:
            print(f"step {i}: loss {float(loss):.3f}", flush=True)

    all_attrs = jnp.asarray(attrs)

    if args.save_path:
        # reference CNZSL saves its model after epoch 5 (cnzsl.py:366-368);
        # the ClassStandardization running stats travel with the params
        from ..utils.checkpoint import save_pytree

        save_pytree(args.save_path, {"params": params, "state": state})
        print(f"saved cnzsl params + stats -> {args.save_path}", flush=True)

    def logit_fn(feats):
        logits, _ = cnzsl_logits(
            params, state, jnp.asarray(feats), all_attrs, cfg, training=False
        )
        return logits

    return logit_fn


def run_gcn(args, hier, splits, attrs, protos):
    import jax
    import jax.numpy as jnp
    import optax

    from .gcn import (
        Adjacency,
        GCNConfig,
        basic_edges,
        dense_edges,
        gcn_apply,
        gcn_init,
        make_gcn_train_step,
    )

    n = hier.num_nodes
    if args.variant == "basic":
        adj = [Adjacency.build(basic_edges(hier), n)]
        r_adj = None
        mode, hops = "basic", 1
    else:
        groups = dense_edges(hier, max_hops=4)
        adj = [Adjacency.build(g, n) for g in groups]
        r_adj = [Adjacency.build(g, n, transpose=True) for g in groups]
        mode = "dense_att" if args.variant == "dense_att" else "dense"
        hops = len(groups)
        if mode == "dense":
            adj, r_adj = adj[:1], r_adj[:1]
    cfg = GCNConfig(n=n, in_channels=attrs.shape[1], out_channels=protos.shape[1],
                    hidden_layers=str(args.hid_dim), mode=mode, n_hops=hops)
    params = gcn_init(jax.random.PRNGKey(args.seed), cfg)
    tx = optax.adam(args.lr)
    opt = tx.init(params)
    step = make_gcn_train_step(cfg, tx, adj, r_adj)

    seen_ids = jnp.asarray(hier.ids(splits["train"]).astype(np.int64))
    fc_vectors = jnp.asarray(protos)  # already normalized
    x = jnp.asarray(attrs)
    for i in range(args.steps):
        params, opt, loss = step(params, opt, x, fc_vectors, seen_ids, None)
        if i % max(1, args.steps // 5) == 0:
            print(f"epoch {i}: loss {float(loss):.5f}", flush=True)

    pred = gcn_apply(params, cfg, x, adj, r_adj)  # [N, D] normalized

    if args.save_path:
        # the reference's per-run `.pth` + `.pred` artifact pair
        # (train_gcn_dense_att.py:13-15): trained weights AND the predicted
        # per-class classifiers — stage B (evaluate_imagenet.py /
        # train_resnet_fit.py via materials.inject_fc) consumes `pred`.
        from ..utils.checkpoint import save_pytree

        save_pytree(args.save_path, {"params": params, "pred": pred})
        print(f"saved gcn params + pred -> {args.save_path}", flush=True)

    def logit_fn(feats):
        f = jnp.asarray(feats)
        f = f / jnp.linalg.norm(f, axis=1, keepdims=True)
        return f @ pred.T

    # stage B consumers (stage-A' refit, inject_fc) read the predicted
    # classifiers off the returned scorer
    logit_fn.pred = np.asarray(pred, np.float32)
    return logit_fn


def run_free(args, hier, splits, attrs, protos, train_bank=None):
    import jax
    import jax.numpy as jnp

    from .free import (
        FREEConfig,
        free_init,
        make_free_steps,
        other_labels,
        synthesize_features,
        train_softmax_classifier,
    )

    seen_ids = hier.ids(splits["train"])
    # features live in [0,1] for the sigmoid generator: the reference
    # MinMaxScales the REAL feature matrix (classifier.py); with a real
    # training bank the scaler comes from it, else from the prototypes
    if train_bank is not None:
        allr = train_bank.all_rows()
        fmin, fmax = float(allr.min()), float(allr.max())
        res_size = train_bank.dim
    else:
        fmin, fmax = float(protos.min()), float(protos.max())
        res_size = protos.shape[1]
    span = max(fmax - fmin, 1e-12)
    protos01 = None if train_bank is not None else (protos - fmin) / span
    cfg = FREEConfig(
        res_size=res_size, att_size=attrs.shape[1],
        latent_size=attrs.shape[1], ngh=4 * res_size,
        ndh=4 * res_size, nclass_seen=len(seen_ids),
        center_margin=20.0, syn_num=args.syn_num,
    )
    params = free_init(jax.random.PRNGKey(args.seed), cfg)
    d_step, g_step, init_opts = make_free_steps(cfg)
    optD, optFR, optC, optEG = init_opts(params)
    key = jax.random.PRNGKey(args.seed + 1)
    rng = np.random.default_rng(args.seed)

    lambda1 = cfg.lambda1
    for i in range(args.steps):
        labels = rng.integers(0, len(seen_ids), args.batch)
        if train_bank is not None:
            feats = np.clip(
                (train_bank.sample(labels, rng) - fmin) / span, 0, 1
            ).astype(np.float32)
        else:
            feats = np.stack([
                np.clip(
                    protos01[seen_ids[l]]
                    + args.noise * rng.standard_normal(res_size),
                    0, 1,
                )
                for l in labels
            ]).astype(np.float32)
        att = jnp.asarray(attrs[seen_ids[labels]])
        featj = jnp.asarray(feats)
        labj = jnp.asarray(labels)
        gp_sum = 0.0
        for _ in range(cfg.critic_iter):
            key, k1, k2 = jax.random.split(key, 3)
            ol = other_labels(k1, labj, len(seen_ids))
            params, optD, optFR, optC, d_cost, wass, gp = d_step(
                params, optD, optFR, optC, featj, att, labj, ol,
                jnp.asarray(lambda1), k2,
            )
            gp_sum += float(gp) * lambda1 * cfg.gammaD
        # adaptive GP weight (reference train_free.py:330-334)
        gp_sum /= cfg.gammaD * lambda1 * cfg.critic_iter
        if gp_sum > 1.05:
            lambda1 *= 1.1
        elif gp_sum < 1.001:
            lambda1 /= 1.1
        key, k3 = jax.random.split(key)
        params, optEG, g_loss = g_step(params, optEG, featj, att, k3)
        if i % max(1, args.steps // 5) == 0:
            print(f"step {i}: D {float(d_cost):.3f} G {float(g_loss):.3f} "
                  f"lambda1 {lambda1:.2f}", flush=True)

    # synthesize features for ALL classes, train a softmax over the full set
    key, ks, kc = jax.random.split(key, 3)
    syn, syn_labels = synthesize_features(
        params, cfg, jnp.asarray(attrs), args.syn_num, ks
    )
    clf = train_softmax_classifier(
        kc, syn, syn_labels, hier.num_nodes, lr=args.lr, epochs=3,
        batch=min(512, syn.shape[0]),
    )

    if args.save_path:
        # reference FREE saves netG/netFR per epoch (train_free.py:415-416);
        # here the full E/G/D/FR params plus the trained final classifier
        from ..utils.checkpoint import save_pytree

        save_pytree(args.save_path, {"params": params, "classifier": clf})
        print(f"saved free params + classifier -> {args.save_path}", flush=True)

    def logit_fn(feats):
        # evaluation features go through the same 0-1 mapping as training
        f01 = np.clip((feats - fmin) / span, 0, 1)
        return jnp.asarray(f01) @ clf["w"] + clf["b"]

    return logit_fn


def main(argv=None):
    ap = argparse.ArgumentParser("hgr_tpu baselines")
    ap.add_argument("--baseline", required=True,
                    choices=["cnzsl", "gcn", "free", "clip_flat"])
    ap.add_argument("--variant", default="dense_att",
                    choices=["basic", "dense", "dense_att"])
    ap.add_argument("--synthetic", type=lambda s: s.lower() == "true",
                    default=True)
    ap.add_argument("--graph_path", default="")
    ap.add_argument("--split_path", default="")
    ap.add_argument("--attrs_path", default="", help=(
        "class embeddings: text_feats.json (Tr), glove:<vectors.txt> (w2v), "
        "or .npy; default synthetic"))
    ap.add_argument("--protos_path", default="", help=(
        "class prototypes: fc-weights.json, torch resnet .pt/.pth, or .npy; "
        "default derived from attrs"))
    ap.add_argument("--names_path", default="", help="wnid->name json for glove:")
    ap.add_argument("--save_path", default="", help=(
        "save trained baseline artifacts (orbax pytree): gcn -> params + "
        "predicted classifiers (the reference's .pth/.pred pair), cnzsl -> "
        "params + standardization stats, free -> params + classifier"))
    ap.add_argument("--tr_concat", action="store_true", help=(
        "apply the reference's Tr preprocessing cat((f,f,ones)) + normalize "
        "(train_gcn_dense_trans.py:70-77)"))
    ap.add_argument("--consider_trains", type=lambda s: s.lower() == "true",
                    default=True, help=(
                        "False = the DGP scripts' ZSL protocol: suppress "
                        "seen-class logits to 1e-7 (materials.suppress_seen)"))
    ap.add_argument("--image_root", default="", help=(
        "evaluate on REAL images: root of the on-disk image tree; requires "
        "--manifest + --cnn (the reference's evaluate_imagenet.py flow)"))
    ap.add_argument("--manifest", default="", help=(
        "grouped eval manifest json: wnid -> [relative image paths] "
        "(the {split}_split.json format); classes outside splits['rest'] "
        "are ignored"))
    ap.add_argument("--cnn", default="", help=(
        "frozen feature backbone: torch ResNet-50 checkpoint (.pt/.pth, the "
        "reference's --cnn) or an orbax pytree dir (features.load_backbone)"))
    ap.add_argument("--feature_file", default="", help=(
        "precomputed per-class eval features (.npz wnid -> [n_i, D]; "
        "producer tools/export_image_feats.py) — skips the CNN"))
    ap.add_argument("--train_feature_file", default="", help=(
        "precomputed SEEN-class features for cnzsl/free TRAINING (same .npz "
        "format) — the reference regime, where both train on real frozen-CNN "
        "feature matrices; requires real eval inputs too"))
    ap.add_argument("--train_manifest", default="", help=(
        "SEEN-class training manifest json: wnid -> [relative image paths] "
        "(the {split}_split.json format); consumed by --refit_backbone and "
        "by clip_flat real-image training"))
    ap.add_argument("--refit_backbone", action="store_true", help=(
        "DGP stage-A': after GCN stage A, retrain the ResNet-50 base under "
        "the frozen predicted classifier on real seen-class images "
        "(train_resnet_fit.py); needs --cnn + --image_root + "
        "--train_manifest, and stage-B eval then featurizes with the "
        "refit backbone"))
    ap.add_argument("--refit_steps", type=int, default=100)
    ap.add_argument("--refit_lr", type=float, default=1e-4,
                    help="reference SGD lr (train_resnet_fit.py:57)")
    ap.add_argument("--refit_batch", type=int, default=64,
                    help="reference refit batch (train_resnet_fit.py:40)")
    ap.add_argument("--eval_resolution", type=int, default=256, help=(
        "loader resolution for real-image eval (short-side resize + center "
        "crop); the featurizer center-crops --eval_crop out of it"))
    ap.add_argument("--eval_crop", type=int, default=224)
    ap.add_argument("--num_threads", type=int, default=8)
    ap.add_argument("--num_procs", type=int, default=0)
    ap.add_argument("--feat_dim", type=int, default=64)
    ap.add_argument("--attr_dim", type=int, default=32)
    ap.add_argument("--hid_dim", type=int, default=128)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--eval_batch", type=int, default=16)
    ap.add_argument("--eval_batches_per_class", type=int, default=1)
    ap.add_argument("--noise", type=float, default=0.15)
    ap.add_argument("--syn_num", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arch", default="TEST-RN")
    args = ap.parse_args(argv)

    from ..hierarchy import Hierarchy, synthetic_hierarchy

    if args.synthetic or not args.graph_path:
        hier = synthetic_hierarchy(3, 4, 5, args.seed)
        rng = np.random.default_rng(args.seed)
        names = list(hier.names)
        perm = rng.permutation(len(names))
        n_train = len(names) * 2 // 3
        splits = {
            "train": [names[i] for i in sorted(perm[:n_train])],
            "rest": [names[i] for i in sorted(perm[n_train:])],
        }
        splits["all"] = splits["train"] + splits["rest"]
    else:
        hier = Hierarchy.from_json(args.graph_path)
        splits = json.load(open(args.split_path))

    if args.refit_backbone and args.baseline != "gcn":
        # checked BEFORE the clip_flat dispatch: every baseline must refuse
        # the flag loudly rather than silently skip the refit
        raise SystemExit("--refit_backbone is the DGP stage-A' flow "
                         "(--baseline gcn)")
    if args.baseline == "clip_flat":
        return run_clip_flat(args, hier, splits)

    attrs = (
        load_attrs(args.attrs_path, hier, args.names_path)
        if args.attrs_path else None
    )
    protos = load_protos(args.protos_path) if args.protos_path else None
    if protos is not None and protos.shape[0] != hier.num_nodes:
        raise ValueError(
            f"protos rows {protos.shape[0]} != hierarchy nodes {hier.num_nodes}"
        )
    if attrs is None and protos is None:
        attrs, protos = synthetic_problem(
            hier, splits, args.feat_dim, args.attr_dim, args.seed
        )
    elif protos is None:
        # real embeddings, no real prototypes: derive learnable prototypes
        # from the real embeddings (same linear-map construction as the
        # synthetic problem, but anchored to the provided attrs)
        rng = np.random.default_rng(args.seed)
        w = rng.standard_normal((attrs.shape[1], args.feat_dim)).astype(
            np.float32
        ) / np.sqrt(attrs.shape[1])
        protos = attrs @ w
        protos /= np.maximum(np.linalg.norm(protos, axis=1, keepdims=True), 1e-12)
    elif attrs is None:
        attrs, _ = synthetic_problem(
            hier, splits, args.feat_dim, args.attr_dim, args.seed
        )
    if args.tr_concat:
        from .materials import tr_word_vectors

        attrs = tr_word_vectors(attrs)
    train_bank = None
    if args.train_feature_file:
        if args.baseline not in ("cnzsl", "free"):
            raise SystemExit("--train_feature_file applies to cnzsl/free "
                             "(gcn regresses to prototypes, not features)")
        if not (args.image_root or args.feature_file):
            raise SystemExit("--train_feature_file trains in the real "
                             "feature space; evaluation needs real inputs "
                             "too (--image_root/--feature_file)")
        from .features import FeatureFile

        train_bank = TrainFeatureBank(
            FeatureFile(args.train_feature_file), splits["train"]
        )
    # cross-flag contracts + manifest sanity validated BEFORE the expensive
    # stage-A/baseline training: a flag or wrong-manifest mistake must fail
    # in seconds, not after hours of TPU work
    refit_grouped_seen = None
    if args.refit_backbone:
        if not (args.cnn and args.image_root and args.train_manifest):
            raise SystemExit("--refit_backbone needs --cnn + --image_root "
                             "+ --train_manifest (seen-class images)")
        if args.feature_file:
            raise SystemExit("--feature_file holds features from the "
                             "UN-refit backbone; --refit_backbone evaluates "
                             "through the refit CNN (drop --feature_file)")
        if args.refit_steps < 1:
            raise SystemExit(f"--refit_steps {args.refit_steps}: must be "
                             ">= 1 (drop --refit_backbone to skip stage-A')")
        refit_grouped_seen = _seen_grouped(args.train_manifest,
                                           splits["train"])
    eval_grouped = None
    if args.image_root or args.feature_file:
        # real-image stage-B evaluation (evaluate_imagenet.py:65-152)
        if not args.manifest:
            raise SystemExit("--image_root/--feature_file requires --manifest")
        if not (args.feature_file or args.cnn):
            raise SystemExit("--image_root requires --cnn (or use "
                             "--feature_file)")
        eval_grouped = _test_grouped(args.manifest, splits["rest"])

    runner = {"cnzsl": run_cnzsl, "gcn": run_gcn, "free": run_free}[args.baseline]
    if args.baseline in ("cnzsl", "free"):
        logit_fn = runner(args, hier, splits, attrs, protos,
                          train_bank=train_bank)
    else:
        logit_fn = runner(args, hier, splits, attrs, protos)

    refit_params = None
    if args.refit_backbone:
        # DGP stage-A' (train_resnet_fit.py:43-101): base retrains under
        # the frozen GCN-predicted fc; stage-B eval must then featurize
        # with the REFIT backbone, so on-the-fly --cnn featurization only
        from ..data.pipeline import FileImageSource
        from .features import load_backbone
        from .refit import refit_backbone

        seen = splits["train"]
        # labels index rows of pred[seen] — the alignment the reference
        # asserts against its train dir (train_resnet_fit.py:43)
        pred_seen = logit_fn.pred[hier.ids(seen)]
        loader = _seen_train_loader(
            refit_grouped_seen, seen,
            FileImageSource(args.eval_resolution, image_root=args.image_root),
            args.refit_batch, args.seed, args.num_threads, args.num_procs,
        )
        try:
            refit_params, trlog = refit_backbone(
                load_backbone(args.cnn), pred_seen, loader,
                steps=args.refit_steps, lr=args.refit_lr,
                crop=args.eval_crop, seed=args.seed,
                log_every=max(1, args.refit_steps // 5),
            )
        finally:
            loader.close()
        print(f"refit done: loss {trlog['loss'][-1]:.4f} "
              f"acc {trlog['acc'][-1]:.4f}", flush=True)
        if args.save_path:
            # the reference's per-epoch resnet_base checkpoints + trlog
            # history (train_resnet_fit.py:94-100), one artifact here
            from ..utils.checkpoint import save_pytree

            save_pytree(args.save_path + "_refit",
                        {"params": refit_params, "trlog": trlog})
            print(f"saved refit backbone + trlog -> "
                  f"{args.save_path}_refit", flush=True)

    if not args.consider_trains:
        # the DGP scripts' ZSL protocol (their default): seen-class columns
        # suppressed to a REACHABLE 1e-7, not excluded (evaluate_21kp.py:
        # 93-95) — affects every metric downstream, so wrap the logit fn
        from .materials import suppress_seen

        seen_mask = np.zeros(hier.num_nodes, bool)
        seen_mask[hier.ids(splits["train"])] = True
        base_fn = logit_fn

        def logit_fn(feats):  # noqa: F811 — deliberate wrap
            return suppress_seen(base_fn(feats), seen_mask)

    if eval_grouped is not None:
        # real-image stage-B evaluation (evaluate_imagenet.py:65-152);
        # flags + manifest already validated before training
        from .features import FeatureFile, load_backbone, make_featurizer

        grouped = eval_grouped
        featurizer = feature_file = None
        if args.feature_file:
            feature_file = FeatureFile(args.feature_file)
        else:
            # --cnn presence validated before training
            featurizer = make_featurizer(
                refit_params if refit_params is not None
                else load_backbone(args.cnn),
                crop=args.eval_crop,
            )
        # the bias ones-column decision keys off the LOGIT model's input
        # width: GCN classifiers live in proto space (possibly D+1, DGP's
        # 2049), cnzsl/free trained on a real bank take its raw feature dim
        logit_dim = train_bank.dim if train_bank is not None else protos.shape[1]
        feat_dim = feature_file.dim if feature_file is not None else 2048
        if logit_dim not in (feat_dim, feat_dim + 1):
            raise SystemExit(
                f"real-image eval produces {feat_dim}-d features but the "
                f"{args.baseline} model expects {logit_dim}-d inputs — "
                "train in the real feature space (--protos_path from a real "
                "backbone for gcn; --train_feature_file for cnzsl/free)"
            )
        summary = evaluate_real_images(
            logit_fn, hier, splits, grouped, proto_dim=logit_dim,
            image_root=args.image_root, featurizer=featurizer,
            feature_file=feature_file, batch=args.eval_batch,
            resolution=args.eval_resolution, num_threads=args.num_threads,
            num_procs=args.num_procs,
        )
    else:
        summary = evaluate_logit_model(
            logit_fn, hier, splits, protos, args.noise, args.eval_batch,
            args.eval_batches_per_class, args.seed,
        )
    from ..utils.logging import format_report

    print(format_report(summary), flush=True)
    print(json.dumps({"baseline": args.baseline, **summary}), flush=True)
    return summary


def run_clip_flat(args, hier, splits):
    """CLIP flat fine-tune + shared eval.

    Synthetic images by default; with real inputs (``--image_root`` +
    ``--train_manifest`` + ``--manifest``) it trains on real seen-class
    batches and evaluates on real test images through the standard loaders
    — the reference's flow, which trains AND evaluates CLIP-flat on real
    batches (``baseline/CLIP/clip_train.py:205-223`` train, ``:89-203``
    eval). A partial real-input set is refused loudly rather than silently
    downgraded to synthetic (VERDICT r4 weak #5).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ..config import Config
    from ..tree_model import TreeModel
    from .clip_flat import make_flat_train_step

    real = bool(args.image_root or args.manifest or args.train_manifest)
    if real and not (args.image_root and args.manifest
                     and args.train_manifest):
        raise SystemExit(
            "clip_flat real-image mode needs ALL of --image_root, "
            "--manifest (test classes) and --train_manifest (seen "
            "classes); got a partial set — refusing to silently train on "
            "synthetic images")
    if args.feature_file or args.train_feature_file:
        raise SystemExit("clip_flat featurizes with its own CLIP encoders; "
                         "--feature_file/--train_feature_file do not apply")

    cfg = Config(arch=args.arch, dtype="float32")
    tm = TreeModel.build(cfg, hier, candidates_train=splits["all"],
                         candidates_test=splits["rest"], pad_multiple=64,
                         seed=args.seed)
    tm.init_params(args.seed)
    seen = splits["train"]
    seen_ids = hier.ids(seen)
    seen_tokens = jnp.asarray(tm.node_tokens[seen_ids])
    params = {"clip": tm.params}
    tx = optax.adamw(args.lr)
    opt = tx.init(params)
    step = make_flat_train_step(tm.clip_cfg, tx, dtype=jnp.float32)
    rng = np.random.default_rng(args.seed)
    res = tm.clip_cfg.image_resolution

    src = train_loader = None
    if real:
        from ..data.pipeline import FileImageSource

        src = FileImageSource(res, image_root=args.image_root)
        # labels index rows of the seen prompt bank (splits['train'] order)
        train_loader = _seen_train_loader(
            _seen_grouped(args.train_manifest, seen), seen, src,
            args.batch, args.seed, args.num_threads, args.num_procs,
        )
        batches = iter(train_loader)

    try:
        epoch = 0
        for i in range(args.steps):
            if real:
                try:
                    images, labels, _valid = next(batches)
                except StopIteration:
                    epoch += 1
                    train_loader.set_epoch(epoch)
                    batches = iter(train_loader)
                    images, labels, _valid = next(batches)
            else:
                labels = rng.integers(0, len(seen_ids), args.batch)
                images = rng.standard_normal(
                    (args.batch, res, res, 3)
                ).astype(np.float32)
            params, opt, loss = step(
                params, opt, jnp.asarray(images), seen_tokens,
                jnp.asarray(labels),
            )
            if i % max(1, args.steps // 5) == 0:
                print(f"step {i}: loss {float(loss):.3f}", flush=True)
    finally:
        if train_loader is not None:
            train_loader.close()
    tm.params = params["clip"]

    from ..eval.metrics import accumulate, summarize, zeros_metrics

    bank = tm.update_classifier()
    bank_s = tm.sort_bank(bank)
    total = zeros_metrics()
    if real:
        from ..data.pipeline import GroupedTestLoader

        grouped = _test_grouped(args.manifest, splits["rest"])
        loader = GroupedTestLoader(
            grouped, {c: hier.name_to_id[c] for c in grouped}, src,
            args.eval_batch, num_threads=args.num_threads,
            num_procs=args.num_procs,
        )
        try:
            for b in loader:
                total = accumulate(
                    total,
                    tm.eval_step_sorted(
                        tm.params, bank_s, jnp.asarray(b.images), b.target,
                        valid=jnp.asarray(b.valid),
                    ),
                )
        finally:
            loader.close()
    else:
        for wnid in splits["rest"]:
            c = hier.name_to_id[wnid]
            images = jnp.asarray(
                rng.standard_normal((args.eval_batch, res, res, 3)),
                jnp.float32,
            )
            total = accumulate(
                total, tm.eval_step_sorted(tm.params, bank_s, images, c)
            )
    summary = summarize(total)
    from ..utils.logging import format_report

    print(format_report(summary), flush=True)
    print(json.dumps({"baseline": "clip_flat", **summary}), flush=True)
    return summary


if __name__ == "__main__":
    main()
