"""TreeModel — the flagship hierarchy-aware CLIP model bundle.

Functional counterpart of the reference's ``tree_model``
(``model/clip_tree.py:19-333``): owns the CLIP config + the hierarchy tables
(as padded device arrays) + the tokenized per-node prompts, and exposes pure
jitted functions for the classifier bank, eval forward, and metric steps.
Parameters live OUTSIDE the object as a pytree (``self.params`` is just a
convenience slot), so every step function is jit/pjit-friendly.

Node prompts: WordNet synset head-name into the configured template bank's
first entry — the reference hard-codes ``TEMPLATES_SIMPLE[0]`` and ignores its
``--template`` flag (``model/clip_tree.py:52`` vs ``main.py:27``); here the
flag is honoured and defaults to the same simple template. Names come from a
wnid->name JSON (exported offline via ``tools/export_wordnet_names.py`` when
NLTK WordNet is available) with the wnid itself as fallback.

The adaptive per-depth loss weight (``layer_weight``) is a real trainable
leaf here. In the reference, ``nn.Parameter(weights)*scale`` creates a
non-leaf tensor that never receives gradients and is invisible to
``named_parameters`` (``model/clip_tree.py:74``), so the separate SGD
(``main.py:248-249``) silently never updates it; this rebuild fixes that
while keeping the init ``1/|layer d| * scale``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .eval.bank import bank_logits, build_bank, pad_to, pad_tokens
from .eval.metrics import BatchMetrics, batch_metrics
from .hierarchy import Hierarchy
from .models import clip as clip_mod
from .models.clip import CLIPConfig, clip_init, encode_image, encode_text
from .text import Tokenizer, get_bank

PAD = -1


def node_prompts(
    hier: Hierarchy,
    template: str,
    names: Optional[Dict[str, str]] = None,
) -> list[str]:
    """Per-node prompt strings (reference ``model/clip_tree.py:52-60``)."""
    tpl = get_bank(template)[0]
    out = []
    for wnid in hier.names:
        name = (names or {}).get(wnid, wnid)
        out.append(tpl.format(name))
    return out


def synthetic_tokens(
    n: int, context_length: int, vocab_size: int, seed: int = 0,
    max_body: int = 18,
) -> np.ndarray:
    """Deterministic pseudo-prompts for synthetic benchmarks/tests (no BPE
    vocab asset needed): SOT + 4..max_body class-specific ids + EOT. Varied
    lengths mirror real "a photo of a {}." prompts (10-20 BPE tokens), so the
    token-bank truncation in :meth:`TreeModel.build` behaves realistically."""
    rng = np.random.default_rng(seed)
    max_body = min(max_body, context_length - 3)
    toks = np.zeros((n, context_length), np.int32)
    toks[:, 0] = vocab_size - 2
    lens = rng.integers(4, max_body + 1, size=n)
    body = rng.integers(1, vocab_size - 2, size=(n, max_body))
    cols = np.arange(max_body)[None, :]
    toks[:, 1 : 1 + max_body] = np.where(cols < lens[:, None], body, 0)
    toks[np.arange(n), 1 + lens] = vocab_size - 1
    return toks


@dataclass
class TreeModel:
    config: Config
    clip_cfg: CLIPConfig
    hier: Hierarchy
    n_pad: int
    node_tokens: np.ndarray      # [N_pad, T] int32
    node_depth: np.ndarray       # [N_pad] int32, PAD rows = -1
    chains: np.ndarray           # [N, Lmax] chain_with_self, PAD-filled
    chain_len: np.ndarray        # [N] int32
    train_index: np.ndarray      # ids of candidate classes (reference 'all')
    test_index: np.ndarray       # ids of unseen classes (reference 'rest')
    train_mask: np.ndarray       # [N_pad] bool
    test_mask: np.ndarray        # [N_pad] bool
    params: Any = None           # CLIP param pytree (+ logit_scale)
    layer_weight: Any = None     # [n_levels] adaptive per-depth weight
    name_token_ids: Any = None   # per-node class-name BPE ids (CoOp prompts)
    # depth-sorted fast-path tables (see ops/bank_topk.level_argmax_sorted):
    depth_order: np.ndarray = None    # [N_pad] sorted-pos -> global node id
    level_offsets: Tuple[int, ...] = None  # start offset of each depth (+ end)

    # ---- construction ----------------------------------------------------
    @classmethod
    def build(
        cls,
        config: Config,
        hier: Hierarchy,
        candidates_train: Optional[list[str]] = None,
        candidates_test: Optional[list[str]] = None,
        tokenizer: Optional[Tokenizer] = None,
        names: Optional[Dict[str, str]] = None,
        pad_multiple: int = 1024,
        seed: int = 0,
    ) -> "TreeModel":
        clip_cfg = clip_mod.get_config(config.arch)
        n = hier.num_nodes
        n_pad = pad_to(n, pad_multiple)

        if tokenizer is not None:
            prompts = node_prompts(hier, config.template, names)
            tokens = tokenizer.tokenize(prompts, clip_cfg.context_length)
            name_token_ids = [
                tokenizer.encode(((names or {}).get(w, w)) + ".")
                for w in hier.names
            ]
        else:
            tokens = synthetic_tokens(
                n, clip_cfg.context_length, clip_cfg.vocab_size, seed
            )
            # synthetic "names": the body ids between SOT and EOT
            name_token_ids = [
                list(map(int, tokens[i, 1 : int(tokens[i].argmax())]))
                for i in range(n)
            ]
        tokens = pad_tokens(tokens, n_pad)

        # EXACT token-bank truncation: with a causal mask and EOT pooling,
        # positions past a prompt's EOT can never influence its feature
        # (verified bit-exact in fp32; tests/test_tokenizer.py). CLIP prompts
        # are short ("a photo of a {}." ~ 10-20 BPE tokens), so dropping the
        # all-padding tail of the 77-token context cuts the dominant
        # text-encode cost of OM training and bank building by 2-4.6x
        # (measured on-chip: 1280-prompt fwd+bwd 344ms @ T=77 -> 176ms @ 32
        # -> 75ms @ 16). Rounded up to a lane-friendly multiple of 16.
        eot_pos = tokens.argmax(axis=1)
        t_need = int(eot_pos.max()) + 1
        t_trunc = min(clip_cfg.context_length, max(16, ((t_need + 15) // 16) * 16))
        tokens = np.ascontiguousarray(tokens[:, :t_trunc])

        depth = np.full(n_pad, PAD, np.int32)
        depth[:n] = hier.depth

        lmax = hier.max_chain + 1
        chains = np.full((n, lmax), PAD, np.int32)
        chain_len = np.zeros(n, np.int32)
        for i in range(n):
            c = hier.chain_with_self(i)
            chains[i, : len(c)] = c
            chain_len[i] = len(c)

        train_ids = (
            hier.ids(candidates_train) if candidates_train is not None
            else np.arange(n, dtype=np.int32)
        )
        test_ids = (
            hier.ids(candidates_test) if candidates_test is not None
            else np.arange(n, dtype=np.int32)
        )
        train_mask = np.zeros(n_pad, bool)
        train_mask[train_ids] = True
        test_mask = np.zeros(n_pad, bool)
        test_mask[test_ids] = True

        n_levels = hier.max_depth + 1
        level_sizes = hier.level_sizes.astype(np.float32)
        layer_weight = (1.0 / level_sizes) * config.scale  # clip_tree.py:70-74

        # depth-sorted permutation: classes grouped by depth (stable, so the
        # within-depth order keeps global-id order => argmax ties match the
        # unsorted path), pads last
        sort_key = np.where(depth < 0, np.iinfo(np.int32).max, depth)
        depth_order = np.argsort(sort_key, kind="stable").astype(np.int32)
        counts = [int((hier.depth == d).sum()) for d in range(n_levels)]
        offsets = [0]
        for c in counts:
            offsets.append(offsets[-1] + c)

        return cls(
            config=config,
            clip_cfg=clip_cfg,
            hier=hier,
            n_pad=n_pad,
            node_tokens=tokens,
            node_depth=depth,
            chains=chains,
            chain_len=chain_len,
            train_index=train_ids,
            test_index=test_ids,
            train_mask=train_mask,
            test_mask=test_mask,
            layer_weight=jnp.asarray(layer_weight, jnp.float32),
            name_token_ids=name_token_ids,
            depth_order=depth_order,
            level_offsets=tuple(offsets),
        )

    # ---- params ----------------------------------------------------------
    def init_params(self, seed: int = 0):
        self.params = clip_init(jax.random.PRNGKey(seed), self.clip_cfg)
        return self.params

    def load_torch(self, path: str):
        from .models.convert import load_torch_checkpoint

        cfg, params = load_torch_checkpoint(path)
        self.clip_cfg = cfg
        self.params = params
        return params

    # ---- jitted compute --------------------------------------------------
    @property
    def dtype(self):
        return jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32

    @property
    def attn_fn(self):
        """Fused-attention kernel when explicitly enabled (ops/attention.py).

        Off by default: at CLIP's 50-77-token sequences XLA's batched GEMM
        attention is faster than per-(batch, head) pallas programs (measured
        ~1.5-1.8x on v5e); the kernel is kept for long-sequence variants."""
        if getattr(self.config, "pallas_attention", False) and (
            jax.default_backend() != "cpu"
        ):
            from .ops.attention import pallas_attention

            return pallas_attention
        return None

    def encode_image_fn(self, params, images):
        return encode_image(
            params, self.clip_cfg, images, dtype=self.dtype, attn_fn=self.attn_fn
        )

    def encode_text_fn(self, params, tokens):
        return encode_text(
            params, self.clip_cfg, tokens, dtype=self.dtype, attn_fn=self.attn_fn
        )

    @functools.cached_property
    def _update_classifier(self) -> Callable:
        def fn(params, tokens):
            return build_bank(
                params,
                tokens,
                self.encode_text_fn,
                chunk=min(512, self.n_pad),
                out_dtype=self.dtype,
            )

        return jax.jit(fn)

    def update_classifier(self, params=None) -> jnp.ndarray:
        """Encode all node prompts -> normalized [N_pad, D] bank
        (reference ``update_classifier``, ``model/clip_tree.py:318-325``)."""
        params = self.params if params is None else params
        return self._update_classifier(params, jnp.asarray(self.node_tokens))

    @functools.cached_property
    def _forward(self) -> Callable:
        def fn(params, bank, images):
            feats = self.encode_image_fn(params, images)
            return bank_logits(feats, bank)

        return jax.jit(fn)

    def forward(self, params, bank, images) -> jnp.ndarray:
        """Raw cosine logits [B, N_pad] (reference ``forward``,
        ``model/clip_tree.py:328-332``)."""
        return self._forward(params, bank, images)

    @functools.cached_property
    def _eval_step(self) -> Callable:
        node_depth = jnp.asarray(self.node_depth)
        train_mask = jnp.asarray(self.train_mask)
        test_mask = jnp.asarray(self.test_mask)

        def fn(params, bank, images, target, chain, chain_len, valid):
            feats = self.encode_image_fn(params, images)
            logits = bank_logits(feats, bank)
            return batch_metrics(
                logits,
                target,
                chain,
                chain_len,
                node_depth,
                train_mask,
                test_mask,
                valid=valid,
            )

        return jax.jit(fn)

    # ---- CoOp variant ----------------------------------------------------
    def coop_setup(self, seed: int = 0):
        """Build the CoOp prompt-learner state: static prompt layout padded
        to n_pad + trainable ctx (see models/coop.py)."""
        from .models.coop import build_coop_static, coop_ctx_init

        cfg = self.clip_cfg
        ids = list(self.name_token_ids)
        ids += [[0]] * (self.n_pad - len(ids))  # pad rows
        static = build_coop_static(
            ids,
            cfg.context_length,
            sot_id=cfg.vocab_size - 2,
            eot_id=cfg.vocab_size - 1,
            n_ctx=self.config.n_ctx,
            position=self.config.class_token_position,
        )
        ctx = coop_ctx_init(
            jax.random.PRNGKey(seed), self.config.n_ctx, cfg.transformer_width
        )
        return static, ctx

    def coop_text_fn(self, static, remat: bool = None):
        from .models.coop import make_coop_text_fn

        if remat is None:
            remat = getattr(self.config, "remat", False)
        return make_coop_text_fn(static, self.clip_cfg, dtype=self.dtype,
                                 remat=remat)

    def eval_step(
        self, params, bank, images, target: int, valid=None
    ) -> BatchMetrics:
        """Full eval step for one single-class batch (unsorted bank)."""
        if valid is None:
            valid = jnp.ones(images.shape[0], bool)
        chain = jnp.asarray(self.chains[target])
        clen = jnp.asarray(self.chain_len[target])
        return self._eval_step(
            params, bank, images, jnp.asarray(target), chain, clen, valid
        )

    # ---- depth-sorted fast path (see ops/bank_topk.level_argmax_sorted) ---
    @functools.cached_property
    def _eval_step_sorted(self) -> Callable:
        from .eval.metrics import metrics_from_preds
        from .ops.bank_topk import level_argmax_sorted

        order = jnp.asarray(self.depth_order)
        train_np = self.train_mask[self.depth_order]
        train_s = jnp.asarray(train_np)
        test_s = jnp.asarray(self.test_mask[self.depth_order])
        offsets = self.level_offsets
        # per level: does a train node OUTSIDE the level exist? (the
        # reference's -1 fill competitor, main.py:169-171); TOR slot False
        total_train = int(train_np.sum())
        fill_outside = jnp.asarray(
            [
                total_train - int(train_np[offsets[d]: offsets[d + 1]].sum()) > 0
                for d in range(len(offsets) - 1)
            ]
            + [False]
        )

        def fn(params, bank_sorted, images, target, chain, chain_len,
               chain_levels, valid):
            feats = self.encode_image_fn(params, images)
            logits_s = bank_logits(feats, bank_sorted)
            preds_s, vals = level_argmax_sorted(logits_s, offsets, train_s)
            preds_global = order[preds_s]
            return metrics_from_preds(
                preds_global, logits_s, order, target, chain, chain_len,
                chain_levels, test_s, valid=valid,
                lvl_vals=vals, fill_outside=fill_outside,
            )

        return jax.jit(fn)

    def sort_bank(self, bank: jnp.ndarray) -> jnp.ndarray:
        """Permute a [N_pad, D] bank into depth-sorted class order (once per
        bank refresh, outside the per-batch step)."""
        return bank[jnp.asarray(self.depth_order)]

    def eval_step_sorted(
        self, params, bank_sorted, images, target: int, valid=None
    ) -> BatchMetrics:
        """Fast-path eval step; ``bank_sorted`` from :meth:`sort_bank`.
        Identical results to :meth:`eval_step`, one logits pass for all the
        per-level constrained argmaxes instead of one pass per level."""
        if valid is None:
            valid = jnp.ones(images.shape[0], bool)
        chain_np = self.chains[target]
        levels = np.where(
            chain_np >= 0, self.hier.depth[np.maximum(chain_np, 0)], 0
        )
        return self._eval_step_sorted(
            params, bank_sorted, images, jnp.asarray(target),
            jnp.asarray(chain_np), jnp.asarray(self.chain_len[target]),
            jnp.asarray(levels.astype(np.int32)), valid,
        )
