#!/usr/bin/env python
"""Export per-class CLIP text features (`text_feats.json`).

The reference's baselines consume ``text_feats.json`` / ``attr.json`` (CLIP
text features per class) but ship NO producer script (SURVEY §2.4, consumers
at ``baseline/DGP/train_gcn_basic_tran.py:50``, ``baseline/FREE/
train_free.py:242``, ``baseline/CNZSL/cnzsl.py:183``). This tool is that
missing producer: it encodes every node's prompt through the (converted or
randomly-initialized) CLIP text encoder and writes one feature vector per
class, in hierarchy node order.

Usage:
  python tools/export_text_feats.py --graph_path ... --arch RN50 \
      [--ckpt path/to/openai.pt] [--names_path names.json] \
      [--out text_feats.json] [--synthetic]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph_path", default="")
    ap.add_argument("--arch", default="RN50")
    ap.add_argument("--ckpt", default="", help="torch CLIP checkpoint to convert")
    ap.add_argument("--names_path", default="")
    ap.add_argument("--template", default="TEMPLATES_SIMPLE")
    ap.add_argument("--vocab_path", default="")
    ap.add_argument("--out", default="text_feats.json")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--chunk", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hgr_tpu.config import Config
    from hgr_tpu.hierarchy import Hierarchy, synthetic_hierarchy
    from hgr_tpu.tree_model import TreeModel

    if args.synthetic or not args.graph_path:
        hier = synthetic_hierarchy(3, 4, 5, 0)
    else:
        hier = Hierarchy.from_json(args.graph_path)

    config = Config(arch=args.arch, template=args.template,
                    vocab_path=args.vocab_path)
    tokenizer = None
    names = None
    if not args.synthetic:
        try:
            from hgr_tpu.text import Tokenizer

            tokenizer = Tokenizer(args.vocab_path or None)
        except FileNotFoundError:
            pass
        if args.names_path and os.path.exists(args.names_path):
            names = json.load(open(args.names_path))

    tm = TreeModel.build(config, hier, tokenizer=tokenizer, names=names,
                         pad_multiple=args.chunk)
    if args.ckpt:
        tm.load_torch(args.ckpt)
    else:
        tm.init_params(0)

    bank = tm.update_classifier()
    feats = np.asarray(bank[: hier.num_nodes], np.float32)
    with open(args.out, "w") as f:
        json.dump([[row.tolist()] for row in feats], f)
    print(f"wrote {feats.shape} features for {hier.num_nodes} classes -> {args.out}")


if __name__ == "__main__":
    main()
