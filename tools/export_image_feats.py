#!/usr/bin/env python
"""Export per-class frozen-CNN image features (``features.npz``).

The reference re-featurizes every eval batch through the frozen ResNet-50 on
every run (``baseline/DGP/evaluate_imagenet.py:84``) and its CNZSL/FREE
stages consume precomputed per-class feature matrices with no shipped
producer. This tool featurizes a grouped manifest ONCE — uint8 loader ->
center-crop -> ImageNet-normalize -> ResNet-50 (bf16 on the MXU) — and
writes an ``.npz`` of wnid -> [n_i, 2048] rows that
``baselines/run.py --feature_file`` and the CNZSL/FREE training paths read
back (``baselines/features.FeatureFile``).

Usage:
  python tools/export_image_feats.py --manifest test_split.json \
      --image_root /data/imagenet --cnn resnet50.pth --out features.npz \
      [--resolution 256 --crop 224 --batch 64 --num_procs 8]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", required=True,
                    help="grouped json: wnid -> [relative image paths]")
    ap.add_argument("--image_root", required=True)
    ap.add_argument("--cnn", required=True,
                    help="torch ResNet-50 .pt/.pth or orbax pytree dir")
    ap.add_argument("--out", default="features.npz")
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--crop", type=int, default=224)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--num_threads", type=int, default=8)
    ap.add_argument("--num_procs", type=int, default=0)
    ap.add_argument("--classes", default="",
                    help="optional json list limiting the exported classes")
    args = ap.parse_args()

    from hgr_tpu.baselines.features import export_image_features, load_backbone

    grouped = {c: p for c, p in json.load(open(args.manifest)).items() if p}
    if args.classes:
        keep = set(json.load(open(args.classes)))
        grouped = {c: p for c, p in grouped.items() if c in keep}
    params = load_backbone(args.cnn)
    out = export_image_features(
        grouped, args.image_root, params, args.out,
        resolution=args.resolution, crop=args.crop, batch=args.batch,
        num_threads=args.num_threads, num_procs=args.num_procs,
    )
    n = sum(len(p) for p in grouped.values())
    print(f"wrote {n} features for {len(grouped)} classes -> {out}",
          flush=True)


if __name__ == "__main__":
    main()
