#!/usr/bin/env python
"""Export a wnid -> class-name JSON from NLTK WordNet.

The reference resolves class names at runtime via NLTK
(``utils.py:36`` ``get_synsets``, ``model/clip_tree.py:52-56``), which
requires the WordNet corpus on every training host. Here name resolution is
an offline step: run this once where NLTK data is available and pass the
JSON via ``--names_path``.

Usage: python tools/export_wordnet_names.py --wnids winter_2021.txt --out names.json
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wnids", required=True,
                    help="text file with one wnid per line, or a graph edges JSON")
    ap.add_argument("--out", default="names.json")
    args = ap.parse_args()

    try:
        from nltk.corpus import wordnet as wn

        wn.synsets("dog")
    except Exception as e:
        raise SystemExit(
            f"NLTK WordNet corpus unavailable ({e}); run where nltk data exists"
        )

    if args.wnids.endswith(".json"):
        edges = json.load(open(args.wnids))
        wnids = sorted({n for e in edges for n in e if n != "fall11"})
    else:
        wnids = [l.strip() for l in open(args.wnids) if l.strip()]

    names = {}
    for w in wnids:
        synset = wn.synset_from_pos_and_offset("n", int(w[1:]))
        names[w] = synset.name().split(".")[0].replace("_", " ")
    json.dump(names, open(args.out, "w"))
    print(f"wrote {len(names)} names -> {args.out}")


if __name__ == "__main__":
    main()
