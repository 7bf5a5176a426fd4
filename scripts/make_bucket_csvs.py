#!/usr/bin/env python
"""Generate the per-split bucket CSVs (file_path,length) from a LibriSpeech
root.

The reference consumes precomputed CSVs from s3prl's preprocessing
(reference utils/dataset.py:26-34 reads `<bucket_path>/<split>.csv`; the repo
ships 5 of them under data/len_for_bucket/). The pipeline auto-generates a
missing CSV at load time (data/librispeech.py:read_bucket_csvs); this CLI
pre-generates them in bulk:

    python scripts/make_bucket_csvs.py --libri-root ../LibriSpeech \
        --out data/len_for_bucket --splits train-clean-100 dev-clean test-clean

Lengths are decoded sample counts (FLAC STREAMINFO makes this a header read,
no full decode).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--libri-root", required=True)
    ap.add_argument("--out", default="data/len_for_bucket")
    ap.add_argument("--splits", nargs="+", required=True)
    args = ap.parse_args()

    from fithubert_tpu.data.librispeech import generate_bucket_csv

    for split in args.splits:
        out_path = generate_bucket_csv(args.libri_root, split, args.out)
        with open(out_path) as f:
            n = sum(1 for _ in f) - 1
        print(f"{split}: {n} utterances -> {out_path}")


if __name__ == "__main__":
    main()
