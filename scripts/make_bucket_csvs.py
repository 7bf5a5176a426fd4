#!/usr/bin/env python
"""Generate the per-split bucket CSVs (file_path,length) from a LibriSpeech
root.

The reference consumes precomputed CSVs from s3prl's preprocessing
(reference utils/dataset.py:26-34 reads `<bucket_path>/<split>.csv`; the repo
ships 5 of them under data/len_for_bucket/). This tool produces the same
format from a local corpus, so the pipeline is self-contained:

    python scripts/make_bucket_csvs.py --libri-root ../LibriSpeech \
        --out data/len_for_bucket --splits train-clean-100 dev-clean test-clean

Lengths are decoded sample counts (native decoder — FLAC STREAMINFO makes
this a header read, no full decode).
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flac_num_samples(path: str) -> int:
    """Read total_samples from the FLAC STREAMINFO header (fast path)."""
    with open(path, "rb") as f:
        head = f.read(4)
        if head != b"fLaC":
            return -1
        while True:
            hdr = f.read(4)
            if len(hdr) < 4:
                return -1
            block_type = hdr[0] & 0x7F
            last = hdr[0] & 0x80
            length = (hdr[1] << 16) | (hdr[2] << 8) | hdr[3]
            body = f.read(length)
            if block_type == 0 and length >= 34:
                return ((body[13] & 0x0F) << 32) | (body[14] << 24) | \
                       (body[15] << 16) | (body[16] << 8) | body[17]
            if last:
                return -1


def scan_split(libri_root: str, split: str):
    rows = []
    split_dir = os.path.join(libri_root, split)
    for dirpath, _dirs, files in os.walk(split_dir):
        for fn in sorted(files):
            if not fn.endswith((".flac", ".wav")):
                continue
            full = os.path.join(dirpath, fn)
            if fn.endswith(".flac"):
                n = flac_num_samples(full)
            else:
                from fithubert_tpu.data import audio

                n = len(audio.decode(full))
            if n > 0:
                rows.append((os.path.relpath(full, libri_root), n))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--libri-root", required=True)
    ap.add_argument("--out", default="data/len_for_bucket")
    ap.add_argument("--splits", nargs="+", required=True)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    for split in args.splits:
        rows = scan_split(args.libri_root, split)
        out_path = os.path.join(args.out, f"{split}.csv")
        with open(out_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["file_path", "length"])
            w.writeheader()
            for p, n in rows:
                w.writerow({"file_path": p, "length": n})
        print(f"{split}: {len(rows)} utterances -> {out_path}")


if __name__ == "__main__":
    main()
