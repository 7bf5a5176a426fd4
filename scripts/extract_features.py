#!/usr/bin/env python
"""Batch feature extraction CLI: trained student -> per-utterance features.

The reference exposes features only through external s3prl
(`run_downstream.py -u fithubert`, reference README.md:18-29); this CLI
serves the same frozen-feature use case standalone:

    python scripts/extract_features.py \
        --ckpt results/pretrain/run/student.msgpack \
        --config results/pretrain/run/student.yaml \
        --inputs path/to/*.flac --out feats/

Writes one `<utt>.npy` of shape (T, 768) at 50 Hz (downsample rate 320,
reference fithubert/expert.py:49-50) per input file; `--layer N` selects an
intermediate hidden instead of last_hidden_state. Accepts the reference's
released lightning `.ckpt` files too (export/reference_import.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="student.msgpack export or reference lightning .ckpt")
    ap.add_argument("--config", required=True, help="dumped student yaml")
    ap.add_argument("--inputs", nargs="+", required=True,
                    help="audio files (.flac/.wav)")
    ap.add_argument("--out", required=True, help="output directory for .npy")
    ap.add_argument("--layer", type=int, default=-1,
                    help="hidden_states index to dump (-1 = last_hidden_state)")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--int8", action="store_true",
                    help="serve with dynamic-int8 MXU matmuls (2x bf16 peak "
                         "on v5e; bounded rounding error — ops/quant.py)")
    ap.add_argument("--platform", default=os.environ.get("FITHUBERT_PLATFORM"))
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from fithubert_tpu.data import audio
    from fithubert_tpu.export.expert import UpstreamExpert
    from fithubert_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache(probe_backend=True)
    expert = UpstreamExpert(args.ckpt, args.config, int8=args.int8)
    os.makedirs(args.out, exist_ok=True)

    # unique output names: same-basename inputs from different directories
    # must not silently overwrite each other
    names = {}
    seen = {}
    for p in args.inputs:
        base = os.path.splitext(os.path.basename(p))[0]
        n = seen.get(base, 0)
        seen[base] = n + 1
        names[p] = base if n == 0 else f"{base}.{n}"

    for i in range(0, len(args.inputs), args.batch_size):
        paths = args.inputs[i : i + args.batch_size]
        wavs = [audio.decode(p) for p in paths]
        out = expert(wavs)
        feats = (
            out["last_hidden_state"]
            if args.layer < 0
            else out["hidden_states"][args.layer]
        )
        pad = out.get("padding_mask")
        for j, p in enumerate(paths):
            # crop padding via the model's own frame mask. The mask lives at
            # the POST-TR rate while the output is upsampled back, and
            # intermediate hiddens can sit at either rate — scale the valid
            # count by the length ratio (exact: both are quantized shapes).
            if pad is not None and feats.shape[1] % pad.shape[1] == 0:
                factor = feats.shape[1] // pad.shape[1]
                n_frames = int((~pad[j]).sum()) * factor
            else:
                n_frames = feats.shape[1]
            name = names[p] + ".npy"
            np.save(os.path.join(args.out, name),
                    np.asarray(feats[j][:n_frames]))
        print(f"[extract] {min(i + args.batch_size, len(args.inputs))}/"
              f"{len(args.inputs)}")


if __name__ == "__main__":
    main()
