#!/usr/bin/env python
"""One-time fairseq-teacher conversion:

    python scripts/convert_teacher.py hubert_base_ls960.pt [out_prefix]

reads the fairseq checkpoint (torch required once, no fairseq/omegaconf
needed) and writes <out_prefix>.json + <out_prefix>.msgpack, which training
loads torch-free (set `teacher.teacher_model: <out_prefix>.msgpack`)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    src = sys.argv[1]
    prefix = sys.argv[2] if len(sys.argv) > 2 else os.path.splitext(src)[0]
    from fithubert_tpu.export.fairseq_import import (
        load_fairseq_teacher,
        save_converted_teacher,
    )

    geom, variables = load_fairseq_teacher(src)
    jp, mp = save_converted_teacher(geom, variables, prefix)
    print(f"{src} ({geom.model_type}, {geom.encoder_layers}x"
          f"{geom.encoder_embed_dim}) -> {jp}, {mp}")


if __name__ == "__main__":
    main()
