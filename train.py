#!/usr/bin/env python
"""CLI entrypoint: `python train.py -c <yaml> [-t]`.

Accepts the reference's exact YAML schema (reference train.py:449-509 parses
--config/--test the same way; see /root/reference/data/conf/fithubert.yaml).
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "-cfg", "--config",
                        help="yaml config path for training")
    parser.add_argument("-t", "--test", action="store_true",
                        help="Enable testing mode")
    parser.add_argument("--no-resume", action="store_true",
                        help="Ignore existing checkpoints")
    parser.add_argument("--platform", default=os.environ.get("FITHUBERT_PLATFORM"),
                        help="force a jax platform (e.g. cpu) — overrides the "
                             "site-injected default")
    parser.add_argument("--debug-nans", action="store_true",
                        help="enable jax_debug_nans: fail fast at the first "
                             "NaN-producing op (sanitizer mode)")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from fithubert_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from fithubert_tpu.config import load_yaml_config
    from fithubert_tpu.train.loop import run_training

    cfg = load_yaml_config(args.config or "configs/smoke.yaml")
    result = run_training(cfg, resume=not args.no_resume, test_only=args.test)
    print(result)


if __name__ == "__main__":
    main()
