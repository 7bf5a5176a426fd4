"""Metrics logging: stdout + JSONL file per run (reference logs through
Lightning self.log, train.py:166-168,197 — here a plain, greppable stream)."""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict


class MetricsLogger:
    def __init__(self, output_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, filename)
        self._f = open(self.path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict, prefix: str = "", echo: bool = True):
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                rec[prefix + k] = float(v)
            except (TypeError, ValueError):
                # JSON-safe fallback: arrays become lists, anything else str
                # (a raw ndarray would crash json.dumps mid-training)
                if hasattr(v, "tolist"):
                    rec[prefix + k] = v.tolist()
                elif isinstance(v, (str, int, bool, list, dict, type(None))):
                    rec[prefix + k] = v
                else:
                    rec[prefix + k] = str(v)
        self._f.write(json.dumps(rec) + "\n")
        if echo:
            shown = {k: v for k, v in rec.items() if k not in ("time",)}
            parts = [
                f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in shown.items()
            ]
            print("[train]", " ".join(parts), file=sys.stderr)

    def close(self):
        self._f.close()
