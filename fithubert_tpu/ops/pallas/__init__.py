"""Pallas TPU kernels + dispatch helpers.

`force_interpret` flips every kernel dispatcher into Pallas interpret mode so
the REAL kernel path (not the XLA fallback) runs on CPU — used by the
multi-chip CPU-mesh tests (interpret works off-TPU for everything except
pltpu.prng_*, see CLAUDE.md, so those tests keep dropout at 0).
"""

from __future__ import annotations

import contextlib

_FORCE_INTERPRET = False


@contextlib.contextmanager
def force_interpret():
    global _FORCE_INTERPRET
    prev = _FORCE_INTERPRET
    _FORCE_INTERPRET = True
    try:
        yield
    finally:
        _FORCE_INTERPRET = prev


def interpret_forced() -> bool:
    return _FORCE_INTERPRET
