"""Teacher-weight initialization surgery on student param pytrees.

Parity target: reference CustomStudentModel.init_from_teacher_conv /
init_from_teacher_enc (modules/model.py:560-588) — invoked when
`init_conv_layers` / `init_encoder_layers > 0` (modules/model.py:327-332).
Instead of torch load_state_dict on live modules, this is pure checkpoint
surgery over pytrees: copy teacher leaves into the student tree wherever the
shapes line up, skip (like the reference's bare try/except) where they don't.

Note: with a TR layer enabled the reference's init_from_teacher_enc indexes
the torch ModuleList that CONTAINS the TR module and would crash on the
mismatched state dict; here teacher layer i always maps to student
transformer layer i (the TR slot is not part of the numbering).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from fithubert_tpu.config import StudentConfig


def _copy_matching(dst: Dict[str, Any], src: Dict[str, Any], path: str,
                   copied: List[str], skipped: List[str]) -> None:
    for k, v in src.items():
        if k not in dst:
            continue
        p = f"{path}/{k}" if path else k
        if isinstance(v, dict) and isinstance(dst[k], dict):
            _copy_matching(dst[k], v, p, copied, skipped)
        else:
            if tuple(np.shape(dst[k])) == tuple(np.shape(v)):
                dst[k] = np.asarray(v).astype(np.asarray(dst[k]).dtype)
                copied.append(p)
            else:
                skipped.append(p)


def _as_mutable(tree):
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: _as_mutable(v) for k, v in tree.items()}
    return tree


def init_student_from_teacher(
    student_params: Dict[str, Any],
    teacher_params: Dict[str, Any],
    cfg: StudentConfig,
    verbose: bool = True,
) -> Dict[str, Any]:
    """Return student params with teacher weights grafted in per cfg flags."""
    out = _as_mutable(student_params)
    t = teacher_params.get("params", teacher_params)
    copied: List[str] = []
    skipped: List[str] = []

    if cfg.init_conv_layers and "feature_extractor" in out and "feature_extractor" in t:
        _copy_matching(out["feature_extractor"], t["feature_extractor"],
                       "feature_extractor", copied, skipped)
        # reference also tries post_extract_proj under the same flag
        # (modules/model.py:566-571, silent on dim mismatch)
        if "post_extract_proj" in out and "post_extract_proj" in t:
            _copy_matching(out["post_extract_proj"], t["post_extract_proj"],
                           "post_extract_proj", copied, skipped)

    n = cfg.init_encoder_layers
    if n > 0 and "encoder" in out and "encoder" in t:
        assert n <= cfg.encoder_layers, (n, cfg.encoder_layers)
        if "pos_conv" in out["encoder"] and "pos_conv" in t["encoder"]:
            _copy_matching(out["encoder"]["pos_conv"], t["encoder"]["pos_conv"],
                           "encoder/pos_conv", copied, skipped)
        for i in range(n):
            key = f"layers_{i}"
            if key in out["encoder"] and key in t["encoder"]:
                _copy_matching(out["encoder"][key], t["encoder"][key],
                               f"encoder/{key}", copied, skipped)

    if verbose and (copied or skipped):
        print(f"[teacher-init] copied {len(copied)} tensors, "
              f"skipped {len(skipped)} (shape mismatch)")
    return out
