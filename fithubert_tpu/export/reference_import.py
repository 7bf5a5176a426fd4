"""Import the reference's released Lightning checkpoints into our student.

The reference publishes FitHuBERT-100h / FitHuBERT-960h / FitW2V2-960h as
pytorch-lightning `.ckpt` files whose state dict prefixes every key with
`student_model.` (reference fithubert/expert.py:40-45 strips it with k[14:]),
paired with a dumped YAML config (utils/utils.py:153-180). This module reads
that pair and produces the param pytree of our StudentModel — validating
cross-framework parity and letting users bring trained reference weights to
TPU without retraining.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from fithubert_tpu.config import ExperimentConfig, StudentConfig, load_yaml_config
from fithubert_tpu.export.torch_pickle import tolerant_torch_load
from fithubert_tpu.export.fairseq_import import (
    _conv1d,
    _dense,
    _layernorm,
    _np,
    map_conformer_layer,
    map_encoder_layer,
    map_extractor,
    map_pos_conv,
)

STUDENT_PREFIX = "student_model."


def _conv_transpose1d(sd: Dict[str, Any], name: str) -> Dict[str, np.ndarray]:
    """torch ConvTranspose1d (C_in, C_out, K) -> our kernel (K, C_out, C_in)."""
    p = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 1, 0)}
    if f"{name}.bias" in sd:
        p["bias"] = _np(sd[f"{name}.bias"])
    return p


def map_student_state_dict(
    sd: Dict[str, Any],
    cfg: StudentConfig,
    collections: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Reference CustomStudentModel state dict -> our StudentModel params.

    Pass a dict as `collections` to also receive non-param variable
    collections: conformer layers deposit their BatchNorm running stats
    under collections['batch_stats'].
    """
    params: Dict[str, Any] = {}
    is_conformer = cfg.layer_type == "conformer"

    if cfg.n_mels <= 0:
        params["feature_extractor"] = map_extractor(
            sd, "feature_extractor", cfg.extractor_mode
        )
    elif cfg.mel_spec_head_conv_layers:
        params["mel_spec_head"] = {
            f"conv_{i}": _conv1d(sd, f"mel_spec_head.conv_layers.{i}")
            for i in range(len(cfg.mel_spec_head_conv_layers))
        }

    params["layer_norm"] = _layernorm(sd, "layer_norm")
    if "post_extract_proj.weight" in sd:
        params["post_extract_proj"] = _dense(sd, "post_extract_proj")
    if "cnn_proj_head.1.weight" in sd:  # Sequential(GELU, Linear)
        params["cnn_proj_head"] = _dense(sd, "cnn_proj_head.1")

    # ---- encoder: reference inserts the TR module INTO the torch ModuleList
    # at tr_layer_index (reference modules/module.py:244-248), so torch index j
    # maps to our layers_{j'} with the TR slot removed. The dedicated
    # ConformerEncoder (layer_type=conformer + rel_pos/rope) rebuilds its
    # layer list WITHOUT the TR module and never runs its inherited pos_conv
    # (reference modules/module.py:420-430,434-469), so neither is mapped.
    dedicated_conformer = is_conformer and cfg.pos_enc_type in ("rel_pos", "rope")
    enc: Dict[str, Any] = {
        "layer_norm": _layernorm(sd, "encoder.layer_norm"),
    }
    if not dedicated_conformer:
        enc["pos_conv"] = map_pos_conv(sd, "encoder.pos_conv")
    enc_stats: Dict[str, Any] = {}
    tr_slot = (
        cfg.tr_layer_index
        if cfg.enable_tr_layer and not dedicated_conformer
        else -1
    )
    our_idx = 0
    num_slots = cfg.encoder_layers + (1 if tr_slot >= 0 else 0)
    for j in range(num_slots):
        prefix = f"encoder.layers.{j}"
        if j == tr_slot:
            if cfg.tr_layer_type == "conv1d":
                enc["tr_layer"] = {"conv": _conv1d(sd, prefix)}
            elif cfg.tr_layer_type == "fc1":
                enc["tr_layer"] = {"fc": _dense(sd, prefix)}
            else:  # fc2: Sequential(Linear, GELU, Linear)
                enc["tr_layer"] = {
                    "fc_a": _dense(sd, f"{prefix}.0"),
                    "fc_b": _dense(sd, f"{prefix}.2"),
                }
            continue
        if is_conformer:
            layer_params, layer_stats = map_conformer_layer(sd, prefix)
            enc[f"layers_{our_idx}"] = layer_params
            enc_stats[f"layers_{our_idx}"] = layer_stats
        else:
            enc[f"layers_{our_idx}"] = map_encoder_layer(sd, prefix)
        our_idx += 1
    params["encoder"] = enc
    if enc_stats and collections is not None:
        collections["batch_stats"] = {"encoder": enc_stats}

    # ---- heads
    if cfg.layerwise_proj:
        for i in range(cfg.encoder_layers):
            head: Dict[str, Any] = {}
            if cfg.enable_tr_layer:
                head["upsampler"] = _conv_transpose1d(sd, f"proj_head.{i}.upsampler")
            if cfg.encoder_embed_dim != cfg.pred_head_final_dim:
                head["lin_proj"] = _dense(sd, f"proj_head.{i}.lin_proj")
            params[f"proj_head_{i}"] = head
    else:
        if cfg.enable_tr_layer and "upsampler.weight" in sd:
            params["upsampler"] = _conv_transpose1d(sd, "upsampler")
        if "proj_head.0.weight" in sd:
            params["proj_head_in"] = _dense(sd, "proj_head.0")
            if "proj_head.2.weight" in sd:  # SplitLinear with in_split > 1
                params["proj_head_split"] = {
                    "weight": _np(sd["proj_head.2.weight"]),
                    "bias": _np(sd["proj_head.2.bias"]),
                }
            else:  # in_split == 1 falls back to a plain Linear named `layer`
                params["proj_head_split"] = {"layer": _dense(sd, "proj_head.2.layer")}

    return params


def load_reference_student(
    ckpt_path: str, yaml_path: str
) -> Tuple[ExperimentConfig, Dict[str, Any]]:
    """Load (lightning .ckpt, dumped yaml) -> (ExperimentConfig, student params)."""
    cfg = load_yaml_config(yaml_path)
    ckpt = tolerant_torch_load(ckpt_path)
    sd = ckpt.get("state_dict", ckpt)
    sd = {
        k[len(STUDENT_PREFIX):]: v
        for k, v in sd.items()
        if k.startswith(STUDENT_PREFIX)
    }
    collections: Dict[str, Any] = {}
    params = map_student_state_dict(sd, cfg.distiller, collections)
    return cfg, {"params": params, **collections}
