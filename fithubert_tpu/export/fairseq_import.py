"""Import fairseq HuBERT / wav2vec2 / wav2vec2-CTC checkpoints as JAX teachers.

Replaces the reference's fairseq-dependent loader (reference utils/utils.py:
102-149 builds HubertModel/Wav2Vec2Model/Wav2VecCtc and wraps them with
forward hooks). Here the `.pt` file is read once on the host, its tensors are
re-laid-out into the TeacherModel param pytree (channels-last convs, (in, out)
dense kernels), and the weight-normalized positional conv's weight_g/weight_v
pair is imported as-is (our PositionalConv keeps the same factorization).

The reference forces `required_seq_len_multiple=1`, disables layerdrop and
dropout on the teacher (utils/utils.py:118,135,146 + eval()); TeacherModel
has those properties by construction.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from fithubert_tpu.config import parse_spec
from fithubert_tpu.models.teacher import TeacherGeometry
from fithubert_tpu.export.torch_pickle import tolerant_torch_load, unstub

# Standard fairseq extractor spec (kernel -> stride) used to recover strides
# when the checkpoint config is unreadable: [(512,10,5)] + [(512,3,2)]*4 +
# [(512,2,2)]*2.
_DEFAULT_STRIDES = {10: 5, 3: 2, 2: 2}


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _dense(sd: Dict[str, Any], name: str) -> Dict[str, np.ndarray]:
    """torch Linear (out, in) -> flax Dense {kernel (in, out), bias}."""
    p = {"kernel": _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        p["bias"] = _np(sd[f"{name}.bias"])
    return p


def _layernorm(sd: Dict[str, Any], name: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def map_encoder_layer(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """fairseq TransformerSentenceEncoderLayer -> our TransformerEncoderLayer."""
    return {
        "self_attn": {
            "q_proj": _dense(sd, f"{prefix}.self_attn.q_proj"),
            "k_proj": _dense(sd, f"{prefix}.self_attn.k_proj"),
            "v_proj": _dense(sd, f"{prefix}.self_attn.v_proj"),
            "out_proj": _dense(sd, f"{prefix}.self_attn.out_proj"),
        },
        "self_attn_layer_norm": _layernorm(sd, f"{prefix}.self_attn_layer_norm"),
        "fc1": _dense(sd, f"{prefix}.fc1"),
        "fc2": _dense(sd, f"{prefix}.fc2"),
        "final_layer_norm": _layernorm(sd, f"{prefix}.final_layer_norm"),
    }


def _conv1d(sd: Dict[str, Any], name: str) -> Dict[str, np.ndarray]:
    """torch Conv1d (C_out, C_in/g, K) -> our Conv1D kernel (K, C_in/g, C_out)."""
    p = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 1, 0)}
    if f"{name}.bias" in sd:
        p["bias"] = _np(sd[f"{name}.bias"])
    return p


def map_conformer_layer(
    sd: Dict[str, Any], prefix: str
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """fairseq ConformerWav2Vec2EncoderLayer -> our ConformerEncoderLayer.

    Returns (params, batch_stats): the conv module's BatchNorm running
    mean/var live in flax's batch_stats collection, not params. Attention
    naming dispatches on the keys present: espnet attentions use
    linear_q/k/v/out (+ linear_pos/pos_bias_u/pos_bias_v for rel_pos);
    attn_type != 'espnet' checkpoints hold a standard fairseq
    MultiheadAttention with q/k/v/out_proj.
    """

    def ffn(name: str) -> Dict[str, Any]:
        return {
            "layer_norm": _layernorm(sd, f"{prefix}.{name}.layer_norm"),
            "w_1": _dense(sd, f"{prefix}.{name}.w_1"),
            "w_2": _dense(sd, f"{prefix}.{name}.w_2"),
        }

    if f"{prefix}.self_attn.linear_q.weight" in sd:  # espnet naming
        attn = {
            "q_proj": _dense(sd, f"{prefix}.self_attn.linear_q"),
            "k_proj": _dense(sd, f"{prefix}.self_attn.linear_k"),
            "v_proj": _dense(sd, f"{prefix}.self_attn.linear_v"),
            "out_proj": _dense(sd, f"{prefix}.self_attn.linear_out"),
        }
        if f"{prefix}.self_attn.linear_pos.weight" in sd:  # rel_pos variant
            attn["linear_pos"] = _dense(sd, f"{prefix}.self_attn.linear_pos")
            attn["pos_bias_u"] = _np(sd[f"{prefix}.self_attn.pos_bias_u"])
            attn["pos_bias_v"] = _np(sd[f"{prefix}.self_attn.pos_bias_v"])
    else:  # plain MultiheadAttention (attn_type != 'espnet')
        attn = {
            "q_proj": _dense(sd, f"{prefix}.self_attn.q_proj"),
            "k_proj": _dense(sd, f"{prefix}.self_attn.k_proj"),
            "v_proj": _dense(sd, f"{prefix}.self_attn.v_proj"),
            "out_proj": _dense(sd, f"{prefix}.self_attn.out_proj"),
        }

    cm = f"{prefix}.conv_module"
    params = {
        "ffn1": ffn("ffn1"),
        "ffn2": ffn("ffn2"),
        "self_attn_layer_norm": _layernorm(sd, f"{prefix}.self_attn_layer_norm"),
        "self_attn": attn,
        "final_layer_norm": _layernorm(sd, f"{prefix}.final_layer_norm"),
        "conv_module": {
            "layer_norm": _layernorm(sd, f"{cm}.layer_norm"),
            "pointwise_conv1": _conv1d(sd, f"{cm}.pointwise_conv1"),
            "depthwise_conv": _conv1d(sd, f"{cm}.depthwise_conv"),
            "batch_norm": {
                "scale": _np(sd[f"{cm}.batch_norm.weight"]),
                "bias": _np(sd[f"{cm}.batch_norm.bias"]),
            },
            "pointwise_conv2": _conv1d(sd, f"{cm}.pointwise_conv2"),
        },
    }
    stats = {
        "conv_module": {
            "batch_norm": {
                "mean": _np(sd[f"{cm}.batch_norm.running_mean"]),
                "var": _np(sd[f"{cm}.batch_norm.running_var"]),
            }
        }
    }
    return params, stats


def map_extractor(sd: Dict[str, Any], prefix: str, mode: str) -> Dict[str, Any]:
    """fairseq ConvFeatureExtractionModel -> our ConvFeatureExtractor.

    torch conv1d weight (C_out, C_in, K) -> our (K, C_in, C_out). In `default`
    mode block 0 holds a GroupNorm at sequential index 2; in `layer_norm` mode
    every block holds a LayerNorm at index 2.1 (wrapped in TransposeLast).
    """
    out: Dict[str, Any] = {}
    i = 0
    while f"{prefix}.conv_layers.{i}.0.weight" in sd:
        conv: Dict[str, np.ndarray] = {
            "kernel": _np(sd[f"{prefix}.conv_layers.{i}.0.weight"]).transpose(2, 1, 0)
        }
        if f"{prefix}.conv_layers.{i}.0.bias" in sd:
            conv["bias"] = _np(sd[f"{prefix}.conv_layers.{i}.0.bias"])
        out[f"conv_{i}"] = conv
        if mode == "layer_norm" and f"{prefix}.conv_layers.{i}.2.1.weight" in sd:
            out[f"layer_norm_{i}"] = {
                "scale": _np(sd[f"{prefix}.conv_layers.{i}.2.1.weight"]),
                "bias": _np(sd[f"{prefix}.conv_layers.{i}.2.1.bias"]),
            }
        elif i == 0 and f"{prefix}.conv_layers.0.2.weight" in sd:
            out["group_norm"] = {
                "scale": _np(sd[f"{prefix}.conv_layers.0.2.weight"]),
                "bias": _np(sd[f"{prefix}.conv_layers.0.2.bias"]),
            }
        i += 1
    return out


def map_pos_conv(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """Weight-normalized grouped conv1d. torch: weight_v (C_out, C_in/g, K),
    weight_g (1, 1, K) [dim=2] -> ours: weight_v (K, C_in/g, C_out),
    weight_g (K,)."""
    g_key = f"{prefix}.0.weight_g"
    if g_key not in sd:  # torch >= 2.1 parametrized naming
        g_key = f"{prefix}.0.parametrizations.weight.original0"
        v_key = f"{prefix}.0.parametrizations.weight.original1"
    else:
        v_key = f"{prefix}.0.weight_v"
    return {
        "weight_v": _np(sd[v_key]).transpose(2, 1, 0),
        "weight_g": _np(sd[g_key]).reshape(-1),
        "bias": _np(sd[f"{prefix}.0.bias"]),
    }


def map_transformer_encoder(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    enc: Dict[str, Any] = {
        "pos_conv": map_pos_conv(sd, f"{prefix}.pos_conv"),
        "layer_norm": _layernorm(sd, f"{prefix}.layer_norm"),
    }
    i = 0
    while f"{prefix}.layers.{i}.self_attn.q_proj.weight" in sd:
        enc[f"layers_{i}"] = map_encoder_layer(sd, f"{prefix}.layers.{i}")
        i += 1
    return enc


def _extract_model_cfg(ckpt: Dict[str, Any]) -> Dict[str, Any]:
    """Pull the model section out of ckpt['cfg'] (omegaconf, stubbed) or
    ckpt['args'] (argparse Namespace, older fairseq)."""
    cfg = unstub(ckpt.get("cfg"))
    if isinstance(cfg, dict):
        model = cfg.get("model")
        if isinstance(model, dict):
            # wav2vec_ctc nests the acoustic model under w2v_args. The INNER
            # model config wins on conflicts: fairseq builds the acoustic
            # model purely from w2v_args.model (reference utils/utils.py:
            # 104-115), and the outer fine-tune args carry ctc-level fields
            # (dropout, final_dropout...) that must not override acoustic
            # hyperparameters.
            inner = model.get("w2v_args")
            if isinstance(inner, dict) and isinstance(inner.get("model"), dict):
                return {**{k: v for k, v in model.items() if k != "w2v_args"},
                        **inner["model"]}
            return model
    args = unstub(ckpt.get("args"))
    if isinstance(args, dict):
        # legacy fine-tune (wav2vec_ctc) checkpoints nest the acoustic
        # model's config under args.w2v_args, same as the cfg branch
        # (inner wins on conflicts, same rationale)
        inner = args.get("w2v_args")
        if isinstance(inner, dict):
            inner_model = inner.get("model") if isinstance(inner.get("model"), dict) else inner
            return {**{k: v for k, v in args.items() if k != "w2v_args"},
                    **inner_model}
        return args
    return {}


def _conv_spec_from_cfg_or_weights(
    mcfg: Dict[str, Any], sd: Dict[str, Any], prefix: str
) -> Tuple[Tuple[int, int, int], ...]:
    spec = mcfg.get("conv_feature_layers")
    if spec:
        try:
            return tuple((int(d), int(k), int(s)) for d, k, s in parse_spec(spec))
        except (ValueError, TypeError):
            pass
    layers = []
    i = 0
    while f"{prefix}.conv_layers.{i}.0.weight" in sd:
        w = _np(sd[f"{prefix}.conv_layers.{i}.0.weight"])  # (C_out, C_in, K)
        c_out, _, k = w.shape
        layers.append((c_out, k, _DEFAULT_STRIDES.get(k, 1)))
        i += 1
    return tuple(layers)


def save_converted_teacher(geom: TeacherGeometry, variables: Dict[str, Any],
                           prefix: str) -> Tuple[str, str]:
    """Persist a converted teacher as (geometry json, params msgpack) so
    training hosts need neither torch nor the original fairseq checkpoint."""
    import dataclasses
    import json

    from flax import serialization

    json_path, msgpack_path = prefix + ".json", prefix + ".msgpack"
    with open(json_path, "w") as f:
        json.dump(dataclasses.asdict(geom), f, indent=1)
    with open(msgpack_path, "wb") as f:
        f.write(serialization.to_bytes(variables["params"]))
    return json_path, msgpack_path


def load_converted_teacher(path: str) -> Tuple[TeacherGeometry, Dict[str, Any]]:
    """Load a teacher saved by save_converted_teacher (either file works)."""
    import json

    from flax import serialization

    prefix = path[: -len(".msgpack")] if path.endswith(".msgpack") else (
        path[: -len(".json")] if path.endswith(".json") else path)
    with open(prefix + ".json") as f:
        d = json.load(f)
    d["conv_feature_layers"] = tuple(tuple(t) for t in d["conv_feature_layers"])
    geom = TeacherGeometry(**d)
    with open(prefix + ".msgpack", "rb") as f:
        params = serialization.msgpack_restore(f.read())
    return geom, {"params": params}


def load_teacher_any(path: str) -> Tuple[TeacherGeometry, Dict[str, Any]]:
    """Dispatch on file type: fairseq .pt or a converted (.json, .msgpack) pair."""
    if path.endswith((".msgpack", ".json")):
        return load_converted_teacher(path)
    return load_fairseq_teacher(path)


def load_fairseq_teacher(path: str) -> Tuple[TeacherGeometry, Dict[str, Any]]:
    """Read a fairseq checkpoint -> (TeacherGeometry, {'params': pytree}).

    Dispatches on checkpoint contents like the reference's model_type switch
    (utils/utils.py:115-143): a `w2v_encoder.` prefix means Wav2VecCtc, a
    `label_embs_concat` key means HuBERT, else wav2vec2.
    """
    ckpt = tolerant_torch_load(path)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    sd = {k: v for k, v in sd.items() if hasattr(v, "shape")}

    ctc_proj: Optional[Dict[str, np.ndarray]] = None
    if any(k.startswith("w2v_encoder.") for k in sd):
        model_type = "wav2vec_ctc"
        ctc_proj = _dense(sd, "w2v_encoder.proj")
        sd = {
            k[len("w2v_encoder.w2v_model."):]: v
            for k, v in sd.items()
            if k.startswith("w2v_encoder.w2v_model.")
        }
    elif "label_embs_concat" in sd:
        model_type = "hubert"
    else:
        model_type = "wav2vec2"

    mcfg = _extract_model_cfg(ckpt)

    extractor_mode = mcfg.get("extractor_mode") or (
        "layer_norm"
        if "feature_extractor.conv_layers.1.2.1.weight" in sd
        else "default"
    )
    conv_layers = _conv_spec_from_cfg_or_weights(mcfg, sd, "feature_extractor")

    embed_dim = _np(sd["encoder.layers.0.self_attn.q_proj.weight"]).shape[0]
    ffn_dim = _np(sd["encoder.layers.0.fc1.weight"]).shape[0]

    # positional-conv geometry directly from the weight-norm tensors:
    # weight_v is (C_out, C_in/groups, K)
    v_key = ("encoder.pos_conv.0.weight_v"
             if "encoder.pos_conv.0.weight_v" in sd
             else "encoder.pos_conv.0.parametrizations.weight.original1")
    pos_out, pos_in_per_g, pos_k = _np(sd[v_key]).shape
    pos_groups = pos_out // pos_in_per_g
    n_layers = 0
    while f"encoder.layers.{n_layers}.self_attn.q_proj.weight" in sd:
        n_layers += 1

    geom = TeacherGeometry(
        model_type=model_type,
        extractor_mode=extractor_mode,
        conv_feature_layers=conv_layers,
        encoder_layers=n_layers,
        encoder_embed_dim=embed_dim,
        encoder_ffn_embed_dim=ffn_dim,
        encoder_attention_heads=int(mcfg.get("encoder_attention_heads")
                                    or max(1, embed_dim // 64)),
        activation_fn=str(mcfg.get("activation_fn") or "gelu"),
        layer_norm_first=bool(mcfg.get("layer_norm_first", False)),
        conv_bias=f"feature_extractor.conv_layers.0.0.bias" in sd,
        conv_pos=pos_k,
        conv_pos_groups=pos_groups,
        vocab_size=ctc_proj["kernel"].shape[1] if ctc_proj is not None else 0,
    )

    params: Dict[str, Any] = {
        "feature_extractor": map_extractor(sd, "feature_extractor", extractor_mode),
        "layer_norm": _layernorm(sd, "layer_norm"),
        "encoder": map_transformer_encoder(sd, "encoder"),
    }
    if "post_extract_proj.weight" in sd:
        params["post_extract_proj"] = _dense(sd, "post_extract_proj")
    if ctc_proj is not None:
        params["ctc_proj"] = ctc_proj

    return geom, {"params": params}
