"""Configuration system.

Accepts the reference's exact YAML schema (5 sections: teacher / train /
distiller / optimizer / data (+specaug); cf. reference data/conf/fithubert.yaml)
but replaces the reference's ``eval()``-based string fields
(reference modules/model.py:267,337,290) with a restricted literal-expression
parser (`parse_spec`), and the FairseqDataclass (reference
modules/model.py:21-251) with plain frozen dataclasses that are hashable so
they can be closed over by jitted functions.
"""

from __future__ import annotations

import ast
import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import yaml

# ---------------------------------------------------------------------------
# Safe parsing of spec strings like "[(128, 10, 5)] + [(256, 3, 2)] * 4"
# ---------------------------------------------------------------------------


def _eval_node(node: ast.AST) -> Any:
    if isinstance(node, ast.Expression):
        return _eval_node(node.body)
    if isinstance(node, ast.Constant):
        if isinstance(node.value, (int, float)) or node.value is None:
            return node.value
        raise ValueError(f"disallowed constant in spec: {node.value!r}")
    if isinstance(node, (ast.List, ast.Tuple)):
        vals = [_eval_node(e) for e in node.elts]
        return vals if isinstance(node, ast.List) else tuple(vals)
    if isinstance(node, ast.BinOp) and isinstance(node.op, (ast.Add, ast.Mult)):
        left, right = _eval_node(node.left), _eval_node(node.right)
        return left + right if isinstance(node.op, ast.Add) else left * right
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        return -_eval_node(node.operand)
    if isinstance(node, ast.Name) and node.id in ("None", "none"):
        return None
    raise ValueError(f"disallowed expression in spec: {ast.dump(node)}")


def parse_spec(spec: Any) -> Any:
    """Parse a config spec: list/tuple arithmetic only, no arbitrary eval.

    Replaces the reference's ``eval(cfg.conv_feature_layers)`` etc.
    Accepts already-parsed lists, None, "" and "None".
    """
    if spec is None or spec == "" or spec == "None":
        return None
    if isinstance(spec, (list, tuple)):
        return list(spec)
    return _eval_node(ast.parse(str(spec), mode="eval"))


def conv_spec_tuple(spec: Any) -> Tuple[Tuple[int, int, int], ...]:
    """Parse a conv layer spec into a hashable tuple of (dim, kernel, stride)."""
    parsed = parse_spec(spec)
    if parsed is None:
        return ()
    out = []
    for cl in parsed:
        if len(cl) != 3:
            raise ValueError(f"invalid conv definition: {cl}")
        out.append((int(cl[0]), int(cl[1]), int(cl[2])))
    return tuple(out)


# ---------------------------------------------------------------------------
# Student model config — field-for-field parity with the reference's
# CustomStudentModelConfig (reference modules/model.py:21-251).
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class StudentConfig:
    # Extractor
    extractor_mode: str = "default"  # 'default' | 'layer_norm'
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 2, 2),
        (512, 2, 2),
    )
    conv_bias: bool = False
    feature_grad_mult: float = 1.0

    # Mel front-end alternative
    n_mels: int = 0
    enable_log_mel: bool = False
    mel_spec_head_conv_layers: Tuple[Tuple[int, int, int], ...] = ()

    # Positional conv embedding
    conv_pos: int = 128
    conv_pos_groups: int = 16
    pos_conv_depth: int = 1
    max_positions: int = 100000

    # Encoder geometry
    layer_type: str = "transformer"  # 'transformer' | 'conformer'
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    activation_fn: str = "gelu"
    layer_norm_first: bool = False

    # Conformer
    depthwise_conv_kernel_size: int = 31
    attn_type: str = ""
    pos_enc_type: str = "abs"
    fp16: bool = False

    # Dropouts
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    encoder_layerdrop: float = 0.0
    dropout_input: float = 0.0

    # Output / heads
    final_dim: int = 0
    pred_head_inter_dim: int = 0
    pred_head_final_dim: int = 768
    pred_layer_id: Tuple[int, ...] = (3, 7, 11)
    layerwise_proj: bool = False

    # Time-reduction layer
    enable_tr_layer: bool = True
    tr_reduce_factor: int = 2
    tr_layer_type: str = "fc1"  # 'fc1' | 'fc2' | 'conv1d'
    tr_conv1d_kernel: int = 2
    tr_layer_index: int = 1

    # Teacher init
    init_conv_layers: bool = False
    init_encoder_layers: int = 0

    # Seq-length plumbing
    required_seq_len_multiple: int = 2
    crop_seq_to_multiple: int = 1
    checkpoint_activations: bool = False

    # Driver-injected (reference modules/model.py:241-251)
    teacher_task_agnostic: bool = True
    cnn_weight: float = 0.0

    # TPU-native extras (not in reference)
    use_pallas_attention: bool = True  # flash-attention kernel when no taps needed
    use_pallas_conv: bool = True  # fused conv front-end stack (blocks 1..N)
    # lax.scan over the transformer layers (trace/compile the layer once;
    # per-layer params stacked from the unchanged layers_{i} tree). Numerics
    # identical to the unrolled loop; falls back automatically for init,
    # tgt_slot early exit, conformer blocks, and attn/v_rel tap capture.
    # None = auto: UNROLLED on TPU (scan costs ~4% steps/s — XLA loses
    # inter-layer fusion), SCANNED elsewhere (halves trace/compile time,
    # which dominates CPU tests and debugging loops).
    scan_layers: Optional[bool] = None
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    # int8 MXU matmuls (ops/quant.py) in the encoder layers' qkvo/fc1/fc2.
    # For INFERENCE/serving only — training through round() has zero gradient
    # (Distiller rejects it). The teacher's variant is teacher.quantize_int8.
    quantize_matmuls: bool = False

    @property
    def embed(self) -> int:
        """Feature-extractor output dim (reference modules/model.py:268,287,296)."""
        if self.n_mels > 0:
            if self.mel_spec_head_conv_layers:
                return self.mel_spec_head_conv_layers[-1][0]
            return self.n_mels
        return self.conv_feature_layers[-1][0]

    @property
    def n_tasks(self) -> int:
        return len(self.pred_layer_id)

    @property
    def downsample_rate(self) -> int:
        """Total waveform stride of the front-end (320 for the release config)."""
        if self.n_mels > 0:
            return 320  # mel hop_length (reference modules/model.py:284)
        r = 1
        for _, _, s in self.conv_feature_layers:
            r *= s
        return r

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "StudentConfig":
        """Build from a reference-style `distiller:` YAML section."""
        d = dict(d)
        # reference private-field names
        if "_teacher_task_agnostic" in d:
            d["teacher_task_agnostic"] = bool(d.pop("_teacher_task_agnostic"))
        if "_cnn_weight" in d:
            d["cnn_weight"] = float(d.pop("_cnn_weight"))
        for key in ("conv_feature_layers", "mel_spec_head_conv_layers"):
            if key in d:
                d[key] = conv_spec_tuple(d[key])
        if "pred_layer_id" in d:
            parsed = parse_spec(d["pred_layer_id"])
            d["pred_layer_id"] = tuple(int(i) for i in (parsed or ()))
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(d) - known
        if unknown:
            raise ValueError(f"unknown distiller config keys: {sorted(unknown)}")
        return cls(**d)

    def to_dict(self) -> Dict[str, Any]:
        """Serialize back to the reference YAML field names (for dump_yaml parity)."""
        d = dataclasses.asdict(self)
        d["_teacher_task_agnostic"] = d.pop("teacher_task_agnostic")
        d["_cnn_weight"] = d.pop("cnn_weight")
        d["conv_feature_layers"] = str([tuple(t) for t in self.conv_feature_layers])
        d["mel_spec_head_conv_layers"] = (
            str([tuple(t) for t in self.mel_spec_head_conv_layers])
            if self.mel_spec_head_conv_layers
            else "None"
        )
        d["pred_layer_id"] = str(list(self.pred_layer_id))
        return d


# ---------------------------------------------------------------------------
# Training / optimizer / data configs (reference train: / optimizer: / data:)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LossConfig:
    """The 6-term KD loss weights (reference train.py:55-62, calculate_loss :236-405)."""

    cnn_loss_weight: float = 0.0
    rec_loss_weight: float = 1.0
    rec_loss_type: str = "l1"  # 'l1' | 'mse'
    sim_loss_weight: float = 1.0
    attn_loss_weight: float = 0.0
    attn_loss_type: str = "kldiv"  # 'mse' | 'kldiv'
    v_rel_loss_weight: float = 0.0
    distil_random_layer: int = 0
    random_layer_weight: float = 0.0
    use_gt_for_ctc: bool = True
    ctc_loss_weight: float = 1.0  # applied only for task-specific teachers
    # parity mode reproduces the reference's unmasked loss reductions
    # (reference train.py:284-316 runs means over padded positions)
    masked_reduction: bool = False


@dataclass(frozen=True)
class TrainConfig:
    output_dir: str = "results/pretrain/test"
    checkpoint: Optional[str] = None
    num_epochs: int = 100
    num_devices: int = 0  # 0 = all local devices ('gpus' key in reference yaml)
    batch_size: int = 4
    accumulate_grad_batches: int = 1
    use_fp16: bool = False  # → bf16 compute policy on TPU
    monitor_losses: bool = True
    delete_projections: bool = False
    specaug: bool = False
    early_stop_patience: int = 15
    save_top_k: int = 3
    log_every: int = 50
    seed: int = 0
    max_steps: int = 0  # 0 = no cap (useful for smoke runs)
    profile_steps: int = 0  # trace steps [2, 2+N) into <output_dir>/trace
    # Fuse the grad-accumulation scan into ONE (A*B)-row microbatch when the
    # model has no batch statistics. Mathematically identical for uniform
    # microbatch shapes (mean-of-means == mean; grads are linear), ~25%
    # faster on v5e at the fithubert.yaml geometry (bigger MXU tiles).
    # Disable to reproduce the reference's sequential-accumulation float
    # associativity exactly.
    fuse_grad_accum: bool = True
    # Run K full optimizer steps per device launch (lax.scan over K stacked
    # batch groups in one executable). Byte-identical math to K single
    # launches; amortizes per-launch host/runtime overhead. MEASURED
    # 0.989x (i.e. slightly SLOWER) on the tunneled v5e at the release
    # geometry — launches there already pipeline, and the scan's ~270 MB
    # train-state loop carry costs; keep 1 unless per-launch overhead on
    # your setup is real. Tradeoff at K>1: preemption/stop checks and the
    # preemption checkpoint only run at LAUNCH granularity, so up to K-1
    # optimizer steps execute after a peer host signals stop and the saved
    # step can lag the flag by as much — keep K modest relative to the
    # preemption grace window. 1 = reference-like one-launch-per-step.
    steps_per_launch: int = 1
    # PRNG for the step's dropout/specaug/layerdrop mask streams:
    # 'auto' = hardware rbg on TPU (measured -4.3% step time vs threefry at
    # the release geometry; mask values are arbitrary so the stream swap is
    # semantics-preserving), threefry elsewhere. 'threefry' forces the
    # cross-platform-reproducible default; see utils/rng.py.
    rng_impl: str = "auto"


@dataclass(frozen=True)
class OptimizerConfig:
    name: str = "AdamW_with_schedule"
    lr: float = 2.0e-4
    warmup_proportion: float = 0.07
    betas: Tuple[float, float] = (0.9, 0.98)
    eps: float = 1.0e-6
    weight_decay: float = 1.0e-6


@dataclass(frozen=True)
class DataConfig:
    bucketing_path: str = "./data/len_for_bucket"
    libri_root: str = "../LibriSpeech"
    train_set: Tuple[str, ...] = ("train-clean-100", "train-clean-360", "train-other-500")
    test_set: Tuple[str, ...] = ("test-clean",)
    dev_set: Tuple[str, ...] = ("dev-clean",)
    # TPU extras: quantize padded waveform lengths to multiples of this many
    # samples so XLA sees a small closed set of shapes (SURVEY.md §5.7).
    length_quantum: int = 40960  # 128 frames at stride 320
    max_wav_length: int = 0  # 0 = no crop
    num_workers: int = 4
    prefetch: int = 2
    synthetic: bool = False  # generate sine/noise batches (no corpus needed)
    synthetic_num_batches: int = 64
    synthetic_wav_length: int = 163840
    # Labels for the CTC fine-tune path (task-specific teachers). The
    # reference never loads transcripts (its CTC path is broken, SURVEY.md §4);
    # here LibriSpeech .trans.txt files are read when load_labels is set.
    load_labels: bool = False
    label_quantum: int = 64  # pad label width to multiples of this
    dict_path: str = ""  # letter dict; '' = bundled data/dict.ltr.txt


@dataclass(frozen=True)
class SpecAugConfig:
    """espnet-style SpecAug options (reference utils/specaug.py:27-89)."""

    apply_time_warp: bool = False
    time_warp_window: int = 5
    time_warp_mode: str = "bicubic"
    apply_freq_mask: bool = True
    freq_mask_width_range: Tuple[int, int] = (0, 20)
    num_freq_mask: int = 2
    apply_time_mask: bool = True
    time_mask_width_range: Tuple[int, int] = (0, 100)
    num_time_mask: int = 2
    adaptive: bool = False
    adaptive_number_ratio: float = 0.04
    adaptive_size_ratio: float = 0.04
    max_n_time_masks: int = 20
    replace_with_zero: bool = False


@dataclass(frozen=True)
class TeacherConfig:
    teacher_model: str = "hubert_base_ls960.pt"  # fairseq ckpt path (or converted .msgpack)
    # When the checkpoint is absent (tests, benches) build a randomly
    # initialized teacher with this geometry.
    model_type: str = "hubert"  # 'hubert' | 'wav2vec2' | 'wav2vec_ctc'
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    vocab_size: int = 32  # CTC head dim for wav2vec_ctc
    # Run the frozen teacher's encoder matmuls as dynamic-int8 MXU ops
    # (ops/quant.py): 2x the bf16 MXU rate on v5e, exact training gradients
    # (the teacher is under stop_gradient), bounded quantization error on the
    # distillation targets (opt-in; tests/test_quant.py pins the bound).
    quantize_int8: bool = False


@dataclass(frozen=True)
class ExperimentConfig:
    teacher: TeacherConfig = field(default_factory=TeacherConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    distiller: StudentConfig = field(default_factory=StudentConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    data: DataConfig = field(default_factory=DataConfig)
    specaug: SpecAugConfig = field(default_factory=SpecAugConfig)


_TRAIN_KEYS = {f.name for f in dataclasses.fields(TrainConfig)}
_LOSS_KEYS = {f.name for f in dataclasses.fields(LossConfig)}


def _tupleize(d: Dict[str, Any], cls) -> Dict[str, Any]:
    """Convert yaml lists to tuples for fields typed as tuples."""
    out = dict(d)
    for f in dataclasses.fields(cls):
        if f.name in out and isinstance(out[f.name], list):
            out[f.name] = tuple(out[f.name])
    return out


def load_yaml_config(path: str) -> ExperimentConfig:
    """Load a reference-schema YAML (teacher/train/distiller/optimizer/data/specaug)."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    return config_from_yaml_dict(raw)


def config_from_yaml_dict(raw: Dict[str, Any]) -> ExperimentConfig:
    raw = dict(raw or {})

    teacher_d = dict(raw.get("teacher", {}))
    known_teacher = {f.name for f in dataclasses.fields(TeacherConfig)}
    teacher = TeacherConfig(**{k: v for k, v in teacher_d.items() if k in known_teacher})

    train_d = dict(raw.get("train", {}))
    # reference spellings
    if "gpus" in train_d:
        g = train_d.pop("gpus")
        train_d["num_devices"] = len(g) if isinstance(g, list) else int(g)
    train_d.pop("use_apex", None)
    loss_d = {k: v for k, v in train_d.items() if k in _LOSS_KEYS}
    train_d = {k: v for k, v in train_d.items() if k in _TRAIN_KEYS}
    if "output_dir" in train_d and "/" not in str(train_d["output_dir"]):
        train_d["output_dir"] = "results/pretrain/" + str(train_d["output_dir"])
    train = TrainConfig(**train_d)
    loss = LossConfig(**loss_d)
    if loss.distil_random_layer > 0 and not raw.get("distiller", {}).get(
        "layerwise_proj", False
    ):
        raise ValueError(
            "distil_random_layer > 0 requires layerwise_proj: true — random-"
            "layer distillation gathers per-layer projection heads (the "
            "reference's SplitLinear path cannot serve arbitrary layers)"
        )

    distiller = StudentConfig.from_dict(raw.get("distiller", {}))
    # wire driver-injected fields like the reference does (train.py:42-43)
    distiller = dataclasses.replace(
        distiller,
        cnn_weight=loss.cnn_loss_weight,
        teacher_task_agnostic=(teacher.model_type != "wav2vec_ctc"),
        compute_dtype="bfloat16" if train.use_fp16 else distiller.compute_dtype,
        fp16=train.use_fp16,
    )

    opt_d = _tupleize(raw.get("optimizer", {}), OptimizerConfig)
    known_opt = {f.name for f in dataclasses.fields(OptimizerConfig)}
    optimizer = OptimizerConfig(**{k: v for k, v in opt_d.items() if k in known_opt})

    data_d = _tupleize(raw.get("data", {}), DataConfig)
    known_data = {f.name for f in dataclasses.fields(DataConfig)}
    data = DataConfig(**{k: v for k, v in data_d.items() if k in known_data})
    # task-specific (wav2vec_ctc) teachers need transcripts for GT CTC + WER/CER
    if teacher.model_type == "wav2vec_ctc" and not data.load_labels:
        data = dataclasses.replace(data, load_labels=True)

    spec_d = _tupleize(raw.get("specaug", {}), SpecAugConfig)
    known_spec = {f.name for f in dataclasses.fields(SpecAugConfig)}
    specaug = SpecAugConfig(**{k: v for k, v in spec_d.items() if k in known_spec})

    return ExperimentConfig(
        teacher=teacher, train=train, loss=loss, distiller=distiller,
        optimizer=optimizer, data=data, specaug=specaug,
    )


def timestamp_tag() -> str:
    """Asia/Seoul-timezone run tag (reference utils/utils.py:182-184 uses
    pytz Asia/Seoul; a fixed UTC+9 offset is equivalent — no DST)."""
    from datetime import datetime, timedelta, timezone

    seoul = timezone(timedelta(hours=9))
    return datetime.now(seoul).strftime("%Y-%m-%d-%H%M%S")


def dump_yaml_config(cfg: ExperimentConfig, path: str) -> Dict[str, Any]:
    """Reflect the resolved config back to a reference-compatible YAML file.

    Equivalent of reference utils/utils.py:153-180 — the written file is the
    model-config half of the checkpoint contract consumed by the s3prl expert.
    """
    d = {
        "teacher": dataclasses.asdict(cfg.teacher),
        "train": {**dataclasses.asdict(cfg.train), **dataclasses.asdict(cfg.loss)},
        "distiller": cfg.distiller.to_dict(),
        "optimizer": dataclasses.asdict(cfg.optimizer),
        "data": dataclasses.asdict(cfg.data),
        "specaug": dataclasses.asdict(cfg.specaug),
    }
    for sect in d.values():
        for k, v in list(sect.items()):
            if isinstance(v, tuple):
                sect[k] = list(v)
    with open(path, "w") as f:
        yaml.dump(d, f, sort_keys=False)
    return d
