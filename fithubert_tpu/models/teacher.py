"""Frozen teacher models: HuBERT / wav2vec2 / wav2vec2-CTC geometry in JAX.

The reference loads fairseq checkpoints and harvests intermediates with
forward hooks (reference utils/utils.py:51-149). Here the teacher is a JAX
module sharing the same building blocks as the student (SURVEY.md §7 step 3 —
HuBERT-Base ≈ the student blocks at d=768, no TR layer); its forward returns
the hook-equivalent values explicitly:

  TeacherOutput.x              last encoder hidden (B, T', D)
  TeacherOutput.layer_results  [(hidden, taps, ffn_result)] per layer
  TeacherOutput.features       post_extract_proj output (B, T', D)
  TeacherOutput.ctc_logits     (wav2vec_ctc only) (B, T', V)

Weights come from export/fairseq_import.py. The teacher runs frozen inside
the jitted train step under stop_gradient — no optimizer state, no hooks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fithubert_tpu.config import StudentConfig, TeacherConfig
from fithubert_tpu.ops.conv import ConvFeatureExtractor
from fithubert_tpu.ops.norms import FP32LayerNorm
from fithubert_tpu.ops.padding import (
    feat_extract_output_lengths,
    lengths_to_padding_mask,
    padding_mask_to_lengths,
)
from fithubert_tpu.ops.transformer import TransformerEncoder


@dataclass(frozen=True)
class TeacherGeometry:
    """Geometry of a fairseq wav2vec2/HuBERT teacher (Base defaults)."""

    model_type: str = "hubert"  # 'hubert' | 'wav2vec2' | 'wav2vec_ctc'
    extractor_mode: str = "default"
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 2, 2),
        (512, 2, 2),
    )
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    activation_fn: str = "gelu"
    layer_norm_first: bool = False
    conv_bias: bool = False
    conv_pos: int = 128
    conv_pos_groups: int = 16
    vocab_size: int = 0  # >0 for wav2vec_ctc
    use_pallas_attention: bool = True
    use_pallas_conv: bool = True
    compute_dtype: str = "float32"
    # int8 MXU encoder matmuls (ops/quant.py). Safe on a frozen teacher:
    # gradients never flow through it (stop_gradient in train/step.py), so
    # only the distillation targets carry the (bounded) quantization error.
    quantize_int8: bool = False

    @classmethod
    def from_teacher_config(cls, tc: TeacherConfig) -> "TeacherGeometry":
        return cls(
            model_type=tc.model_type,
            encoder_layers=tc.encoder_layers,
            encoder_embed_dim=tc.encoder_embed_dim,
            encoder_ffn_embed_dim=tc.encoder_ffn_embed_dim,
            encoder_attention_heads=tc.encoder_attention_heads,
            vocab_size=tc.vocab_size if tc.model_type == "wav2vec_ctc" else 0,
            quantize_int8=tc.quantize_int8,
        )

    def to_student_config(self) -> StudentConfig:
        """Encoder-geometry view reusing the student blocks (no TR, no heads).

        The teacher always runs with layerdrop 0 and required_seq_len_multiple 1
        — the reference forces both at load time (utils/utils.py:118,135,146).
        """
        return StudentConfig(
            extractor_mode=self.extractor_mode,
            conv_feature_layers=self.conv_feature_layers,
            conv_bias=self.conv_bias,
            encoder_layers=self.encoder_layers,
            encoder_embed_dim=self.encoder_embed_dim,
            encoder_ffn_embed_dim=self.encoder_ffn_embed_dim,
            encoder_attention_heads=self.encoder_attention_heads,
            activation_fn=self.activation_fn,
            layer_norm_first=self.layer_norm_first,
            conv_pos=self.conv_pos,
            conv_pos_groups=self.conv_pos_groups,
            dropout=0.0,
            attention_dropout=0.0,
            activation_dropout=0.0,
            encoder_layerdrop=0.0,
            dropout_input=0.0,
            enable_tr_layer=False,
            layerwise_proj=False,
            pred_layer_id=(),
            required_seq_len_multiple=1,
            use_pallas_attention=self.use_pallas_attention,
            use_pallas_conv=self.use_pallas_conv,
            compute_dtype=self.compute_dtype,
            quantize_matmuls=self.quantize_int8,
        )


class TeacherOutput(NamedTuple):
    x: jnp.ndarray
    layer_results: List
    features: jnp.ndarray
    padding_mask: Optional[jnp.ndarray]
    ctc_logits: Optional[jnp.ndarray] = None


class TeacherModel(nn.Module):
    geometry: TeacherGeometry

    @nn.compact
    def __call__(
        self,
        source: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        need_taps: bool = False,
    ) -> TeacherOutput:
        g = self.geometry
        dtype = jnp.dtype(g.compute_dtype)
        cfg = g.to_student_config()

        features = ConvFeatureExtractor(
            conv_layers=g.conv_feature_layers,
            mode=g.extractor_mode,
            conv_bias=g.conv_bias,
            use_fused=g.use_pallas_conv,
            dtype=dtype,
            name="feature_extractor",
        )(source.astype(dtype))

        features = FP32LayerNorm(name="layer_norm")(features)

        if padding_mask is not None:
            if g.model_type == "hubert":
                # fairseq HubertModel.forward_padding_mask: crop the wave mask
                # to a multiple of T', view as (B, T', chunk), frame padded iff
                # ALL its samples are padded — off-by-one vs the conv formula
                # at the valid/padded boundary, reproduced exactly
                t_frames = features.shape[1]
                extra = padding_mask.shape[1] % t_frames
                pm = padding_mask[:, : padding_mask.shape[1] - extra] if extra \
                    else padding_mask
                padding_mask = pm.reshape(pm.shape[0], t_frames, -1).all(-1)
            else:
                # wav2vec2 / wav2vec_ctc: _get_feat_extract_output_lengths
                # conv formula (fairseq wav2vec2.py forward)
                lengths = padding_mask_to_lengths(padding_mask)
                out_lengths = feat_extract_output_lengths(
                    lengths, g.conv_feature_layers
                )
                padding_mask = lengths_to_padding_mask(out_lengths, features.shape[1])

        embed = g.conv_feature_layers[-1][0]
        if embed != g.encoder_embed_dim:
            from fithubert_tpu.ops.quant import dense_cls

            # ctc_proj (below) deliberately stays full precision: its argmax
            # seeds CTC pseudo-labels, where a rounding-flipped token is a
            # label error rather than a small regression-target perturbation.
            features = dense_cls(g.quantize_int8)(
                g.encoder_embed_dim, dtype=dtype, param_dtype=jnp.float32,
                name="post_extract_proj",
            )(features)

        post_cnn = features  # hook-equivalent of reference utils/utils.py:71-73

        enc = TransformerEncoder(cfg=cfg, dtype=dtype, name="encoder")(
            features, padding_mask, deterministic=True, need_taps=need_taps
        )

        ctc_logits = None
        # The reference wrapper's 'x' is the LAST HOOK output, not the
        # encoder's final return (utils/utils.py:96): for layer_norm_first
        # teachers this skips the final encoder LayerNorm — reproduced for
        # the DISTILLATION targets. The CTC head is different: fairseq's
        # Wav2VecCtc projects the encoder's true output (post final norm),
        # so ctc_proj stays on enc.x.
        x = enc.layer_results[-1][0] if enc.layer_results else enc.x

        if g.model_type == "wav2vec_ctc" and g.vocab_size > 0:
            ctc_logits = nn.Dense(
                g.vocab_size, dtype=dtype, param_dtype=jnp.float32, name="ctc_proj"
            )(enc.x)

        return TeacherOutput(
            x=x,
            layer_results=enc.layer_results,
            features=post_cnn,
            padding_mask=enc.padding_mask,
            ctc_logits=ctc_logits,
        )
