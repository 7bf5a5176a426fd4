"""The thin-and-deep student model.

Parity target: reference CustomStudentModel (modules/model.py:253-588) —
waveform -> conv features (or log-mel + SpecAug + MelSpecHead) -> fp32
layernorm -> padding-mask recompute via the conv length formula -> optional
projection to d_model -> encoder (12 layers + time-reduction) -> upsample +
projection heads. All byproducts the reference harvests via hooks/monkey-
patches are explicit fields of `StudentOutput`.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from fithubert_tpu.config import SpecAugConfig, StudentConfig
from fithubert_tpu.ops.activations import gelu_exact
from fithubert_tpu.ops.conv import ConvFeatureExtractor, ConvTranspose1D, grad_multiply
from fithubert_tpu.ops.heads import (
    LayerWiseProjHead,
    LayerWiseProjHeadParams,
    MelSpecHead,
    SplitLinear,
    batched_layerwise_proj,
)
from fithubert_tpu.ops.mel import mel_spectrogram
from fithubert_tpu.ops.norms import FP32LayerNorm
from fithubert_tpu.ops.padding import (
    feat_extract_output_lengths,
    lengths_to_padding_mask,
    padding_mask_to_lengths,
)
from fithubert_tpu.ops.specaug import spec_augment
from fithubert_tpu.ops.transformer import TransformerEncoder
from fithubert_tpu.ops.conformer import ConformerEncoder


class StudentOutput(NamedTuple):
    """Mirrors the reference's 6-key forward dict (modules/model.py:545-552)."""

    x: jnp.ndarray  # final output (proj'd 768-d if layerwise, else upsampled d)
    padding_mask: Optional[jnp.ndarray]  # frame-rate (possibly time-reduced)
    features: jnp.ndarray  # post-extractor features to distill (B, T', C)
    layer_results: List  # [(hidden, AttentionTaps, ffn_result)] per layer
    tr_layer_results: List  # outputs of the TR layer
    projections: Optional[jnp.ndarray]  # (B, N, T, D) or list per layer


class StudentModel(nn.Module):
    cfg: StudentConfig
    specaug: Optional[SpecAugConfig] = None
    disable_projections: bool = False  # export mode (reference model.py:393-399)

    def extract_features(
        self,
        source: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        layer: Optional[int] = None,
    ) -> StudentOutput:
        """Reference CustomStudentModel.extract_features (modules/model.py:
        554-558): a deterministic forward, optionally truncated after encoder
        layer-list slot `layer` — the index COUNTS the TR module, exactly like
        the reference's tgt_layer over its torch ModuleList. Use via
        `model.apply(vars, wav, mask, layer, method='extract_features')`."""
        return self(source, padding_mask, deterministic=True, layer=layer)

    @nn.compact
    def __call__(
        self,
        source: jnp.ndarray,  # (B, T_wav)
        padding_mask: Optional[jnp.ndarray] = None,  # (B, T_wav) True = pad
        deterministic: bool = True,
        need_taps: bool = False,
        layer: Optional[int] = None,  # stop after encoder layer `layer`
    ) -> StudentOutput:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)

        # ---- front-end -----------------------------------------------------
        if cfg.n_mels <= 0:
            assert not cfg.enable_log_mel
            features = ConvFeatureExtractor(
                conv_layers=cfg.conv_feature_layers,
                mode=cfg.extractor_mode,
                conv_bias=cfg.conv_bias,
                use_fused=cfg.use_pallas_conv,
                dtype=dtype,
                name="feature_extractor",
            )(source.astype(dtype), deterministic=deterministic)
            if 0 < cfg.feature_grad_mult != 1.0:
                features = grad_multiply(features, cfg.feature_grad_mult)
            elif cfg.feature_grad_mult <= 0:
                features = jax.lax.stop_gradient(features)
        else:
            features = mel_spectrogram(
                source, n_mels=cfg.n_mels, log=cfg.enable_log_mel
            ).astype(dtype)
            if self.specaug is not None and not deterministic:
                features = spec_augment(
                    self.make_rng("specaug"), features, self.specaug
                )
            if cfg.mel_spec_head_conv_layers:
                features = MelSpecHead(
                    conv_layers=cfg.mel_spec_head_conv_layers,
                    dtype=dtype,
                    name="mel_spec_head",
                )(features)

        features = FP32LayerNorm(name="layer_norm")(features)

        # ---- padding-mask recompute (reference modules/model.py:449-470) ---
        if padding_mask is not None:
            input_lengths = padding_mask_to_lengths(padding_mask)
            if cfg.n_mels <= 0:
                output_lengths = feat_extract_output_lengths(
                    input_lengths, cfg.conv_feature_layers
                )
            else:
                output_lengths = 1 + (input_lengths - 400) // 320
            padding_mask = lengths_to_padding_mask(output_lengths, features.shape[1])

        # ---- crop to multiple (reference modules/model.py:474-478) ---------
        drop = features.shape[1] % cfg.crop_seq_to_multiple
        if drop:
            features = features[:, :-drop]
            if padding_mask is not None:
                padding_mask = padding_mask[:, :-drop]

        # ---- post-extract projection ---------------------------------------
        if cfg.embed != cfg.encoder_embed_dim:
            features = nn.Dense(
                cfg.encoder_embed_dim, dtype=dtype, param_dtype=jnp.float32,
                name="post_extract_proj",
            )(features)

        features_to_distill = features
        if cfg.pred_head_final_dim != cfg.encoder_embed_dim and cfg.cnn_weight > 0 \
                and not self.disable_projections:
            h = gelu_exact(features_to_distill)
            features_to_distill = nn.Dense(
                cfg.pred_head_final_dim, dtype=dtype, param_dtype=jnp.float32,
                name="cnn_proj_head",
            )(h)

        features = nn.Dropout(cfg.dropout_input)(features, deterministic=deterministic)

        # ---- encoder --------------------------------------------------------
        encoder_cls = TransformerEncoder
        if cfg.layer_type == "conformer" and cfg.pos_enc_type in ("rel_pos", "rope"):
            encoder_cls = ConformerEncoder
        enc_kwargs = {}
        if layer is not None:
            # both encoders honor the early-exit slot (reference
            # modules/module.py:330-337 and :456-461)
            enc_kwargs["tgt_slot"] = layer
        enc = encoder_cls(cfg=cfg, dtype=dtype, name="encoder")(
            features, padding_mask, deterministic=deterministic,
            need_taps=need_taps, **enc_kwargs,
        )
        x = enc.x

        n_slots = cfg.encoder_layers + (1 if cfg.enable_tr_layer else 0)
        if layer is not None and layer + 1 < n_slots:
            # truncated run: return the raw hidden at `layer` (reference
            # early-exit path); heads are not applied
            return StudentOutput(
                x=x, padding_mask=enc.padding_mask, features=features_to_distill,
                layer_results=enc.layer_results,
                tr_layer_results=enc.tr_layer_results, projections=None,
            )

        # ---- heads ----------------------------------------------------------
        if cfg.layerwise_proj:
            if self.disable_projections:
                # export keeps the last head as final_proj (reference :393-399)
                x = LayerWiseProjHead(
                    in_dim=cfg.encoder_embed_dim,
                    out_dim=cfg.pred_head_final_dim,
                    enable_tr_layer=cfg.enable_tr_layer,
                    tr_reduce_factor=cfg.tr_reduce_factor,
                    dtype=dtype,
                    name=f"proj_head_{cfg.encoder_layers - 1}",
                )(x)
                projections = None
            else:
                hiddens = [
                    enc.layer_results[i][0] for i in range(cfg.encoder_layers)
                ]
                if all(h.shape == hiddens[0].shape for h in hiddens):
                    # all L heads batched into two (L, ...) einsums — identical
                    # param tree and numerics to per-layer LayerWiseProjHeads,
                    # but 2 large MXU matmuls instead of 24 small ones (and the
                    # per-slot loss reduces can no longer fuse a dot each)
                    head_params = [
                        LayerWiseProjHeadParams(
                            in_dim=cfg.encoder_embed_dim,
                            out_dim=cfg.pred_head_final_dim,
                            enable_tr_layer=cfg.enable_tr_layer,
                            tr_reduce_factor=cfg.tr_reduce_factor,
                            name=f"proj_head_{i}",
                        )()
                        for i in range(cfg.encoder_layers)
                    ]
                    projections = batched_layerwise_proj(
                        hiddens, head_params, dtype
                    )  # (B, L, T', D)
                    # x == projections[:, -1], but computed from the last
                    # head alone so forward-only consumers (feature
                    # extraction benches) DCE the 11 unused heads, and
                    # CTC-less training DCEs this x path instead
                    x = batched_layerwise_proj(
                        hiddens[-1:], head_params[-1:], dtype
                    )[:, 0]
                else:
                    # a mid-encoder TR layer (tr_layer_index > 0) leaves the
                    # pre-TR hiddens at a longer frame rate — heads must run
                    # per layer (projections stays a ragged list)
                    projections = [
                        LayerWiseProjHead(
                            in_dim=cfg.encoder_embed_dim,
                            out_dim=cfg.pred_head_final_dim,
                            enable_tr_layer=cfg.enable_tr_layer,
                            tr_reduce_factor=cfg.tr_reduce_factor,
                            dtype=dtype,
                            name=f"proj_head_{i}",
                        )(hiddens[i])
                        for i in range(cfg.encoder_layers)
                    ]
                    x = projections[-1]
        else:
            if cfg.enable_tr_layer:
                x = ConvTranspose1D(
                    features=cfg.encoder_embed_dim,
                    kernel_size=cfg.tr_reduce_factor,
                    stride=cfg.tr_reduce_factor,
                    dtype=dtype,
                    name="upsampler",
                )(x)
            if cfg.n_tasks > 0 and not self.disable_projections:
                inter = (
                    cfg.pred_head_inter_dim
                    if cfg.pred_head_inter_dim > 0
                    else cfg.encoder_embed_dim
                )
                b, t, _ = x.shape
                h = nn.Dense(
                    inter * cfg.n_tasks, dtype=dtype, param_dtype=jnp.float32,
                    name="proj_head_in",
                )(x)
                h = gelu_exact(h)
                pred = SplitLinear(
                    in_dim=inter,
                    in_split=cfg.n_tasks,
                    out_dim=cfg.pred_head_final_dim,
                    dtype=dtype,
                    name="proj_head_split",
                )(h)
                projections = pred.reshape(
                    b, t, cfg.n_tasks, cfg.pred_head_final_dim
                ).transpose(0, 2, 1, 3)  # B x N x T x D
            else:
                projections = None

        return StudentOutput(
            x=x,
            padding_mask=enc.padding_mask,
            features=features_to_distill,
            layer_results=enc.layer_results,
            tr_layer_results=enc.tr_layer_results,
            projections=projections,
        )
