"""Model-family coverage: conformer (rel_pos / rope / abs), mel front-end +
MelSpecHead, SpecAugment, time-reduction variants, and the student forward
output contract (reference modules/model.py:545-552)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fithubert_tpu.config import SpecAugConfig, StudentConfig
from fithubert_tpu.models import StudentModel

BASE = StudentConfig(
    conv_feature_layers=((16, 10, 5), (32, 8, 4), (32, 4, 4), (32, 4, 4)),
    conv_pos=16,
    conv_pos_groups=4,
    encoder_layers=2,
    encoder_embed_dim=32,
    encoder_ffn_embed_dim=64,
    encoder_attention_heads=4,
    dropout=0.0,
    attention_dropout=0.0,
    dropout_input=0.0,
    pred_head_final_dim=48,
    pred_layer_id=(1,),
    layerwise_proj=True,
    enable_tr_layer=True,
    tr_layer_type="conv1d",
    tr_layer_index=0,
    tr_reduce_factor=2,
    use_pallas_attention=False,
)

WAV = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8000)), jnp.float32)
MASK = jnp.asarray(np.arange(8000)[None, :] >= np.asarray([8000, 5000])[:, None])


def _run(cfg, deterministic=True, rngs_extra=None, **apply_kw):
    model = StudentModel(cfg=cfg, **apply_kw)
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, WAV, MASK)
    call_rngs = rngs_extra or {}
    out, _ = model.apply(
        variables, WAV, MASK, deterministic=deterministic,
        rngs=call_rngs, mutable=["batch_stats"],
    )
    return out


def _frames(t=8000, conv=BASE.conv_feature_layers):
    for (_d, k, st) in conv:
        t = (t - k) // st + 1
    return t


def test_student_output_contract():
    out = _run(BASE)
    t_frames = _frames()
    # layerwise path: x upsampled back to frame rate, proj'd to 48
    assert out.x.shape == (2, t_frames, 48)
    assert out.features.shape[2] == 32  # post_extract_proj output for cnn loss
    assert len(out.layer_results) == 2
    assert len(out.tr_layer_results) == 1
    assert out.tr_layer_results[0].shape[1] == t_frames // 2
    assert out.padding_mask.shape == (2, t_frames // 2)
    # padding mask reduced via any() semantics: item 1 has 5000/8000 valid
    assert int((~out.padding_mask[1]).sum()) < int((~out.padding_mask[0]).sum())
    assert out.projections.shape[1] == 2  # (B, L, T', D) stacked heads


@pytest.mark.parametrize("tr_type", ["fc1", "fc2", "conv1d"])
def test_time_reduction_types(tr_type):
    cfg = dataclasses.replace(BASE, tr_layer_type=tr_type, tr_layer_index=1)
    out = _run(cfg)
    assert out.x.shape[1] == _frames() // 2 * 2
    assert np.all(np.isfinite(np.asarray(out.x)))


def test_no_tr_layer():
    cfg = dataclasses.replace(BASE, enable_tr_layer=False)
    out = _run(cfg)
    t_frames = _frames()
    assert out.layer_results[0][0].shape[1] == t_frames
    assert out.tr_layer_results == []


@pytest.mark.parametrize("pos_enc", ["rel_pos", "rope"])
def test_conformer_encoder(pos_enc):
    cfg = dataclasses.replace(
        BASE, layer_type="conformer", pos_enc_type=pos_enc, attn_type="espnet",
        depthwise_conv_kernel_size=7, enable_tr_layer=False,
    )
    out = _run(cfg)
    assert out.x.shape[1] == _frames()
    assert np.all(np.isfinite(np.asarray(out.x)))
    assert len(out.layer_results) == 2


def test_conformer_abs_inside_transformer_encoder():
    # layer_type=conformer + pos_enc_type=abs routes through TransformerEncoder
    # with conformer blocks (reference modules/module.py:132-143), TR included
    cfg = dataclasses.replace(
        BASE, layer_type="conformer", pos_enc_type="abs",
        depthwise_conv_kernel_size=7,
    )
    out = _run(cfg)
    assert len(out.tr_layer_results) == 1
    assert np.all(np.isfinite(np.asarray(out.x)))


def test_conformer_taps_for_attn_loss():
    cfg = dataclasses.replace(
        BASE, layer_type="conformer", pos_enc_type="rel_pos", attn_type="espnet",
        depthwise_conv_kernel_size=7, enable_tr_layer=False,
    )
    model = StudentModel(cfg=cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, WAV, MASK)
    out, _ = model.apply(variables, WAV, MASK, need_taps=True,
                         mutable=["batch_stats"])
    taps = out.layer_results[-1][1]
    t = out.x.shape[1]
    assert taps.attn_logits.shape == (2 * 4, t, t)
    assert taps.v_rel.shape == (2 * 4, t, t)


def test_mel_frontend_with_head():
    cfg = dataclasses.replace(
        BASE, n_mels=40, enable_log_mel=True,
        mel_spec_head_conv_layers=((24, 5, 1), (32, 3, 1)),
        conv_feature_layers=(),
    )
    out = _run(cfg)
    t_frames = 1 + (8000 - 400) // 320
    # crop_seq_to_multiple=1 -> frames as computed by the mel formula
    assert out.x.shape[1] in (t_frames, t_frames - t_frames % 2)
    assert np.all(np.isfinite(np.asarray(out.x)))


def test_mel_frontend_specaug_changes_features():
    cfg = dataclasses.replace(
        BASE, n_mels=40, enable_log_mel=False, mel_spec_head_conv_layers=(),
        conv_feature_layers=(),
    )
    sa = SpecAugConfig(apply_time_mask=True, apply_freq_mask=True,
                       replace_with_zero=True,
                       time_mask_width_range=(5, 10), num_time_mask=2,
                       freq_mask_width_range=(5, 10), num_freq_mask=2)
    model_plain = StudentModel(cfg=cfg)
    variables = model_plain.init({"params": jax.random.PRNGKey(0)}, WAV, MASK)
    out_det, _ = model_plain.apply(variables, WAV, MASK, deterministic=True,
                                   mutable=["batch_stats"])
    model_aug = StudentModel(cfg=cfg, specaug=sa)
    out_aug, _ = model_aug.apply(
        variables, WAV, MASK, deterministic=False,
        rngs={"specaug": jax.random.PRNGKey(3),
              "dropout": jax.random.PRNGKey(4),
              "layerdrop": jax.random.PRNGKey(5)},
        mutable=["batch_stats"],
    )
    assert not np.allclose(np.asarray(out_det.features),
                           np.asarray(out_aug.features))


def test_splitlinear_head_path():
    cfg = dataclasses.replace(
        BASE, layerwise_proj=False, pred_layer_id=(0, 1),
        pred_head_inter_dim=16,
    )
    out = _run(cfg)
    # (B, N_tasks, T, D) projections (reference modules/model.py:508-516)
    assert out.projections.shape[1] == 2
    assert out.projections.shape[3] == 48


def test_layerdrop_rng():
    cfg = dataclasses.replace(BASE, encoder_layerdrop=0.5)
    model = StudentModel(cfg=cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, WAV, MASK)
    outs = []
    for seed in (0, 1, 2, 3):
        out, _ = model.apply(
            variables, WAV, MASK, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(9),
                  "layerdrop": jax.random.PRNGKey(seed),
                  "specaug": jax.random.PRNGKey(9)},
            mutable=["batch_stats"],
        )
        outs.append(np.asarray(out.x))
    # different layerdrop keys must produce at least two distinct outputs
    assert any(not np.allclose(outs[0], o) for o in outs[1:])


def test_row_masked_batchnorm_ignores_fake_rows():
    """Conformer BatchNorm statistics must exclude fabricated all-padding
    rows — the reference's partial buckets never contain them."""
    from fithubert_tpu.ops.conformer import RowMaskedBatchNorm

    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.standard_normal((2, 6, 8)), jnp.float32)
    fake = jnp.full((1, 6, 8), 3.7, jnp.float32)  # a garbage fabricated row
    padded = jnp.concatenate([real, fake], axis=0)

    bn = RowMaskedBatchNorm()
    v = bn.init(jax.random.PRNGKey(0), real, use_running_average=False)

    def run(x, rv):
        y, updated = bn.apply(
            v, x, row_valid=rv, use_running_average=False,
            mutable=["batch_stats"],
        )
        return y, updated["batch_stats"]

    y_real, bs_real = run(real, None)
    rv = jnp.asarray([True, True, False])
    y_padded, bs_padded = run(padded, rv)
    np.testing.assert_allclose(
        np.asarray(y_padded[:2]), np.asarray(y_real), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(bs_padded["mean"]), np.asarray(bs_real["mean"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(bs_padded["var"]), np.asarray(bs_real["var"]), rtol=1e-5
    )


def test_large_teacher_geometry_constructs():
    """HuBERT/WavLM-Large-shaped teacher (24 x 1024, pre-LN, layer_norm
    extractor, biased convs) traces end to end — the BASELINE stretch
    target's geometry. eval_shape only: no compile, stays in the fast tier
    (the layer semantics at this architecture are covered by the pre-LN /
    layer_norm-mode golden-parity teacher tests)."""
    from fithubert_tpu.models import TeacherGeometry, TeacherModel

    geom = TeacherGeometry(
        model_type="hubert", extractor_mode="layer_norm",
        layer_norm_first=True, encoder_layers=24, encoder_embed_dim=1024,
        encoder_ffn_embed_dim=4096, encoder_attention_heads=16,
        conv_bias=True, use_pallas_attention=False, use_pallas_conv=False,
    )
    model = TeacherModel(geometry=geom)
    wav = jnp.zeros((1, 16000), jnp.float32)
    mask = jnp.zeros((1, 16000), bool)
    out = jax.eval_shape(
        lambda w, m: model.init(jax.random.PRNGKey(0), w, m), wav, mask
    )
    assert "params" in out
    shapes = jax.eval_shape(
        lambda v, w, m: model.apply(v, w, m),
        out, wav, mask,
    )
    assert shapes.x.shape == (1, 49, 1024)
    assert len(shapes.layer_results) == 24
