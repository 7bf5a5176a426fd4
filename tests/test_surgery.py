"""Teacher-init surgery (reference modules/model.py:560-588 equivalents)."""

import jax
import jax.numpy as jnp
import numpy as np

from fithubert_tpu.config import StudentConfig, TeacherConfig
from fithubert_tpu.models import StudentModel, TeacherGeometry, TeacherModel
from fithubert_tpu.models.surgery import init_student_from_teacher

CONV = ((16, 10, 5), (32, 3, 2), (32, 2, 2))


def _build():
    geom = TeacherGeometry(
        conv_feature_layers=CONV, encoder_layers=3, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_attention_heads=4,
        conv_pos=16, conv_pos_groups=4, use_pallas_attention=False,
    )
    teacher = TeacherModel(geometry=geom)
    wav = jnp.zeros((1, 2000))
    mask = jnp.zeros((1, 2000), bool)
    t_vars = teacher.init(jax.random.PRNGKey(0), wav, mask)

    cfg = StudentConfig(
        conv_feature_layers=CONV, conv_pos=16, conv_pos_groups=4,
        encoder_layers=2, encoder_embed_dim=32, encoder_ffn_embed_dim=64,
        encoder_attention_heads=4, dropout=0.0, attention_dropout=0.0,
        dropout_input=0.0, pred_head_final_dim=48, pred_layer_id=(1,),
        layerwise_proj=True, enable_tr_layer=False,
        use_pallas_attention=False,
        init_conv_layers=True, init_encoder_layers=2,
    )
    student = StudentModel(cfg=cfg)
    s_vars = student.init({"params": jax.random.PRNGKey(1)}, wav, mask)
    return cfg, t_vars, s_vars


def test_conv_and_encoder_layers_copied():
    cfg, t_vars, s_vars = _build()
    out = init_student_from_teacher(s_vars["params"], t_vars, cfg, verbose=False)
    t = t_vars["params"]
    np.testing.assert_array_equal(
        out["feature_extractor"]["conv_0"]["kernel"],
        t["feature_extractor"]["conv_0"]["kernel"],
    )
    np.testing.assert_array_equal(
        out["encoder"]["layers_1"]["fc1"]["kernel"],
        t["encoder"]["layers_1"]["fc1"]["kernel"],
    )
    np.testing.assert_array_equal(
        out["encoder"]["pos_conv"]["weight_v"],
        t["encoder"]["pos_conv"]["weight_v"],
    )
    # student-only params untouched
    assert "proj_head_0" in out


def test_shape_mismatch_skipped():
    cfg, t_vars, s_vars = _build()
    # corrupt one teacher tensor's shape: must be skipped, not crash
    t = jax.device_get(t_vars)
    t["params"]["feature_extractor"]["conv_1"]["kernel"] = np.zeros((1, 2, 3))
    before = np.asarray(s_vars["params"]["feature_extractor"]["conv_1"]["kernel"])
    out = init_student_from_teacher(s_vars["params"], t, cfg, verbose=False)
    np.testing.assert_array_equal(out["feature_extractor"]["conv_1"]["kernel"], before)


def test_forward_still_runs_after_surgery():
    cfg, t_vars, s_vars = _build()
    out = init_student_from_teacher(s_vars["params"], t_vars, cfg, verbose=False)
    student = StudentModel(cfg=cfg)
    res = student.apply(
        {"params": out}, jnp.zeros((1, 2000)), jnp.zeros((1, 2000), bool)
    )
    assert np.all(np.isfinite(np.asarray(res.x)))
