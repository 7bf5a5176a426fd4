"""Dynamic-int8 matmul path (ops/quant.py): numerics bounds, param-tree
compatibility with nn.Dense, the integer dot in the jaxpr, and the quantized
frozen teacher end to end (teacher.quantize_int8).

The reference's only quantization hook is fairseq quantize_model_scalar at
teacher load (/root/reference/utils/utils.py:13-20,117, a no-op at defaults);
the int8 teacher is the TPU-native realization of that lever (v5e MXU runs
s8xs8->s32 at 2x bf16).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from fithubert_tpu.models import TeacherGeometry, TeacherModel
from fithubert_tpu.ops.quant import QuantDense, int8_matmul

from tests.test_train_step import tiny_cfg, tiny_teacher_geometry


def _cosine(a, b) -> float:
    a = jnp.asarray(a).reshape(-1).astype(jnp.float32)
    b = jnp.asarray(b).reshape(-1).astype(jnp.float32)
    return float(
        jnp.dot(a, b)
        / jnp.maximum(jnp.linalg.norm(a) * jnp.linalg.norm(b), 1e-9)
    )


def test_int8_matmul_close_to_fp32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 37, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(scale=0.02, size=(256, 512)), jnp.float32)
    y = int8_matmul(x, w)
    ref = x @ w
    rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
    # per-token x per-channel int8: ~1% relative error at K=256 for gaussians
    assert rel < 0.03, rel
    # and the quantization must actually bite (guards against the test
    # silently comparing an fp32 fallback to itself)
    assert rel > 1e-5, rel


def test_int8_matmul_zero_rows_are_safe():
    # fabricated all-padding rows are all-zero activations: amax = 0 must not
    # produce NaN/inf via the scale division
    x = jnp.zeros((2, 5, 64), jnp.float32)
    w = jnp.ones((64, 32), jnp.float32)
    y = int8_matmul(x, w)
    assert bool(jnp.all(y == 0.0))


def test_int8_matmul_uses_integer_dot():
    x = jnp.zeros((2, 8, 64), jnp.float32)
    w = jnp.zeros((64, 32), jnp.float32)
    jaxpr = jax.make_jaxpr(int8_matmul)(x, w)
    int8_dots = [
        eqn
        for eqn in jaxpr.jaxpr.eqns
        if eqn.primitive.name == "dot_general"
        and all(v.aval.dtype == jnp.int8 for v in eqn.invars)
        and eqn.outvars[0].aval.dtype == jnp.int32
    ]
    assert int8_dots, "expected an s8 x s8 -> s32 dot_general"


def test_quant_dense_is_dense_dropin():
    """Same param tree as nn.Dense; nn.Dense params apply unchanged."""
    dense = nn.Dense(48, param_dtype=jnp.float32)
    qdense = QuantDense(48, param_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 7, 32))
    variables = dense.init(jax.random.PRNGKey(0), x)
    qvariables = qdense.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(variables) == jax.tree.structure(qvariables)
    assert [l.shape for l in jax.tree.leaves(variables)] == [
        l.shape for l in jax.tree.leaves(qvariables)
    ]
    y = dense.apply(variables, x)
    yq = qdense.apply(variables, x)  # the fp32 params, quantized on the fly
    rel = float(jnp.linalg.norm(yq - y) / jnp.linalg.norm(y))
    assert rel < 0.05, rel


def test_quantized_teacher_close_to_fp():
    """teacher.quantize_int8 flips module classes only — identical param tree,
    bounded output drift across the full 2-layer encoder."""
    geom = tiny_teacher_geometry()
    qgeom = dataclasses.replace(geom, quantize_int8=True)
    teacher = TeacherModel(geometry=geom)
    qteacher = TeacherModel(geometry=qgeom)

    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(jax.random.PRNGKey(2), (2, 4000)) * 0.1
    mask = jnp.zeros(wav.shape, dtype=bool).at[1, 2000:].set(True)

    params = teacher.init(rng, wav, mask)
    qparams = qteacher.init(rng, wav, mask)
    assert jax.tree.structure(params) == jax.tree.structure(qparams)

    out = teacher.apply(params, wav, mask)
    qout = qteacher.apply(params, wav, mask)

    assert _cosine(out.x, qout.x) > 0.99
    for (h, _, _), (qh, _, _) in zip(out.layer_results, qout.layer_results):
        assert _cosine(h, qh) > 0.99
    # `features` is the post_extract_proj hook capture (teacher.py), so the
    # quantized projection shifts it too — bounded like the hiddens
    assert _cosine(out.features, qout.features) > 0.99


@pytest.mark.slow
def test_train_step_with_quantized_teacher():
    """The fused train step runs with an int8 teacher: loss finite, student
    gradients real (the teacher sits under stop_gradient, so round()'s zero
    gradient never touches the student's)."""
    from fithubert_tpu.train.step import Distiller

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, teacher=dataclasses.replace(cfg.teacher, quantize_int8=True)
    )
    geom = dataclasses.replace(tiny_teacher_geometry(), quantize_int8=True)
    d = Distiller(cfg, num_training_steps=10, teacher_geometry=geom)
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (2, 4, 4000)) * 0.1
    batch = {
        "x": wav,
        "padding_mask": jnp.zeros(wav.shape, dtype=bool),
    }
    state = d.init_state(rng, wav[0])
    tparams = d.prepare_teacher_params(d.init_teacher_params(rng, wav[0]))
    step = d.make_train_step()
    new_state, logs = step(state, tparams, batch, jnp.zeros((1,), jnp.int32), rng)
    assert np.isfinite(float(logs["loss"]))
    gnorm = float(logs["grad_norm"])
    assert np.isfinite(gnorm) and gnorm > 0.0


def test_quantized_teacher_under_bf16_compute():
    """Training runs the teacher in bf16 (use_fp16); the quantization math
    must stay fp32-stable on top of bf16 kernels/activations."""
    geom = dataclasses.replace(
        tiny_teacher_geometry(), compute_dtype="bfloat16"
    )
    qgeom = dataclasses.replace(geom, quantize_int8=True)
    wav = jax.random.normal(jax.random.PRNGKey(2), (2, 4000)) * 0.1
    mask = jnp.zeros(wav.shape, dtype=bool)
    params = TeacherModel(geometry=geom).init(jax.random.PRNGKey(0), wav, mask)
    out = TeacherModel(geometry=geom).apply(params, wav, mask)
    qout = TeacherModel(geometry=qgeom).apply(params, wav, mask)
    assert _cosine(out.x, qout.x) > 0.99


def test_int8_upstream_expert(tmp_path):
    """UpstreamExpert(int8=True): the serving path runs quantized and stays
    close to the fp expert on the same export pair."""
    from tests.test_export import STUDENT_CFG

    from fithubert_tpu.config import ExperimentConfig
    from fithubert_tpu.export.expert import UpstreamExpert
    from fithubert_tpu.models import StudentModel
    from fithubert_tpu.train.checkpoint import export_student

    cfg = ExperimentConfig(distiller=STUDENT_CFG)
    model = StudentModel(cfg=cfg.distiller)
    wav = jnp.zeros((1, 4000))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, wav, jnp.zeros((1, 4000), bool)
    )["params"]
    yaml_path, weights_path = export_student(
        cfg, params, str(tmp_path), tag="student"
    )

    wavs = [np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (3000,)) * 0.1, np.float32
    )]
    ref = UpstreamExpert(weights_path, yaml_path, length_quantum=2000)(wavs)
    q = UpstreamExpert(
        weights_path, yaml_path, length_quantum=2000, int8=True
    )(wavs)
    a = np.asarray(ref["last_hidden_state"], np.float32)
    b = np.asarray(q["last_hidden_state"], np.float32)
    assert _cosine(a, b) > 0.99
    assert not np.allclose(a, b)  # the int8 path must actually engage


@pytest.mark.slow  # two full fused-train-step compiles on the 1-core CPU
def test_quantized_teacher_under_tp_mesh_matches_single_device():
    """int8 teacher under a ('data' 4 x 'model' 2) mesh: the per-channel
    weight-scale reductions run over SHARDED kernel axes (row-parallel fc2
    reduces across 'model' shards) — the sharded loss must equal the
    single-device quantized loss."""
    from fithubert_tpu.parallel import make_mesh
    from fithubert_tpu.train.step import Distiller
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tests.test_train_step import make_batch

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, teacher=dataclasses.replace(cfg.teacher, quantize_int8=True)
    )
    geom = dataclasses.replace(tiny_teacher_geometry(), quantize_int8=True)
    rng = jax.random.PRNGKey(0)
    batch = make_batch(rng, b=4)
    rand = jnp.zeros((1,), jnp.int32)

    d1 = Distiller(cfg, mesh=make_mesh(1), num_training_steps=100,
                   teacher_geometry=geom)
    tp1 = d1.prepare_teacher_params(d1.init_teacher_params(rng, batch["x"][0]))
    st1 = d1.init_state(jax.random.PRNGKey(1), batch["x"][0])
    _, logs1 = d1.make_train_step()(st1, tp1, batch, rand, rng)

    mesh = make_mesh(model_axis=2)
    dM = Distiller(cfg, mesh=mesh, num_training_steps=100,
                   teacher_geometry=geom)
    tpM = dM.shard_teacher(dM.init_teacher_params(rng, batch["x"][0]))
    stM = dM.shard_state(dM.init_state(jax.random.PRNGKey(1), batch["x"][0]))
    sh = NamedSharding(mesh, P(None, "data"))
    batchM = jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    _, logsM = dM.make_train_step()(stM, tpM, batchM, rand, rng)

    np.testing.assert_allclose(
        float(logs1["loss"]), float(logsM["loss"]), rtol=2e-5
    )


@pytest.mark.parametrize("pos_enc_type", ["rel_pos", "rope"])
def test_conformer_quantize_engages(pos_enc_type):
    """quantize_matmuls must reach the conformer attention/FFN denses too
    (espnet rel_pos + rope) — int8 serving of a conformer student is not a
    silent no-op."""
    from fithubert_tpu.config import StudentConfig
    from fithubert_tpu.ops.conformer import ConformerEncoder

    def cfg(q):
        return StudentConfig(
            conv_feature_layers=((16, 10, 5),),
            encoder_layers=1,
            encoder_embed_dim=32,
            encoder_ffn_embed_dim=64,
            encoder_attention_heads=4,
            layer_type="conformer",
            pos_enc_type=pos_enc_type,
            attn_type="espnet",
            enable_tr_layer=False,
            dropout=0.0,
            quantize_matmuls=q,
        )

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 32))
    enc = ConformerEncoder(cfg=cfg(False))
    qenc = ConformerEncoder(cfg=cfg(True))
    variables = enc.init(jax.random.PRNGKey(1), x)
    qvariables = qenc.init(jax.random.PRNGKey(1), x)
    assert jax.tree.structure(variables) == jax.tree.structure(qvariables)
    out = enc.apply(variables, x, mutable=["batch_stats"])[0]
    qout = qenc.apply(variables, x, mutable=["batch_stats"])[0]
    assert _cosine(out.x, qout.x) > 0.98
    assert not np.allclose(np.asarray(out.x), np.asarray(qout.x))


def test_student_quantize_matmuls_rejected_for_training():
    from fithubert_tpu.train.step import Distiller

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg,
        distiller=dataclasses.replace(cfg.distiller, quantize_matmuls=True),
    )
    with pytest.raises(ValueError, match="quantize_matmuls"):
        Distiller(cfg, num_training_steps=10)


def test_prequant_dense_matches_dynamic_bitexact():
    """A pre-quantized tree (int8 kernel + kernel_scale) through QuantDense
    must reproduce the dynamic path bit-for-bit: prequantize quantizes from
    the same leaves with the same fp32 math."""
    from fithubert_tpu.ops.quant import prequantize_dense_kernels

    qdense = QuantDense(48, param_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 7, 32))
    variables = qdense.init(jax.random.PRNGKey(0), x)
    y_dyn = qdense.apply(variables, x)
    pre = prequantize_dense_kernels(variables)
    k = pre["params"]["kernel"]
    assert k.dtype == jnp.int8 and k.shape == (32, 48)
    assert pre["params"]["kernel_scale"].shape == (48,)
    assert pre["params"]["kernel_scale"].dtype == jnp.float32
    y_pre = qdense.apply(pre, x)
    np.testing.assert_array_equal(np.asarray(y_dyn), np.asarray(y_pre))


def test_prequantize_skips_excluded_and_nondense():
    """ctc_proj (full-precision by design) and conv kernels (3-D) must pass
    through untouched; idempotent on an already-quantized tree."""
    from fithubert_tpu.ops.quant import prequantize_dense_kernels

    tree = {
        "encoder": {"fc1": {"kernel": jnp.ones((8, 16)), "bias": jnp.ones(16)}},
        "ctc_proj": {"kernel": jnp.ones((8, 32))},
        "conv": {"kernel": jnp.ones((3, 4, 8))},
    }
    out = prequantize_dense_kernels(tree)
    assert out["encoder"]["fc1"]["kernel"].dtype == jnp.int8
    assert "kernel_scale" in out["encoder"]["fc1"]
    assert out["ctc_proj"]["kernel"].dtype == jnp.float32
    assert "kernel_scale" not in out["ctc_proj"]
    assert out["conv"]["kernel"].dtype == jnp.float32
    again = prequantize_dense_kernels(out)
    assert jax.tree.structure(again) == jax.tree.structure(out)


def test_prepare_teacher_params_prequantizes_once():
    """Distiller.prepare_teacher_params with teacher.quantize_int8 emits int8
    kernel leaves + fp32 per-channel scales, and the teacher forward on that
    tree matches the dynamic-quant forward bit-for-bit (same bf16-cast
    source values, same quantization math)."""
    from fithubert_tpu.train.step import Distiller

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, teacher=dataclasses.replace(cfg.teacher, quantize_int8=True)
    )
    geom = dataclasses.replace(
        tiny_teacher_geometry(), quantize_int8=True, compute_dtype="bfloat16"
    )
    d = Distiller(cfg, num_training_steps=10, teacher_geometry=geom)
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(jax.random.PRNGKey(2), (2, 4000)) * 0.1
    mask = jnp.zeros(wav.shape, dtype=bool)
    raw = d.init_teacher_params(rng, wav)
    prepared = d.prepare_teacher_params(raw)

    kinds = {
        l.dtype for l in jax.tree.leaves(prepared)
        if getattr(l, "ndim", 0) == 2
    }
    assert jnp.dtype(jnp.int8) in kinds, "no Dense kernel was pre-quantized"
    n_scales = sum(
        1 for p, _ in jax.tree_util.tree_flatten_with_path(prepared)[0]
        if "kernel_scale" in str(p[-1])
    )
    assert n_scales > 0

    # dynamic arm: same bf16 cast, but kernels left un-quantized
    dyn = dataclasses.replace(d.teacher_geometry, quantize_int8=True)
    cast_only = Distiller(
        dataclasses.replace(
            cfg, teacher=dataclasses.replace(cfg.teacher, quantize_int8=False)
        ),
        num_training_steps=10,
        teacher_geometry=dataclasses.replace(geom, quantize_int8=False),
    ).prepare_teacher_params(raw)

    out_pre = d.teacher.apply(prepared, wav, mask)
    out_dyn = TeacherModel(geometry=dyn).apply(cast_only, wav, mask)
    # The int8 payloads and fp32 scales are identical; the only remaining
    # freedom is XLA reassociating acc*x_scale*w_scale inside fusions, which
    # moves a handful of bf16 outputs by 1 ulp (measured 6/4704 elements).
    a = np.asarray(out_pre.x, np.float32)
    b = np.asarray(out_dyn.x, np.float32)
    np.testing.assert_allclose(a, b, rtol=8e-3)
    assert (a == b).mean() > 0.99, "more than 1%% of outputs moved"
