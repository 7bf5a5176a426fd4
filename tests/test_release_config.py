"""Integration: the shipped FitHuBERT-960h release config constructs the full
Distiller and runs one fused train step on the (CPU-simulated) 2-device
data-parallel mesh — the exact yaml a user trains with."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fithubert_tpu.config import load_yaml_config
from fithubert_tpu.parallel import make_mesh
from fithubert_tpu.train.step import Distiller


@pytest.mark.slow
def test_fithubert_yaml_one_step():
    cfg = load_yaml_config("configs/fithubert.yaml")
    assert cfg.distiller.encoder_embed_dim == 480
    assert cfg.distiller.encoder_layers == 12
    assert cfg.loss.distil_random_layer == 11

    mesh = make_mesh(2)  # 'gpus: 2' in the config -> 2-way data parallel
    distiller = Distiller(cfg, mesh=mesh, num_training_steps=10)

    accum, b, t_wav = cfg.train.accumulate_grad_batches, 2, 8000
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((accum, b, t_wav)), jnp.float32)
    mask = jnp.zeros((accum, b, t_wav), bool)

    key = jax.random.PRNGKey(0)
    teacher_params = distiller.shard_teacher(
        distiller.init_teacher_params(key, wav[0])
    )
    state = distiller.shard_state(
        distiller.init_state(jax.random.fold_in(key, 1), wav[0])
    )
    step = distiller.make_train_step()
    rand = jnp.arange(cfg.loss.distil_random_layer, dtype=jnp.int32)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(None, "data"))
    batch = {"x": jax.device_put(wav, sh), "padding_mask": jax.device_put(mask, sh)}
    state, logs = step(state, teacher_params, batch, rand, key)
    assert np.isfinite(float(logs["loss"]))
    # reference logging keys: rand_l{i} for each sampled layer + l11
    assert "l11" in logs and "rand_l0" in logs and "rand_l10" in logs


@pytest.mark.parametrize(
    "name", ["fithubert", "fitwav2vec2", "ex", "smoke", "smoke_ctc"]
)
def test_shipped_config_constructs(name):
    """Every shipped YAML parses and its student traces (eval_shape only —
    no compile, so this stays in the fast tier)."""
    from fithubert_tpu.models import StudentModel

    cfg = load_yaml_config(f"configs/{name}.yaml")
    model = StudentModel(cfg=cfg.distiller)
    wav = jnp.zeros((1, 6400), jnp.float32)
    mask = jnp.zeros((1, 6400), bool)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), wav, mask
    )
    assert "params" in shapes


@pytest.mark.parametrize("name", ["fithubert", "fitwav2vec2", "ex"])
def test_reference_yaml_parses_unchanged(name):
    """The reference's own config files load through our schema verbatim
    (reference data/conf/*.yaml — the compatibility contract)."""
    import os

    path = f"/root/reference/data/conf/{name}.yaml"
    if not os.path.exists(path):
        pytest.skip("reference tree not present")
    cfg = load_yaml_config(path)
    assert cfg.distiller.encoder_layers > 0


@pytest.mark.slow
@pytest.mark.parametrize("name", ["ex", "fitwav2vec2"])
def test_other_release_configs_one_step(name):
    """One fused train step for the other two shipped release configs:
    ex.yaml (DistilHuBERT-style SplitLinear head + teacher init + L1+cosine)
    and fitwav2vec2.yaml (wav2vec2 teacher -> conv-formula frame mask)."""
    import dataclasses

    import numpy as np_

    from fithubert_tpu.models import TeacherGeometry
    from fithubert_tpu.models.surgery import init_student_from_teacher

    cfg = load_yaml_config(f"configs/{name}.yaml")
    teacher_geom = TeacherGeometry.from_teacher_config(cfg.teacher)
    if name == "fitwav2vec2":
        assert cfg.teacher.model_type == "wav2vec2"
        assert teacher_geom.model_type == "wav2vec2"

    mesh = make_mesh(1)
    distiller = Distiller(cfg, mesh=mesh, num_training_steps=10,
                          teacher_geometry=teacher_geom)

    accum = cfg.train.accumulate_grad_batches
    b, t_wav = 2, 8000
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((accum, b, t_wav)), jnp.float32)
    mask = jnp.zeros((accum, b, t_wav), bool).at[:, -1, t_wav // 2:].set(True)

    key = jax.random.PRNGKey(0)
    teacher_params = distiller.init_teacher_params(key, wav[0])
    state = distiller.init_state(jax.random.fold_in(key, 1), wav[0])
    if cfg.distiller.init_conv_layers or cfg.distiller.init_encoder_layers:
        params = init_student_from_teacher(
            state.params, teacher_params["params"], cfg.distiller,
        )
        state = state.replace(params=params)

    rand = (jnp.arange(cfg.loss.distil_random_layer, dtype=jnp.int32)
            if cfg.loss.distil_random_layer > 0 else jnp.zeros((0,), jnp.int32))
    step = distiller.make_train_step()
    state, logs = step(state, teacher_params,
                       {"x": wav, "padding_mask": mask}, rand, key)
    assert np_.isfinite(float(logs["loss"]))
