"""Worker for the multi-host loopback smoke test (spawned by
test_multihost.py, one process per fake host). Exercises the real
jax.distributed DCN path: coordinator handshake, a global mesh spanning both
processes' devices, a cross-process psum, per-host row-striped input
batches assembled with make_array_from_process_local_data, and (when a
corpus is provided) ONE fused KD train step over the global mesh.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fithubert_tpu.parallel.distributed import maybe_initialize
from fithubert_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def _train_step_phase(pid, n, mesh):
    """One fused KD train step on the global mesh, fed from this host's
    row stripe of a shared on-disk corpus (the REAL multi-host data path)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fithubert_tpu.config import (
        DataConfig,
        ExperimentConfig,
        LossConfig,
        StudentConfig,
        TeacherConfig,
        TrainConfig,
    )
    from fithubert_tpu.data.librispeech import BucketedLibriSpeech
    from fithubert_tpu.models import TeacherGeometry
    from fithubert_tpu.train.step import Distiller

    corpus = os.environ["FITHUBERT_TEST_CORPUS"]
    dcfg = DataConfig(
        bucketing_path=os.path.join(corpus, "len_for_bucket"),
        libri_root=corpus, synthetic=False, length_quantum=1000,
        num_workers=1, prefetch=0,
    )
    ds = BucketedLibriSpeech(dcfg, ["train-tiny"], batch_size=4, accum=1,
                             shuffle=False, host_id=pid, num_hosts=n)
    batch = ds.first_batch()
    assert batch["x"].shape[1] == 4 // n, batch["x"].shape  # local row stripe

    slim_conv = ((16, 10, 5), (32, 8, 4))
    cfg = ExperimentConfig(
        teacher=TeacherConfig(teacher_model="", encoder_layers=2,
                              encoder_embed_dim=32, encoder_ffn_embed_dim=64,
                              encoder_attention_heads=4),
        train=TrainConfig(batch_size=2, accumulate_grad_batches=1),
        loss=LossConfig(rec_loss_weight=1.0, rec_loss_type="mse",
                        distil_random_layer=1, random_layer_weight=0.1),
        distiller=StudentConfig(
            conv_feature_layers=slim_conv, conv_pos=16, conv_pos_groups=4,
            encoder_layers=2, encoder_embed_dim=32, encoder_ffn_embed_dim=64,
            encoder_attention_heads=4, dropout=0.0, attention_dropout=0.0,
            dropout_input=0.0, pred_head_final_dim=32, pred_layer_id=(1,),
            layerwise_proj=True, enable_tr_layer=False,
            use_pallas_attention=False, use_pallas_conv=False,
        ),
    )
    tg = TeacherGeometry(
        conv_feature_layers=slim_conv, encoder_layers=2, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_attention_heads=4,
        use_pallas_attention=False, use_pallas_conv=False,
    )
    d = Distiller(cfg, mesh=mesh, num_training_steps=4, teacher_geometry=tg)
    rng = jax.random.PRNGKey(0)
    sample = jnp.asarray(batch["x"][0])
    # identical across hosts (same seed) -> device_put to the global mesh
    tp = d.shard_teacher(d.init_teacher_params(rng, sample))
    state = d.shard_state(d.init_state(jax.random.fold_in(rng, 1), sample))

    sh = NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data"))
    gshape = (1, batch["x"].shape[1] * n, batch["x"].shape[2])
    gbatch = {
        k: jax.make_array_from_process_local_data(sh, np.asarray(v), gshape)
        for k, v in batch.items() if not k.startswith("_")
    }
    state, logs = d.make_train_step()(
        state, tp, gbatch, jnp.zeros((1,), jnp.int32), rng
    )
    loss = float(np.asarray(jax.device_get(logs["loss"])))
    assert np.isfinite(loss), loss
    from jax.experimental import multihost_utils

    losses = np.asarray(multihost_utils.process_allgather(np.float32(loss)))
    assert np.allclose(losses, losses[0]), losses
    return loss


def main():
    pid, n = maybe_initialize()
    assert n == 2, (pid, n)

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 2 * jax.local_device_count(), devs
    mesh = Mesh(np.asarray(devs), ("data",))
    sharding = NamedSharding(mesh, P("data"))

    # each process contributes (pid + 1) per local device row
    local = np.full((jax.local_device_count(), 4), float(pid + 1), np.float32)
    arr = jax.make_array_from_process_local_data(sharding, local)

    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    expect = 4.0 * jax.local_device_count() * (1 + 2)
    got = float(np.asarray(jax.device_get(total)))
    assert got == expect, (got, expect)

    loss = None
    if os.environ.get("FITHUBERT_TEST_CORPUS"):
        mesh2 = Mesh(np.asarray(devs).reshape(len(devs), 1), ("data", "model"))
        loss = _train_step_phase(pid, n, mesh2)

    print(f"WORKER_OK pid={pid} total={got} loss={loss}", flush=True)


if __name__ == "__main__":
    main()
