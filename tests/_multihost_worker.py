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
    step_fn = d.make_train_step()
    state, logs = step_fn(state, tp, gbatch, jnp.zeros((1,), jnp.int32), rng)
    loss = float(np.asarray(jax.device_get(logs["loss"])))
    assert np.isfinite(loss), loss
    from jax.experimental import multihost_utils

    losses = np.asarray(multihost_utils.process_allgather(np.float32(loss)))
    assert np.allclose(losses, losses[0]), losses

    _ckpt_roundtrip_phase(d, step_fn, state, tp, gbatch, rng, tag="dp")
    return loss


def _tp_phase(pid, n, mesh):
    """One KD train step + checkpoint roundtrip on a ('data','model')=(1,2)
    mesh: params are TP-sharded ACROSS THE TWO PROCESSES, so neither host
    can device_get the full state — the exact topology where the host-0
    pull-and-save would raise and only the orbax sharded path is correct."""
    import jax.numpy as jnp

    from fithubert_tpu.config import (
        ExperimentConfig, LossConfig, StudentConfig, TeacherConfig, TrainConfig,
    )
    from fithubert_tpu.models import TeacherGeometry
    from fithubert_tpu.train.step import Distiller

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
    wav = jax.random.normal(rng, (2, 4000), jnp.float32)  # same on both hosts
    tp = d.shard_teacher(d.init_teacher_params(rng, wav[0:1]))
    state = d.shard_state(d.init_state(jax.random.fold_in(rng, 1), wav[0:1]))

    # confirm the topology is the interesting one: some param shard spans
    # processes, i.e. is NOT fully addressable from this host
    n_dev = len(jax.devices())
    cross = [
        p for p in jax.tree_util.tree_leaves(state.params)
        if len(p.addressable_shards) < len(p.sharding.device_set)
    ]
    assert n_dev == 2 and cross, "expected cross-process TP-sharded params"

    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(None, "data"))
    gbatch = {
        "x": jax.device_put(wav[None], sh),
        "padding_mask": jax.device_put(jnp.zeros((1, 2, 4000), bool), sh),
    }
    step_fn = d.make_train_step()
    state, logs = step_fn(state, tp, gbatch, jnp.zeros((1,), jnp.int32), rng)
    loss = float(np.asarray(jax.device_get(logs["loss"])))
    assert np.isfinite(loss), loss

    _ckpt_roundtrip_phase(d, step_fn, state, tp, gbatch, rng, tag="tp")
    return loss


def _ckpt_roundtrip_phase(d, step_fn, state, tp, gbatch, rng, tag):
    """Save the global (possibly cross-process-sharded) train state through
    CheckpointManager from EVERY process, restore it into a host-local
    template, and train one more step from the restored state — the
    multi-host preemption/resume leg (train/loop.py:_ckpt_save; VERDICT r3
    #4: the only previously untested part of the failure-recovery story)."""
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from fithubert_tpu.train.checkpoint import CheckpointManager

    ckdir = os.path.join(os.environ["FITHUBERT_TEST_CORPUS"], f"ckpt_{tag}")
    ck = CheckpointManager(ckdir, save_top_k=1)
    step_i = int(np.asarray(jax.device_get(state.step)))
    ck.save(step_i, state, v_loss=1.0)  # global arrays, all processes
    ck.wait()

    # ground truth: the global param values, replicated to every host
    # (tiled=True is required for non-fully-addressable TP shards)
    flat_now, treedef = jax.tree_util.tree_flatten(
        multihost_utils.process_allgather(state.params, tiled=True))

    # restore into a host-local numpy template (the resume path's shape:
    # loop.py restores BEFORE shard_state)
    tmpl = jax.tree.map(
        lambda x: np.zeros(x.shape, x.dtype),
        jax.eval_shape(lambda s: s, state),
    )
    restored = ck.restore(tmpl, step=step_i)
    assert restored is not None
    flat_res = jax.tree_util.tree_flatten(restored.params)[0]
    for a, b in zip(flat_now, flat_res):
        assert np.allclose(np.asarray(a), np.asarray(b)), tag

    # the restored state must train on (shard_state -> one more step;
    # step_fn is the phase's already-compiled executable — a fresh
    # make_train_step() would recompile, which at 2 procs x 1 CPU core
    # pushed the loopback test past its timeout)
    state2 = d.shard_state(restored)
    state2, logs2 = step_fn(
        state2, tp, gbatch, jnp.zeros((1,), jnp.int32), rng
    )
    loss2 = float(np.asarray(jax.device_get(logs2["loss"])))
    assert np.isfinite(loss2), (tag, loss2)
    l2 = np.asarray(multihost_utils.process_allgather(np.float32(loss2)))
    assert np.allclose(l2, l2[0]), (tag, l2)


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

    loss = tp_loss = None
    if os.environ.get("FITHUBERT_TEST_CORPUS"):
        mesh2 = Mesh(np.asarray(devs).reshape(len(devs), 1), ("data", "model"))
        loss = _train_step_phase(pid, n, mesh2)
        mesh3 = Mesh(np.asarray(devs).reshape(1, len(devs)), ("data", "model"))
        tp_loss = _tp_phase(pid, n, mesh3)

    print(f"WORKER_OK pid={pid} total={got} loss={loss} tp_loss={tp_loss}",
          flush=True)


if __name__ == "__main__":
    main()
