"""Same-session in-step A/B of the LN custom VJP (VERDICT r4 #2): two jitted
KD train steps at the fithubert.yaml geometry, identical except
FITHUBERT_LN_VJP at trace time. Interleaved timing rounds to cancel tunnel
drift."""
import dataclasses, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import bench

def main():
    import jax, jax.numpy as jnp
    platform, kind = bench._acquire_backend(metric="ln_vjp_ab")
    from fithubert_tpu.config import load_yaml_config
    from fithubert_tpu.models import TeacherGeometry
    from fithubert_tpu.train.step import Distiller
    from fithubert_tpu.utils.rng import root_step_key

    cfg = load_yaml_config("/root/repo/configs/fithubert.yaml")
    b, accum, t_wav = 3, 4, 12 * 16000
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 16 * 320), jnp.float32)
    sync, fetch_ok = bench._make_sync()

    steps = {}
    states = {}
    tg = dataclasses.replace(TeacherGeometry.from_teacher_config(cfg.teacher),
                             compute_dtype="bfloat16")
    d = Distiller(cfg, num_training_steps=1000, teacher_geometry=tg)
    tp_host = jax.device_get(d.init_teacher_params(rng, small))
    st_host = jax.device_get(d.init_state(jax.random.fold_in(rng, 1), small))
    tp = d.shard_teacher(tp_host)
    np_rng = np.random.default_rng(0)
    batch = {"x": jnp.asarray(np_rng.standard_normal((accum, b, t_wav)) * 0.1, jnp.float32),
             "padding_mask": jnp.zeros((accum, b, t_wav), dtype=bool)}
    rand = jnp.arange(11, dtype=jnp.int32)
    key = root_step_key(0)

    for mode in ("custom", "autodiff"):
        os.environ["FITHUBERT_LN_VJP"] = mode
        step = d.make_train_step()   # fresh trace under this mode
        st = d.shard_state(jax.tree.map(jnp.array, st_host))
        st, logs = step(st, tp, batch, rand, key); sync(logs["loss"])
        steps[mode] = step
        states[mode] = st

    out = {"metric": "ln_vjp_ab", "device_kind": kind}
    # interleaved rounds
    times = {"custom": 0.0, "autodiff": 0.0}
    rounds, iters = 4, 8
    for r in range(rounds):
        for mode in ("custom", "autodiff"):
            os.environ["FITHUBERT_LN_VJP"] = mode
            step, st = steps[mode], states[mode]
            st, logs = step(st, tp, batch, rand, key); sync(logs["loss"])
            t0 = time.perf_counter()
            for _ in range(iters):
                st, logs = step(st, tp, batch, rand, key)
            sync(logs["loss"])
            times[mode] += time.perf_counter() - t0
            states[mode] = st
    n = rounds * iters
    out["steps_per_sec_custom"] = round(n / times["custom"], 3)
    out["steps_per_sec_autodiff"] = round(n / times["autodiff"], 3)
    out["custom_speedup"] = round(times["autodiff"] / times["custom"], 4)
    # numerics: one deterministic eval under each
    ev = {"x": batch["x"][0], "padding_mask": batch["padding_mask"][0]}
    losses = {}
    for mode in ("custom", "autodiff"):
        os.environ["FITHUBERT_LN_VJP"] = mode
        es = d.make_eval_step()
        st = d.shard_state(jax.tree.map(jnp.array, st_host))
        losses[mode] = float(np.asarray(jax.device_get(es(st, tp, ev, rand)["v_loss"])))
    out["eval_loss_custom"] = losses["custom"]
    out["eval_loss_autodiff"] = losses["autodiff"]
    out["fetch_ok"] = bool(fetch_ok and not sync.degraded)
    print(json.dumps(out), flush=True)

main()
