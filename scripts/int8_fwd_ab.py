"""Teacher FORWARD-only A/B: bf16 vs prequantized int8, isolating the
teacher matmuls from the (unchanged) student grad in the full step."""
import dataclasses, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import bench

def main():
    import jax, jax.numpy as jnp
    platform, kind = bench._acquire_backend(metric="int8_teacher_fwd_ab")
    from fithubert_tpu.config import load_yaml_config
    from fithubert_tpu.models import TeacherGeometry
    from fithubert_tpu.train.step import Distiller
    cfg = load_yaml_config("/root/repo/configs/fithubert.yaml")
    b, t_wav = 12, 12 * 16000
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 16 * 320), jnp.float32)
    out = {"metric": "int8_teacher_fwd_ab", "device_kind": kind}
    sync, fetch_ok = bench._make_sync()
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((b, t_wav)) * 0.1, jnp.float32)
    mask = jnp.zeros((b, t_wav), bool)
    tp_host = None
    for arm in ("bf16", "int8"):
        tg = dataclasses.replace(
            TeacherGeometry.from_teacher_config(cfg.teacher),
            compute_dtype="bfloat16", quantize_int8=(arm == "int8"))
        d = Distiller(cfg, num_training_steps=100, teacher_geometry=tg)
        if tp_host is None:
            tp_host = jax.device_get(d.init_teacher_params(rng, small))
        tp = d.shard_teacher(tp_host)
        if arm == "int8":
            n_int8 = sum(1 for l in jax.tree.leaves(tp) if l.dtype == jnp.int8)
            out["n_int8_kernels"] = n_int8
        @jax.jit
        def fwd(tp, wav, mask):
            o = d.teacher.apply(tp, wav, mask, need_taps=False)
            return o.x
        y = fwd(tp, wav, mask); sync(y)
        y = fwd(tp, wav, mask); sync(y)
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fwd(tp, wav, mask)
        sync(y)
        dt = (time.perf_counter() - t0) / iters
        out[f"teacher_fwd_ms_{arm}"] = round(dt * 1000, 3)
    out["int8_fwd_speedup"] = round(
        out["teacher_fwd_ms_bf16"] / out["teacher_fwd_ms_int8"], 4)
    out["fetch_ok"] = bool(fetch_ok and not sync.degraded)
    print(json.dumps(out), flush=True)

main()
