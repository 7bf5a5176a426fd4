"""On-chip check of the pallas conv bwd: Mosaic compile + grad parity at the
release student spec, then a solo fwd+bwd timing A/B vs the XLA backward."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import bench

def rel(a, b):
    a = np.asarray(a, np.float64); b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9))

def main():
    import jax, jax.numpy as jnp
    platform, kind = bench._acquire_backend(metric="conv_bwd_onchip")
    from fithubert_tpu.ops.pallas.conv_frontend import (
        _reference_stack, _out_len, fused_conv_stack, pick_f_tile)
    import fithubert_tpu.ops.pallas.conv_frontend as cf
    sync, fetch_ok = bench._make_sync()

    spec = ((256, 1, 1),) + ((256, 3, 2),) * 4 + ((512, 1, 1),) + ((512, 2, 2),) * 2
    c0 = 128
    B, T = 12, 38400   # the 12 s student shape post block-0
    f_tile = pick_f_tile(c0, spec, itemsize=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, c0)) * 0.5, jnp.bfloat16)
    ws, cin = [], c0
    for (d, k, _s) in spec:
        ws.append(jnp.asarray(rng.standard_normal((k, cin, d)) / np.sqrt(k * cin), jnp.bfloat16))
        cin = d
    t_out = _out_len(T, spec)
    g = jnp.asarray(rng.standard_normal((B, t_out, spec[-1][0])), jnp.bfloat16)

    out = {"metric": "conv_bwd_onchip", "device_kind": kind, "f_tile": f_tile}

    def make_grad(mode):
        def loss(x, ws):
            os.environ["FITHUBERT_CONV_BWD"] = mode
            y = fused_conv_stack(x, tuple(ws), spec, f_tile, False)
            return jnp.sum(y.astype(jnp.float32) * g.astype(jnp.float32))
        return jax.jit(jax.grad(loss, argnums=(0, 1)))

    # NOTE: env var read at TRACE time -> build separate jits
    grads = {}
    times = {}
    for mode in ("xla", "pallas"):
        os.environ["FITHUBERT_CONV_BWD"] = mode
        fn = make_grad(mode)
        dx, dws = fn(x, tuple(ws)); sync(dx[0, 0, 0])
        dx, dws = fn(x, tuple(ws)); sync(dx[0, 0, 0])
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            dx, dws = fn(x, tuple(ws))
        sync(dx[0, 0, 0])
        times[mode] = (time.perf_counter() - t0) / iters * 1000
        grads[mode] = (jax.device_get(dx), jax.device_get(dws))

    out["dx_rel"] = rel(grads["pallas"][0], grads["xla"][0])
    out["dw_rel_max"] = max(rel(a, b) for a, b in zip(grads["pallas"][1], grads["xla"][1]))
    out["fwd_bwd_ms_xla"] = round(times["xla"], 3)
    out["fwd_bwd_ms_pallas"] = round(times["pallas"], 3)
    out["speedup"] = round(times["xla"] / times["pallas"], 4)
    out["fetch_ok"] = bool(fetch_ok and not sync.degraded)
    print(json.dumps(out), flush=True)

main()
