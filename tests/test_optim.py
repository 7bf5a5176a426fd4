"""Optimizer schedule parity: s3prl AdamW_with_schedule == HF linear
warmup/decay (reference train.py:407-421, warmup_proportion from the yaml)."""

import numpy as np
import pytest

from fithubert_tpu.config import OptimizerConfig
from fithubert_tpu.train.optim import build_optimizer, linear_warmup_decay


def test_linear_warmup_decay_shape():
    total, lr = 1000, 5e-4
    sched = linear_warmup_decay(lr, total, 0.05)  # 50 warmup steps
    assert float(sched(0)) == 0.0
    assert float(sched(50)) == pytest.approx(lr)
    assert float(sched(25)) == pytest.approx(lr / 2)
    # linear decay to 0 at the end
    assert float(sched(525)) == pytest.approx(lr / 2)
    assert float(sched(1000)) == pytest.approx(0.0, abs=1e-9)


def test_build_optimizer_rejects_unknown():
    with pytest.raises(NotImplementedError):
        build_optimizer(OptimizerConfig(name="sgd"), 100)


def test_adamw_step_moves_params():
    import jax
    import jax.numpy as jnp
    import optax

    tx, _ = build_optimizer(OptimizerConfig(lr=1e-2, warmup_proportion=0.0), 10)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((4,))}
    # step 0 is inside the (minimum 1-step) warmup ramp, so lr(0) == 0;
    # the second step runs at full lr and must move the params
    for _ in range(2):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert not np.allclose(np.asarray(params["w"]), 1.0)
