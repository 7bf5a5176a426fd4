"""checkpoint_activations (remat) must not change values or gradients —
it only trades FLOPs for memory (reference wraps layers in fairseq
checkpoint_wrapper, modules/module.py:144-145)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_model_families import BASE, MASK, WAV
from fithubert_tpu.models import StudentModel


@pytest.mark.parametrize("layer_type,pos_enc", [("transformer", "abs"),
                                                ("conformer", "abs")])
def test_remat_preserves_values_and_grads(layer_type, pos_enc):
    cfg0 = dataclasses.replace(
        BASE, layer_type=layer_type, pos_enc_type=pos_enc,
        depthwise_conv_kernel_size=7, checkpoint_activations=False,
    )
    cfg1 = dataclasses.replace(cfg0, checkpoint_activations=True)
    m0, m1 = StudentModel(cfg=cfg0), StudentModel(cfg=cfg1)
    variables = m0.init({"params": jax.random.PRNGKey(0)}, WAV, MASK)

    def loss(m):
        def f(params):
            out, _ = m.apply(
                {**variables, "params": params}, WAV, MASK,
                mutable=["batch_stats"],
            )
            return jnp.sum(out.x.astype(jnp.float32) ** 2) * 1e-3
        return f

    v0, g0 = jax.value_and_grad(loss(m0))(variables["params"])
    v1, g1 = jax.value_and_grad(loss(m1))(variables["params"])
    assert np.isclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
