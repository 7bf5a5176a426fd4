"""Real released-artifact imports, gated on existence (VERDICT round-1 #3).

The reference publishes FitHuBERT-100h/960h and FitW2V2-960h Lightning
checkpoints (reference README.md:34-45) and consumes the fairseq
`hubert_base_ls960.pt` teacher (utils/utils.py:102-149). None are reachable
in this zero-egress container, so these tests SKIP unless an artifact is
dropped into one of the search paths — then they run the full import +
forward immediately, with no code changes.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

SEARCH_DIRS = [
    os.environ.get("FITHUBERT_CKPT_DIR", ""),
    "/root/checkpoints",
    "/root/repo/checkpoints",
    os.path.expanduser("~/checkpoints"),
]


def _find(*names):
    for d in SEARCH_DIRS:
        if not d:
            continue
        for n in names:
            p = os.path.join(d, n)
            if os.path.exists(p):
                return p
    return None


def test_import_real_hubert_base_teacher():
    path = _find("hubert_base_ls960.pt")
    if path is None:
        pytest.skip("hubert_base_ls960.pt not present (zero-egress container)")
    from fithubert_tpu.export.fairseq_import import load_fairseq_teacher
    from fithubert_tpu.models import TeacherModel

    geom, variables = load_fairseq_teacher(path)
    assert geom.model_type == "hubert"
    assert geom.encoder_layers == 12 and geom.encoder_embed_dim == 768
    model = TeacherModel(geometry=geom)
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 16000)), jnp.float32
    )
    out = model.apply(variables, wav, jnp.zeros((1, 16000), bool))
    assert out.x.shape == (1, 49, 768)
    assert np.isfinite(np.asarray(out.x)).all()


@pytest.mark.parametrize("name", [
    "FitHuBERT-100h.ckpt", "FitHuBERT-960h.ckpt", "FitW2V2-960h.ckpt",
])
def test_import_real_released_student(name):
    path = _find(name)
    yaml_path = _find(name.replace(".ckpt", ".yaml"))
    if path is None or yaml_path is None:
        pytest.skip(f"{name} (+yaml) not present (zero-egress container)")
    from fithubert_tpu.export.expert import UpstreamExpert

    expert = UpstreamExpert(path, yaml_path)
    wavs = [np.random.default_rng(0).standard_normal(16000).astype(np.float32)]
    out = expert(wavs)
    assert out["last_hidden_state"].shape[-1] == 768
    assert np.isfinite(np.asarray(out["last_hidden_state"])).all()
