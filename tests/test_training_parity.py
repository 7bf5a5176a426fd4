"""END-TO-END TRAINING parity vs a torch oracle: several optimizer steps of
the full KD pipeline (frozen teacher fwd + student fwd + random-layer MSE
loss + AdamW with the linear warmup/decay schedule) must track a
reference-semantics torch implementation step for step.

This covers what the single-forward oracles cannot: gradient semantics,
AdamW bias correction / decoupled weight decay, and the schedule indexing
(reference optimizer of record: s3prl AdamW_with_schedule consumed at
train.py:12,407-421; loss semantics train.py:249-297).

Note: weight decay is applied to EVERY parameter on both sides here,
mirroring train/optim.py; the release config's wd is 1e-6 so any
no-decay-grouping difference vs s3prl (source not available in this
environment) is negligible at the config of record.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fithubert_tpu.config import (
    ExperimentConfig,
    LossConfig,
    TeacherConfig,
    TrainConfig,
)
from fithubert_tpu.models import TeacherGeometry
from fithubert_tpu.train.step import Distiller
from tests.test_student_full_parity import (
    CFG,
    TRF,
    TorchStudentOracle,
    _reference_state_dict,
)
from tests.test_teacher_full_parity import (
    CONV,
    D,
    FFN,
    HEADS,
    TorchOracle,
    _fairseq_state_dict,
)

STEPS = 4
CURVE_STEPS = 24  # long-horizon curve: past warmup, into the decay phase
LR = 5e-3
WD = 0.01
BETAS = (0.9, 0.98)
EPS = 1e-6
NUM_TRAIN_STEPS = 10
WARMUP_PROP = 0.2  # -> warmup = 2 of 10 steps
RAND_W = 0.1


def _lr_factor_for(num_train_steps: int):
    """Mirror of train/optim.linear_warmup_decay's join_schedules indexing."""

    def factor(step: int) -> float:
        warmup = max(1, int(num_train_steps * WARMUP_PROP))
        if step < warmup:
            return step / warmup
        frac = min(1.0, (step - warmup) / max(1, num_train_steps - warmup))
        return 1.0 - frac

    return factor


def _torch_loss(student, teacher, wav, pad):
    """Reference parity-mode loss: random-layer rec MSE + the
    -logsigmoid(cosine) sim hint, ids=(0,) + final layer, weights
    (RAND_W, 1.0), unmasked means (train.py:249-314) — crops both sides to
    the common length like train/losses.py."""
    import torch.nn.functional as F

    feats_t, hiddens_t, _ = teacher(wav, pad)
    hiddens, projections, _ = student(wav, pad)
    targets = [hiddens_t[0], hiddens_t[-1]]
    preds = [projections[0], projections[-1]]
    loss = 0.0
    for w, p, t in zip((RAND_W, 1.0), preds, targets):
        t_s = min(p.shape[1], t.shape[1])
        p, t = p[:, :t_s], t[:, :t_s].detach()
        loss = loss + w * ((p - t) ** 2).mean()
        cos = F.cosine_similarity(p, t, dim=-1)
        loss = loss + w * (-F.logsigmoid(cos)).mean()
    return loss


@pytest.mark.slow
@pytest.mark.parametrize(
    "steps,num_train_steps,rtol",
    [
        pytest.param(STEPS, NUM_TRAIN_STEPS, 3e-4, id="4step-strict"),
        # BASELINE.md north star (c): distill-LOSS-CURVE parity. 24 optimizer
        # steps spanning warmup AND most of the decay phase; fp32 rounding
        # compounds across steps so the per-point tolerance is looser, and the
        # curve must additionally have descended materially on both sides.
        pytest.param(CURVE_STEPS, 30, 3e-3, id="24step-curve"),
    ],
)
def test_kd_training_steps_match_torch_oracle(tmp_path, steps, num_train_steps, rtol):
    from fithubert_tpu.export.fairseq_import import load_fairseq_teacher
    from fithubert_tpu.export.reference_import import map_student_state_dict

    torch.manual_seed(0)
    t_oracle = TorchOracle().eval()
    for p in t_oracle.parameters():
        p.requires_grad_(False)
    # KD requires the projection dim to equal the teacher dim: rebuild the
    # student oracle with OUT_D = D (the shared module constant is closed
    # over inside __init__)
    import tests.test_student_full_parity as tsp

    prev_out_d = tsp.OUT_D
    tsp.OUT_D = D
    try:
        torch.manual_seed(1)
        s_oracle = TorchStudentOracle().train()
    finally:
        tsp.OUT_D = prev_out_d


    # ---- import both into our models -----------------------------------
    path = str(tmp_path / "teacher.pt")
    torch.save({"model": _fairseq_state_dict(t_oracle), "cfg": None,
                "args": __import__("argparse").Namespace(
                    conv_feature_layers=str([tuple(t) for t in CONV]),
                    encoder_attention_heads=HEADS, activation_fn="gelu",
                    layer_norm_first=False, extractor_mode="default")},
               path)
    teacher_geom, teacher_vars = load_fairseq_teacher(path)
    student_cfg = dataclasses.replace(CFG, pred_head_final_dim=D)
    sd = {k: v for k, v in _reference_state_dict(s_oracle).items()
          if "lin_proj" not in k}
    student_params = map_student_state_dict(sd, student_cfg)
    # reference LayerWiseProjHead SKIPS lin_proj when in_dim == out_dim
    # (modules/module.py:643-647); mirror that in the oracle AFTER the
    # state dict was read
    s_oracle.lin_projs = torch.nn.ModuleList(
        [torch.nn.Identity() for _ in range(2)]
    )

    cfg = ExperimentConfig(
        teacher=TeacherConfig(
            encoder_layers=2, encoder_embed_dim=D, encoder_ffn_embed_dim=FFN,
            encoder_attention_heads=HEADS,
        ),
        train=TrainConfig(batch_size=2, accumulate_grad_batches=1),
        loss=LossConfig(
            rec_loss_weight=1.0, rec_loss_type="mse",
            distil_random_layer=1, random_layer_weight=RAND_W,
        ),
        distiller=student_cfg,
        optimizer=dataclasses.replace(
            ExperimentConfig().optimizer,
            lr=LR, warmup_proportion=WARMUP_PROP, betas=BETAS, eps=EPS,
            weight_decay=WD,
        ),
    )
    d = Distiller(cfg, num_training_steps=num_train_steps,
                  teacher_geometry=teacher_geom)

    rng = np.random.default_rng(7)
    b, t_wav = 2, 4000
    wav_np = rng.standard_normal((b, t_wav)).astype(np.float32) * 0.1
    lengths = np.array([4000, 2600])
    pad_np = np.arange(t_wav)[None, :] >= lengths[:, None]

    # ---- our side: real train steps ------------------------------------
    state = d.init_state(jax.random.PRNGKey(0), jnp.asarray(wav_np))
    state = state.replace(params=student_params)
    batch = {"x": jnp.asarray(wav_np)[None], "padding_mask": jnp.asarray(pad_np)[None]}
    step = d.make_train_step()
    rand = jnp.zeros((1,), jnp.int32)
    ours = []
    for _ in range(steps):
        state, logs = step(state, teacher_vars, batch, rand, jax.random.PRNGKey(3))
        ours.append(float(logs["loss"]))

    # ---- torch side: reference-semantics loop --------------------------
    opt = torch.optim.AdamW(s_oracle.parameters(), lr=LR, betas=BETAS,
                            eps=EPS, weight_decay=WD)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, _lr_factor_for(num_train_steps))
    wav_t = torch.from_numpy(wav_np)
    pad_t = torch.from_numpy(pad_np)
    theirs = []
    for _ in range(steps):
        opt.zero_grad()
        loss = _torch_loss(s_oracle, t_oracle, wav_t, pad_t)
        loss.backward()
        opt.step()
        sched.step()
        theirs.append(float(loss.detach()))

    np.testing.assert_allclose(ours, theirs, rtol=rtol, err_msg=(
        f"KD training curves diverged: ours={ours} torch={theirs}"
    ))
    # losses must actually move (warmup step 0 has lr factor 0)
    assert theirs[-1] != theirs[1]
    if steps >= CURVE_STEPS:
        # curve-parity runs must also DESCEND like a real distillation curve
        assert ours[-1] < 0.7 * ours[0], f"our curve barely moved: {ours}"
        assert theirs[-1] < 0.7 * theirs[0], f"oracle barely moved: {theirs}"
