"""KD loss engine parity vs an independent torch oracle.

The oracle re-derives the reference loss semantics (train.py:236-405) from
the equations: elementwise L1/MSE over padded positions, random-layer
down-weighting, -logsigmoid(cosine), per-layer means.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fithubert_tpu.config import LossConfig, StudentConfig
from fithubert_tpu.models.student import StudentOutput
from fithubert_tpu.models.teacher import TeacherOutput
from fithubert_tpu.ops.attention import AttentionTaps
from fithubert_tpu.train import compute_losses

B, L, T, D = 2, 4, 10, 8


def make_outputs(np_rng, n_proj=L, t_student=T):
    teacher_h = [np_rng.standard_normal((B, T, D)).astype(np.float32) for _ in range(L)]
    projections = [
        np_rng.standard_normal((B, t_student, D)).astype(np.float32)
        for _ in range(n_proj)
    ]
    feats_s = np_rng.standard_normal((B, T, D)).astype(np.float32)
    feats_t = np_rng.standard_normal((B, T, D)).astype(np.float32)
    student = StudentOutput(
        x=jnp.asarray(projections[-1]),
        padding_mask=None,
        features=jnp.asarray(feats_s),
        layer_results=[(jnp.asarray(p), AttentionTaps(None, None), None) for p in projections],
        tr_layer_results=[],
        projections=[jnp.asarray(p) for p in projections],
    )
    teacher = TeacherOutput(
        x=jnp.asarray(teacher_h[-1]),
        layer_results=[(jnp.asarray(h), AttentionTaps(None, None), None) for h in teacher_h],
        features=jnp.asarray(feats_t),
        padding_mask=None,
    )
    return student, teacher, teacher_h, projections, feats_s, feats_t


def test_random_layer_mode_matches_oracle(np_rng):
    """fithubert.yaml mode: distil_random_layer=11-like, mse, weight 0.1."""
    student, teacher, th, pr, _, _ = make_outputs(np_rng, t_student=T - 1)
    rand = np.array([0, 2], dtype=np.int32)
    cfg = LossConfig(
        rec_loss_weight=1.0, rec_loss_type="mse", sim_loss_weight=0.0,
        distil_random_layer=2, random_layer_weight=0.1,
    )
    scfg = StudentConfig(encoder_layers=L, layerwise_proj=True)
    out = compute_losses(cfg, scfg, student, teacher, rand_layers=jnp.asarray(rand))

    # oracle (train.py:250-293)
    t_hid = torch.stack(
        [torch.from_numpy(th[i]) for i in rand] + [torch.from_numpy(th[-1])], dim=1
    )
    s_hid = torch.stack(
        [torch.from_numpy(pr[i]) for i in rand] + [torch.from_numpy(pr[-1])], dim=1
    )
    target = t_hid.narrow(2, 0, s_hid.shape[2])
    rec = F.mse_loss(s_hid, target, reduction="none")
    rec[:, :-1] = rec[:, :-1] * 0.1
    layer = rec.mean((0, 2, 3))
    expect = layer.sum()
    np.testing.assert_allclose(float(out.total), float(expect), rtol=1e-5)
    np.testing.assert_allclose(float(out.last_layer_loss), float(layer[-1]), rtol=1e-5)
    np.testing.assert_allclose(float(out.logs["rand_l0"]), float(layer[0]), rtol=1e-5)


def test_random_layer_full_pool_permutation_matches_oracle(np_rng):
    """k = N-1 (the release config) draws the whole intermediate pool: the
    gather is a permutation and compute_losses takes the identity fast path
    (no (B,R,T,D) gather). Must still match the explicit-gather oracle,
    including the slot-ordered rand_l{i} logs."""
    student, teacher, th, pr, _, _ = make_outputs(np_rng, t_student=T - 1)
    rand = np.array([2, 0, 1], dtype=np.int32)  # permutation of range(L-1)
    cfg = LossConfig(
        rec_loss_weight=1.0, rec_loss_type="mse", sim_loss_weight=1.0,
        distil_random_layer=3, random_layer_weight=0.1,
    )
    scfg = StudentConfig(encoder_layers=L, layerwise_proj=True)
    out = compute_losses(cfg, scfg, student, teacher, rand_layers=jnp.asarray(rand))

    # explicit-gather oracle (train.py:250-314)
    t_hid = torch.stack(
        [torch.from_numpy(th[i]) for i in rand] + [torch.from_numpy(th[-1])], dim=1
    )
    s_hid = torch.stack(
        [torch.from_numpy(pr[i]) for i in rand] + [torch.from_numpy(pr[-1])], dim=1
    )
    target = t_hid.narrow(2, 0, s_hid.shape[2])
    rec = F.mse_loss(s_hid, target, reduction="none")
    rec[:, :-1] = rec[:, :-1] * 0.1
    rec_layer = rec.mean((0, 2, 3))
    cos = F.cosine_similarity(s_hid, target, dim=-1)
    sim = -F.logsigmoid(cos)
    sim[:, :-1] = sim[:, :-1] * 0.1
    sim_layer = sim.mean((0, 2))
    layer = rec_layer + sim_layer
    expect = rec_layer.sum() + sim_layer.sum()
    np.testing.assert_allclose(float(out.total), float(expect), rtol=1e-5)
    np.testing.assert_allclose(float(out.last_layer_loss), float(layer[-1]), rtol=1e-5)
    for i in range(3):
        np.testing.assert_allclose(
            float(out.logs[f"rand_l{i}"]), float(layer[i]), rtol=1e-5
        )


def test_fixed_layer_l1_cosine_matches_oracle(np_rng):
    """ex.yaml mode: pred_layer_id=[3,7,11]-style, l1 + sim."""
    ids = (1, 3)
    student, teacher, th, _, _, _ = make_outputs(np_rng)
    # DistilHuBERT-style projections: (B, N, T, D)
    proj = np_rng.standard_normal((B, len(ids), T, D)).astype(np.float32)
    student = student._replace(projections=jnp.asarray(proj))
    cfg = LossConfig(rec_loss_weight=1.0, rec_loss_type="l1", sim_loss_weight=1.0)
    scfg = StudentConfig(encoder_layers=L, layerwise_proj=False, pred_layer_id=ids)
    out = compute_losses(cfg, scfg, student, teacher)

    t_hid = torch.stack([torch.from_numpy(th[i]) for i in ids], dim=1)
    p = torch.from_numpy(proj)
    rec = F.l1_loss(p, t_hid, reduction="none")
    sim = -F.logsigmoid(F.cosine_similarity(p, t_hid, dim=-1))
    expect = rec.mean() + sim.mean()
    np.testing.assert_allclose(float(out.total), float(expect), rtol=1e-5)
    layer_expect = rec.mean((0, 2, 3)) + sim.mean((0, 2))
    np.testing.assert_allclose(
        float(out.logs[f"layer{ids[0]}"]), float(layer_expect[0]), rtol=1e-5
    )


def test_cnn_loss_matches_oracle(np_rng):
    student, teacher, _, _, fs, ft = make_outputs(np_rng)
    cfg = LossConfig(rec_loss_weight=0.0, sim_loss_weight=0.0, cnn_loss_weight=0.5)
    scfg = StudentConfig(encoder_layers=L)
    out = compute_losses(cfg, scfg, student, teacher)
    expect = 0.5 * F.l1_loss(torch.from_numpy(fs), torch.from_numpy(ft))
    np.testing.assert_allclose(float(out.total), float(expect), rtol=1e-5)


def test_attn_and_vrel_losses(np_rng):
    student, teacher, _, _, _, _ = make_outputs(np_rng)
    H = 2
    s_logits = np_rng.standard_normal((B * H, T, T)).astype(np.float32)
    t_logits = np_rng.standard_normal((B * H, T, T)).astype(np.float32)
    s_logits[0, :, -2:] = -np.inf  # padded keys
    t_logits[0, :, -2:] = -np.inf
    s_v = np_rng.standard_normal((B * H, T, T)).astype(np.float32)
    t_v = np_rng.standard_normal((B * H, T, T)).astype(np.float32)

    def with_taps(out, logits, v):
        lr = list(out.layer_results)
        h, _, f = lr[-1]
        lr[-1] = (h, AttentionTaps(jnp.asarray(logits), jnp.asarray(v)), f)
        return out._replace(layer_results=lr)

    student = with_taps(student, s_logits, s_v)
    teacher = teacher._replace(layer_results=[
        (h, AttentionTaps(jnp.asarray(t_logits), jnp.asarray(t_v)), f)
        for (h, _, f) in teacher.layer_results
    ])

    cfg = LossConfig(rec_loss_weight=0.0, sim_loss_weight=0.0,
                     attn_loss_weight=1.0, attn_loss_type="kldiv",
                     v_rel_loss_weight=1.0)
    scfg = StudentConfig(encoder_layers=L)
    out = compute_losses(cfg, scfg, student, teacher)

    # oracle: kldiv with inf-scrub (train.py:342-349) + v_rel kldiv (:358-366)
    pa, ta = torch.from_numpy(s_logits), torch.from_numpy(t_logits)
    l = F.kl_div(F.log_softmax(pa, -1), F.softmax(ta, -1), reduction="none")
    l[l.isinf()] = 0
    l = torch.nan_to_num(l)  # fp: -inf rows yield nan*0 edge; both impls zero them
    attn_expect = l.sum(-1).mean()
    pv, tv = torch.from_numpy(s_v), torch.from_numpy(t_v)
    lv = F.kl_div(F.log_softmax(pv, -1), F.softmax(tv, -1), reduction="none")
    v_expect = lv.sum(-1).mean()
    np.testing.assert_allclose(float(out.logs["attn_loss"]), float(attn_expect), rtol=1e-4)
    np.testing.assert_allclose(float(out.logs["v_rel_loss"]), float(v_expect), rtol=1e-4)


def test_masked_mode_ignores_padding(np_rng):
    """Corrected mode: changing padded-region values must not change the loss."""
    student, teacher, th, pr, _, _ = make_outputs(np_rng)
    pad = np.zeros((B, T), bool)
    pad[1, 6:] = True
    teacher = teacher._replace(padding_mask=jnp.asarray(pad))
    cfg = LossConfig(rec_loss_weight=1.0, rec_loss_type="mse", sim_loss_weight=1.0,
                     masked_reduction=True)
    scfg = StudentConfig(encoder_layers=L, layerwise_proj=True,
                         pred_layer_id=tuple(range(L)))
    out1 = compute_losses(cfg, scfg, student, teacher)

    # corrupt padded region of teacher hiddens
    th2 = [h.copy() for h in th]
    for h in th2:
        h[1, 6:] += 100.0
    teacher2 = teacher._replace(
        layer_results=[(jnp.asarray(h), AttentionTaps(None, None), None) for h in th2]
    )
    out2 = compute_losses(cfg, scfg, student, teacher2)
    np.testing.assert_allclose(float(out1.total), float(out2.total), rtol=1e-6)
