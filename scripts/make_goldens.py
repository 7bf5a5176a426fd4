#!/usr/bin/env python
"""Generate the torch-free golden regression tensors (tests/goldens/*.npz).

VERDICT r3 #6: the torch-oracle parity tests pin numerics only where torch
is importable, and a refactor that shifts oracle and implementation together
would pass them silently. These goldens freeze tiny fixed-seed outputs of
the CURRENT implementation into the repo so any later numeric drift fails
`tests/test_goldens.py` even in a torch-free environment.

Regenerate (and review the diff deliberately!) only when an INTENDED
numerics change lands:

    python scripts/make_goldens.py

Everything runs on CPU with threefry keys and deterministic=True forwards
(the train step uses the same fixed key the test passes), so the values are
reproducible across sessions. Tolerances in the test absorb XLA:CPU
re-fusion noise across jax versions.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens")


def build():
    """The shared tiny geometry + inputs (also imported by the test)."""
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
                        sim_loss_weight=1.0,
                        distil_random_layer=1, random_layer_weight=0.1),
        distiller=StudentConfig(
            conv_feature_layers=slim_conv, conv_pos=16, conv_pos_groups=4,
            encoder_layers=2, encoder_embed_dim=32, encoder_ffn_embed_dim=64,
            encoder_attention_heads=4, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0, encoder_layerdrop=0.0, dropout_input=0.0,
            pred_head_final_dim=32, pred_layer_id=(1,), layerwise_proj=True,
            enable_tr_layer=False, required_seq_len_multiple=1,
            use_pallas_attention=False, use_pallas_conv=False,
        ),
    )
    tg = TeacherGeometry(
        conv_feature_layers=slim_conv, encoder_layers=2, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_attention_heads=4,
        use_pallas_attention=False, use_pallas_conv=False,
    )
    d = Distiller(cfg, num_training_steps=8, teacher_geometry=tg)

    np_rng = np.random.default_rng(42)
    wav = jnp.asarray(np_rng.standard_normal((2, 4000)) * 0.1, jnp.float32)
    mask = jnp.zeros((2, 4000), bool)
    mask = mask.at[1, 3200:].set(True)  # one partially-padded row

    rng = jax.random.PRNGKey(0)
    tp = d.init_teacher_params(rng, wav)
    state = d.init_state(jax.random.fold_in(rng, 1), wav)
    return d, tp, state, wav, mask


def build_conformer():
    """Tiny conformer (espnet rel_pos) student — pins the r4 quirk-heavy
    path: rel_shift, macaron FFN halves, row-masked BatchNorm
    (reference modules/module.py:386-469 via fairseq conformer layers)."""
    from fithubert_tpu.config import StudentConfig
    from fithubert_tpu.models import StudentModel

    cfg = StudentConfig(
        conv_feature_layers=((16, 10, 5), (32, 8, 4)),
        conv_pos=16, conv_pos_groups=4,
        encoder_layers=2, encoder_embed_dim=32, encoder_ffn_embed_dim=64,
        encoder_attention_heads=4, layer_type="conformer",
        pos_enc_type="rel_pos", attn_type="espnet", depthwise_conv_kernel_size=7,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        encoder_layerdrop=0.0, dropout_input=0.0,
        pred_head_final_dim=32, pred_layer_id=(1,), layerwise_proj=True,
        enable_tr_layer=False, required_seq_len_multiple=1,
        use_pallas_attention=False, use_pallas_conv=False,
    )
    model = StudentModel(cfg=cfg)
    np_rng = np.random.default_rng(21)
    wav = jnp.asarray(np_rng.standard_normal((2, 4000)) * 0.1, jnp.float32)
    mask = jnp.zeros((2, 4000), bool).at[1, 3200:].set(True)
    variables = model.init(
        {"params": jax.random.PRNGKey(3)}, wav, mask)
    return model, variables, wav, mask


def build_ctc():
    """Tiny wav2vec_ctc distillation — pins the sequence-transduction path:
    teacher ctc_proj -> argmax pseudo-labels -> collapse_pseudo_labels ->
    optax CTC in the fused step (reference train.py:380-403, the path that
    CRASHES in the reference; SURVEY §4)."""
    from fithubert_tpu.config import (
        ExperimentConfig, LossConfig, StudentConfig, TeacherConfig, TrainConfig,
    )
    from fithubert_tpu.train.step import Distiller

    cfg = ExperimentConfig(
        teacher=TeacherConfig(
            teacher_model="", model_type="wav2vec_ctc", encoder_layers=2,
            encoder_embed_dim=32, encoder_ffn_embed_dim=64,
            encoder_attention_heads=4, vocab_size=32,
        ),
        train=TrainConfig(batch_size=2, accumulate_grad_batches=1),
        loss=LossConfig(
            rec_loss_weight=1.0, rec_loss_type="l1", sim_loss_weight=0.0,
            distil_random_layer=0, ctc_loss_weight=1.0,
            use_gt_for_ctc=False,  # pseudo-label path: collapse included
        ),
        distiller=StudentConfig(
            conv_feature_layers=((16, 10, 5), (32, 8, 4), (32, 4, 4), (32, 4, 4)),
            conv_pos=16, conv_pos_groups=4,
            encoder_layers=2, encoder_embed_dim=32, encoder_ffn_embed_dim=64,
            encoder_attention_heads=4, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0, encoder_layerdrop=0.0, dropout_input=0.0,
            pred_head_final_dim=32, pred_layer_id=(1,), layerwise_proj=True,
            enable_tr_layer=True, tr_layer_type="conv1d", tr_layer_index=0,
            tr_reduce_factor=2, required_seq_len_multiple=1,
            use_pallas_attention=False, use_pallas_conv=False,
            teacher_task_agnostic=False,
        ),
    )
    d = Distiller(cfg, num_training_steps=8)
    np_rng = np.random.default_rng(11)
    wav = jnp.asarray(np_rng.standard_normal((2, 6400)) * 0.1, jnp.float32)
    mask = jnp.zeros((2, 6400), bool)
    mask = mask.at[1, 4800:].set(True)
    rng = jax.random.PRNGKey(5)
    tp = d.init_teacher_params(rng, wav)
    state = d.init_state(jax.random.fold_in(rng, 1), wav)
    return d, tp, state, wav, mask


def _variant_base():
    from fithubert_tpu.config import StudentConfig

    return StudentConfig(
        conv_feature_layers=((16, 10, 5), (32, 8, 4), (32, 4, 4), (32, 4, 4)),
        conv_pos=16, conv_pos_groups=4,
        encoder_layers=2, encoder_embed_dim=32, encoder_ffn_embed_dim=64,
        encoder_attention_heads=4, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, encoder_layerdrop=0.0, dropout_input=0.0,
        pred_head_final_dim=48, pred_layer_id=(1,), layerwise_proj=True,
        enable_tr_layer=True, tr_layer_type="conv1d", tr_layer_index=0,
        tr_reduce_factor=2, required_seq_len_multiple=1,
        use_pallas_attention=False, use_pallas_conv=False,
    )


def build_mel():
    """Mel front-end + MelSpecHead (the reference's alternative extractor,
    modules/model.py:276-296 + module.py:664-701) — torchaudio center=False
    HTK semantics pinned torch-free."""
    import dataclasses

    from fithubert_tpu.models import StudentModel

    cfg = dataclasses.replace(
        _variant_base(), n_mels=40, enable_log_mel=True,
        mel_spec_head_conv_layers=((24, 5, 1), (32, 3, 1)),
        conv_feature_layers=(),
    )
    model = StudentModel(cfg=cfg)
    np_rng = np.random.default_rng(31)
    wav = jnp.asarray(np_rng.standard_normal((2, 8000)) * 0.1, jnp.float32)
    mask = jnp.zeros((2, 8000), bool).at[1, 6400:].set(True)
    variables = model.init({"params": jax.random.PRNGKey(13)}, wav, mask)
    return model, variables, wav, mask


def build_tr_fc1():
    """fc1 time-reduction (concat 2 frames -> linear; the type that CRASHES
    on GPU in the reference, modules/module.py:360-379 + SURVEY §4)."""
    import dataclasses

    from fithubert_tpu.models import StudentModel

    cfg = dataclasses.replace(_variant_base(), tr_layer_type="fc1")
    model = StudentModel(cfg=cfg)
    np_rng = np.random.default_rng(37)
    wav = jnp.asarray(np_rng.standard_normal((2, 6400)) * 0.1, jnp.float32)
    mask = jnp.zeros((2, 6400), bool).at[1, 4800:].set(True)
    variables = model.init({"params": jax.random.PRNGKey(17)}, wav, mask)
    return model, variables, wav, mask


def main():
    d, tp, state, wav, mask = build()
    os.makedirs(OUT, exist_ok=True)

    # ---- teacher forward ---------------------------------------------------
    t_out = d.teacher.apply(tp, wav, mask, need_taps=False)
    hiddens = np.stack(
        [np.asarray(h, np.float32) for (h, _, _) in t_out.layer_results])
    np.savez(
        os.path.join(OUT, "teacher_fwd.npz"),
        x=np.asarray(t_out.x, np.float32),
        hiddens=hiddens,
    )

    # ---- student forward ---------------------------------------------------
    s_out = d.student.apply(
        {"params": state.params}, wav, mask, deterministic=True,
        need_taps=False)
    np.savez(
        os.path.join(OUT, "student_fwd.npz"),
        x=np.asarray(s_out.x, np.float32),
        proj=np.asarray(s_out.projections, np.float32),
    )

    # ---- one train step ----------------------------------------------------
    batch = {"x": wav[None], "padding_mask": mask[None]}
    rand = jnp.zeros((1,), jnp.int32)
    step_key = jax.random.PRNGKey(7)
    new_state, logs = d.make_train_step()(state, tp, batch, rand, step_key)
    leaves = jax.tree_util.tree_leaves(new_state.params)
    param_probe = np.asarray(
        [float(jnp.ravel(l)[0]) for l in leaves], np.float32)
    np.savez(
        os.path.join(OUT, "train_step.npz"),
        loss=np.float32(logs["loss"]),
        grad_norm=np.float32(logs["grad_norm"]),
        param_probe=param_probe,
    )
    # ---- conformer (rel_pos) forward ----------------------------------------
    cmodel, cvars, cwav, cmask = build_conformer()
    c_out = cmodel.apply(cvars, cwav, cmask, deterministic=True,
                         need_taps=False)
    np.savez(
        os.path.join(OUT, "conformer_fwd.npz"),
        x=np.asarray(c_out.x, np.float32),
        proj=np.asarray(c_out.projections, np.float32),
    )

    # ---- CTC (pseudo-label) train step --------------------------------------
    dc, tpc, statec, wavc, maskc = build_ctc()
    batch_c = {"x": wavc[None], "padding_mask": maskc[None]}
    new_state_c, logs_c = dc.make_train_step()(
        statec, tpc, batch_c, jnp.zeros((0,), jnp.int32), jax.random.PRNGKey(9))
    leaves_c = jax.tree_util.tree_leaves(new_state_c.params)
    np.savez(
        os.path.join(OUT, "ctc_step.npz"),
        loss=np.float32(logs_c["loss"]),
        ctc_loss=np.float32(logs_c["ctc_loss"]),
        grad_norm=np.float32(logs_c["grad_norm"]),
        param_probe=np.asarray(
            [float(jnp.ravel(l)[0]) for l in leaves_c], np.float32),
    )

    # ---- mel front-end + MelSpecHead forward --------------------------------
    mmodel, mvars, mwav, mmask = build_mel()
    m_out = mmodel.apply(mvars, mwav, mmask, deterministic=True,
                         need_taps=False)
    np.savez(
        os.path.join(OUT, "mel_fwd.npz"),
        x=np.asarray(m_out.x, np.float32),
    )

    # ---- fc1 time-reduction forward ------------------------------------------
    fmodel, fvars, fwav, fmask = build_tr_fc1()
    f_out = fmodel.apply(fvars, fwav, fmask, deterministic=True,
                         need_taps=False)
    np.savez(
        os.path.join(OUT, "tr_fc1_fwd.npz"),
        x=np.asarray(f_out.x, np.float32),
        mask=np.asarray(f_out.padding_mask),
    )

    print(f"goldens written to {OUT}")
    for f in sorted(os.listdir(OUT)):
        print(" ", f, os.path.getsize(os.path.join(OUT, f)), "bytes")


if __name__ == "__main__":
    main()
