"""The 6-term knowledge-distillation loss engine.

Parity target: reference `W2V2Distil.calculate_loss` (train.py:236-405). Every
term is weight-gated; in parity mode (`masked_reduction=False`, the default)
the reductions deliberately run over PADDED positions exactly like the
reference (train.py:284-316 applies no mask inside the loss); the corrected
masked mode normalizes by valid elements instead.

Random-layer distillation (train.py:250-267,290-293): the per-epoch layer
subset arrives as a traced int array `rand_layers`, so re-sampling epochs
does NOT trigger an XLA recompile (teacher hiddens are stacked once and
gathered with jnp.take).

All loss math is fp32 regardless of the model compute dtype.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from fithubert_tpu.config import LossConfig, StudentConfig
from fithubert_tpu.models.student import StudentOutput
from fithubert_tpu.models.teacher import TeacherOutput

# MEASURED-NEGATIVE (r4, on-chip): an optimization_barrier between the
# projection-head matmuls and the loss reduces — hypothesized to split 12
# "convert_reduce" fusions into faster separate forms — benched 12.878 vs
# 13.048 steps/s (0.987x) at the release geometry; the split's extra f32
# materialization traffic outweighs any fusion pathology. An r4 xplane
# trace also re-attributed those fusions to the TEACHER's fc2 matmuls
# (matmul-bound at ~36% MFU), not loss glue. Knob deleted; don't retry.


class LossOutput(NamedTuple):
    total: jnp.ndarray
    logs: Dict[str, jnp.ndarray]  # per-term and per-layer scalars
    last_layer_loss: jnp.ndarray  # 'l{N-1}' — the reference's v_loss monitor
    # (train.py:194-195 uses the last layer's feat loss for early stopping)


def _as_stack(projections):
    """(B, L, T, D) from either an already-stacked array or a per-layer list."""
    if isinstance(projections, (list, tuple)):
        return jnp.stack(list(projections), axis=1)
    return projections


def _row_weighted_mean(x, rv, keep_axis1: bool = False):
    """Parity-mode reduction that EXCLUDES fabricated all-padding rows.

    The reference reduces over padded positions (no mask in the loss) but its
    partial trailing bucket contains only REAL rows; pad_batch_to_full adds
    fake all-padding rows for shape stability, which must not contribute —
    student(0) and teacher(0) differ, so a plain mean would inject fake loss.
    x has batch rows on axis 0; rv (B,) is 1.0 at real rows (None = plain
    mean). keep_axis1 returns per-axis-1 (layer) values."""
    if rv is None:
        if keep_axis1:
            return jnp.mean(x, axis=(0,) + tuple(range(2, x.ndim)))
        return jnp.mean(x)
    w = rv.astype(x.dtype)
    if keep_axis1:
        per = jnp.mean(x, axis=tuple(range(2, x.ndim)))  # (B, L)
        return jnp.sum(per * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    per = jnp.mean(x, axis=tuple(range(1, x.ndim)))  # (B,)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)


def _taps_row_weight(row_valid, z: int):
    """Row weights for (B*H, T, T) flattened attention taps (b-major)."""
    if row_valid is None:
        return jnp.ones((z,), jnp.float32)
    return jnp.repeat(row_valid, z // row_valid.shape[0])


def _masked_mean(x, mask, axes):
    """Mean of x over `axes`, counting only valid (mask False) positions.

    `mask` is a padding mask broadcastable to x (True = pad)."""
    valid = jnp.logical_not(mask).astype(x.dtype)
    valid = jnp.broadcast_to(valid, x.shape)
    num = jnp.sum(x * valid, axis=axes)
    den = jnp.maximum(jnp.sum(valid, axis=axes), 1.0)
    return num / den


def collapse_pseudo_labels(ids: jnp.ndarray, blank: int = 0):
    """Jit-safe CTC collapse of teacher argmax ids (B, T) -> fixed-width
    padded labels.

    Equivalent of the reference's per-sequence CTCSequenceConverter call on
    teacher predictions (train.py:386-390, utils/utils.py:40-48), but shape-
    static: duplicates/blanks are dropped by scatter-compaction instead of
    Python groupby. Returns (labels (B, T) int32 front-packed,
    label_paddings (B, T) float32 with 1.0 at padding).
    """
    b, t = ids.shape
    prev = jnp.pad(ids[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    keep = (ids != prev) & (ids != blank)
    pos = jnp.cumsum(keep, axis=1) - 1  # destination index per kept token
    dest = jnp.where(keep, pos, t)  # out-of-bounds -> dropped

    def compact(row_ids, row_dest):
        return jnp.zeros((t,), row_ids.dtype).at[row_dest].set(row_ids, mode="drop")

    labels = jax.vmap(compact)(ids, dest)
    counts = jnp.sum(keep, axis=1)
    label_paddings = (jnp.arange(t)[None, :] >= counts[:, None]).astype(jnp.float32)
    return labels.astype(jnp.int32), label_paddings


def compute_losses(
    loss_cfg: LossConfig,
    student_cfg: StudentConfig,
    student: StudentOutput,
    teacher: TeacherOutput,
    rand_layers: Optional[jnp.ndarray] = None,  # (R,) int32 layer ids, or None
    ctc_logits: Optional[jnp.ndarray] = None,  # (B, T, V) student CTC head
    labels: Optional[jnp.ndarray] = None,  # (B, U) int32, 0 = pad/blank
    label_paddings: Optional[jnp.ndarray] = None,  # (B, U) 1.0 at padding
    logit_paddings: Optional[jnp.ndarray] = None,  # (B, T) 1.0 at padding
) -> LossOutput:
    cfg = loss_cfg
    logs: Dict[str, jnp.ndarray] = {}
    f32 = lambda x: x.astype(jnp.float32)
    zero = jnp.zeros((), jnp.float32)

    # frame-rate padding mask for masked mode (pre-TR, teacher frame rate)
    frame_mask = None
    if cfg.masked_reduction and teacher.padding_mask is not None:
        frame_mask = teacher.padding_mask  # (B, T_t)

    # real-utterance rows: a row fabricated by pad_batch_to_full has an
    # all-True frame mask; parity-mode (unmasked) reductions weight by this
    # so fake rows contribute nothing (masked mode excludes them already)
    row_valid = None
    if teacher.padding_mask is not None:
        row_valid = jnp.logical_not(
            jnp.all(teacher.padding_mask, axis=-1)
        ).astype(jnp.float32)

    # ---- CNN post-projection loss (train.py:241-246) ------------------------
    cnn_loss = zero
    if cfg.cnn_loss_weight > 0:
        sf, tf = f32(student.features), f32(teacher.features)
        t_min = min(sf.shape[1], tf.shape[1])
        diff = jnp.abs(sf[:, :t_min] - tf[:, :t_min])
        if frame_mask is not None:
            cnn_loss = jnp.mean(_masked_mean(diff, frame_mask[:, :t_min, None], (0, 1, 2)))
        else:
            cnn_loss = _row_weighted_mean(diff, row_valid)
        logs["cnn_loss"] = cnn_loss

    # ---- assemble pred / target stacks --------------------------------------
    # teacher hiddens: (B, L, T_t, D). Stacks stay in the model compute dtype
    # (bf16 under use_fp16) — the f32 upcast happens lazily right before the
    # loss math (same numerics: the convert is exact and fuses into the
    # elementwise+reduce fusion instead of materializing a 2x-size stack).
    teacher_stack = jnp.stack([h for (h, _, _) in teacher.layer_results], axis=1)

    rec_loss = zero
    sim_loss = zero
    rec_layer_loss = None
    sim_layer_loss = None
    pred = target = None

    random_mode = cfg.distil_random_layer > 0
    # Set when the random-layer gather was skipped as an identity: slot i's
    # per-layer log scalar is then per_layer[rand_layers[i]] (permuted below).
    slots_perm = None

    if cfg.rec_loss_weight > 0 or cfg.sim_loss_weight > 0:
        if random_mode:
            assert rand_layers is not None
            proj_stack = _as_stack(student.projections)
            n_slots = int(rand_layers.shape[0])
            if (n_slots == teacher_stack.shape[1] - 1
                    and n_slots == proj_stack.shape[1] - 1):
                # The release config's k = N-1 draws the WHOLE intermediate
                # pool (loop._sample_rand_layers: sample(range(N-1), N-1)), so
                # rand_layers is a permutation of 0..N-2 and the slot weights
                # are uniform: total loss and grads are permutation-invariant.
                # Skip the (B, R, T, D) gathers (and their scatter-add
                # transposes — measured 4.8 ms/step on v5e) and permute only
                # the per-layer scalar logs.
                target = teacher_stack
                pred = proj_stack
                slots_perm = rand_layers
            else:
                # teacher: gathered rand layers + final layer (train.py:250-258)
                gathered = jnp.take(teacher_stack, rand_layers, axis=1,
                                    mode="clip")
                target = jnp.concatenate(
                    [gathered, teacher_stack[:, -1:]], axis=1)
                # student: layerwise projections stacked then gathered
                pred = jnp.concatenate(
                    [jnp.take(proj_stack, rand_layers, axis=1, mode="clip"),
                     proj_stack[:, -1:]],
                    axis=1,
                )
        else:
            ids = jnp.asarray(student_cfg.pred_layer_id, jnp.int32)
            target = jnp.take(teacher_stack, ids, axis=1)
            if student_cfg.layerwise_proj:
                proj_stack = _as_stack(student.projections)
                pred = jnp.take(proj_stack, ids, axis=1)
            else:
                pred = student.projections  # (B, N, T, D)
        # time alignment: TR floor/pad can leave either side 1 frame longer
        # (the reference only narrows the teacher, train.py:282, and crashes
        # when the student is longer) — crop both to the common length
        t_s = min(pred.shape[2], target.shape[2])
        pred = pred[:, :, :t_s]
        target = target[:, :, :t_s]
        pred = f32(pred)
        target = f32(target)

        layer_mask = (
            frame_mask[:, None, :t_s, None] if frame_mask is not None else None
        )

    # ---- reconstruction loss (train.py:249-297) ------------------------------
    if cfg.rec_loss_weight > 0:
        if cfg.rec_loss_type == "l1":
            elt = jnp.abs(pred - target)
        elif cfg.rec_loss_type == "mse":
            elt = (pred - target) ** 2
        else:
            raise NotImplementedError("rec_loss_type must be one of 'l1', 'mse'.")
        if random_mode:
            w = jnp.concatenate(
                [jnp.full((elt.shape[1] - 1,), cfg.random_layer_weight),
                 jnp.ones((1,))]
            ).astype(elt.dtype)
            elt = elt * w[None, :, None, None]
            if layer_mask is not None:
                rec_layer_loss = _masked_mean(elt, layer_mask, (0, 2, 3))
            else:
                rec_layer_loss = _row_weighted_mean(elt, row_valid, keep_axis1=True)
            rec_loss = jnp.sum(rec_layer_loss)
        else:
            if layer_mask is not None:
                rec_layer_loss = _masked_mean(elt, layer_mask, (0, 2, 3))
                rec_loss = jnp.mean(rec_layer_loss)
            else:
                rec_layer_loss = jax.lax.stop_gradient(
                    _row_weighted_mean(elt, row_valid, keep_axis1=True)
                )
                rec_loss = _row_weighted_mean(elt, row_valid)

    # ---- cosine-similarity hint loss (train.py:302-314) ----------------------
    if cfg.sim_loss_weight > 0:
        # F.cosine_similarity(dim=-1) with torch's eps=1e-8 denominator clamp
        dot = jnp.sum(pred * target, axis=-1)
        np_ = jnp.sqrt(jnp.sum(pred**2, axis=-1))
        nt_ = jnp.sqrt(jnp.sum(target**2, axis=-1))
        cos = dot / jnp.maximum(np_ * nt_, 1e-8)
        elt = -jax.nn.log_sigmoid(cos)  # (B, N, T)
        if random_mode:
            w = jnp.concatenate(
                [jnp.full((elt.shape[1] - 1,), cfg.random_layer_weight),
                 jnp.ones((1,))]
            ).astype(elt.dtype)
            elt = elt * w[None, :, None]
            if frame_mask is not None:
                sim_layer_loss = _masked_mean(elt, frame_mask[:, None, : elt.shape[2]], (0, 2))
            else:
                sim_layer_loss = _row_weighted_mean(elt, row_valid, keep_axis1=True)
            sim_loss = jnp.sum(sim_layer_loss)
        else:
            if frame_mask is not None:
                sim_layer_loss = _masked_mean(elt, frame_mask[:, None, : elt.shape[2]], (0, 2))
                sim_loss = jnp.mean(sim_layer_loss)
            else:
                sim_layer_loss = jax.lax.stop_gradient(
                    _row_weighted_mean(elt, row_valid, keep_axis1=True)
                )
                sim_loss = _row_weighted_mean(elt, row_valid)

    # ---- per-layer logging (train.py:316-324) --------------------------------
    last_layer_loss = zero
    if rec_layer_loss is not None or sim_layer_loss is not None:
        n_terms = (rec_layer_loss if rec_layer_loss is not None else sim_layer_loss).shape[0]
        feat_layer = (rec_layer_loss if rec_layer_loss is not None else 0) + (
            sim_layer_loss if sim_layer_loss is not None else 0
        )
        if slots_perm is not None:
            # identity fast path: restore the slot ordering for the logs
            # (slot i distilled layer rand_layers[i]); 11 scalars, not tensors
            feat_layer = jnp.concatenate(
                [jnp.take(feat_layer, slots_perm, axis=0, mode="clip"),
                 feat_layer[-1:]]
            )
        if random_mode:
            for i in range(n_terms - 1):
                logs[f"rand_l{i}"] = feat_layer[i]
            last_layer_loss = feat_layer[-1]
            logs[f"l{student_cfg.encoder_layers - 1}"] = last_layer_loss
        else:
            for i, pid in enumerate(student_cfg.pred_layer_id):
                logs[f"layer{pid}"] = feat_layer[i]
            last_layer_loss = feat_layer[-1]

    # ---- attention-logit transfer (train.py:327-355) --------------------------
    attn_loss = zero
    if cfg.attn_loss_weight > 0:
        s_taps = student.layer_results[-1][1]
        t_taps = teacher.layer_results[-1][1]
        pred_a = f32(s_taps.attn_logits)
        targ_a = f32(t_taps.attn_logits)
        t_min = min(pred_a.shape[1], targ_a.shape[1])
        pred_a, targ_a = pred_a[:, :t_min, :t_min], targ_a[:, :t_min, :t_min]
        w_z = _taps_row_weight(row_valid, pred_a.shape[0])
        if cfg.attn_loss_type == "mse":
            l = (pred_a - targ_a) ** 2
            isinf, isnan = jnp.isinf(l), jnp.isnan(l)
            # reference scrub (train.py:337-341): count whole key-columns;
            # fabricated rows are excluded from numerator and denominator
            inf_count = jnp.sum(jnp.any(isinf, axis=1) * w_z[:, None]) * l.shape[-1]
            nan_count = jnp.sum(jnp.any(isnan, axis=1) * w_z[:, None]) * l.shape[-1]
            l = jnp.where(isinf | isnan, 0.0, l) * w_z[:, None, None]
            denom = jnp.sum(w_z) * l.shape[1] * l.shape[2] - inf_count - nan_count
            attn_loss = jnp.sum(l) / jnp.maximum(denom, 1.0)
        elif cfg.attn_loss_type == "kldiv":
            logp = jax.nn.log_softmax(pred_a, axis=-1)
            q = jax.nn.softmax(targ_a, axis=-1)
            l = q * (jnp.log(jnp.maximum(q, 1e-30)) - logp)
            l = jnp.where(jnp.isinf(l) | jnp.isnan(l), 0.0, l)
            attn_loss = jnp.sum(
                jnp.sum(l, axis=-1) * w_z[:, None]
            ) / jnp.maximum(jnp.sum(w_z) * l.shape[1], 1.0)
        else:
            raise NotImplementedError("attn_loss_type must be one of 'mse', 'kldiv'.")
        logs["attn_loss"] = attn_loss

    # ---- value-relation transfer (train.py:358-370) ----------------------------
    v_rel_loss = zero
    if cfg.v_rel_loss_weight > 0:
        pred_v = f32(student.layer_results[-1][1].v_rel)
        targ_v = f32(teacher.layer_results[-1][1].v_rel)
        t_min = min(pred_v.shape[1], targ_v.shape[1])
        pred_v, targ_v = pred_v[:, :t_min, :t_min], targ_v[:, :t_min, :t_min]
        w_v = _taps_row_weight(row_valid, pred_v.shape[0])
        logp = jax.nn.log_softmax(pred_v, axis=-1)
        q = jax.nn.softmax(targ_v, axis=-1)
        l = q * (jnp.log(jnp.maximum(q, 1e-30)) - logp)
        v_rel_loss = jnp.sum(
            jnp.sum(l, axis=-1) * w_v[:, None]
        ) / jnp.maximum(jnp.sum(w_v) * l.shape[1], 1.0)
        logs["v_rel_loss"] = v_rel_loss

    total = (
        cfg.rec_loss_weight * rec_loss
        + cfg.sim_loss_weight * sim_loss
        + cfg.attn_loss_weight * attn_loss
        + cfg.v_rel_loss_weight * v_rel_loss
        + cfg.cnn_loss_weight * cnn_loss
    )

    # ---- CTC for task-specific teachers (train.py:380-403; fixed here — the
    # reference path crashes, SURVEY.md §4) -----------------------------------
    if ctc_logits is not None and labels is not None:
        import optax

        # Parity note: the reference passes FULL input lengths to F.ctc_loss
        # (train.py:396-400 torch.full(..., T)) — padding is ignored unless a
        # logit_paddings mask is supplied explicitly (our corrected mode).
        logit_pads = (
            logit_paddings.astype(jnp.float32)
            if logit_paddings is not None
            else jnp.zeros(ctc_logits.shape[:2], jnp.float32)
        )
        if label_paddings is None:
            label_paddings = (labels == 0).astype(jnp.float32)
        per_sample = optax.ctc_loss(
            f32(ctc_logits), logit_pads, labels, label_paddings
        )
        if row_valid is not None:
            ctc = jnp.sum(per_sample * row_valid) / jnp.maximum(
                jnp.sum(row_valid), 1.0
            )
        else:
            ctc = jnp.mean(per_sample)
        logs["ctc_loss"] = ctc
        total = total + cfg.ctc_loss_weight * ctc

    logs["total"] = total
    if random_mode:
        pass  # v_loss monitor is the last-layer loss (train.py:194-195)
    else:
        last_layer_loss = total if last_layer_loss is zero else last_layer_loss
    return LossOutput(total=total, logs=logs, last_layer_loss=last_layer_loss)
