"""Torch-free golden regression pins (VERDICT r3 #6).

The torch-oracle parity suites (test_*_full_parity.py) verify agreement with
an independently-written oracle, but both sides live in this repo — a
refactor that shifts implementation AND oracle passes them silently, and
they skip entirely where torch is absent. These tests compare tiny
fixed-seed forward/train-step outputs against values FROZEN into
tests/goldens/*.npz (committed), so any numeric drift in the conv extractor,
encoder, teacher, loss engine, or optimizer fails loudly everywhere.

Regenerate deliberately after an INTENDED numerics change:
    python scripts/make_goldens.py
"""

import os

import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")

# XLA:CPU re-fusion across jax point releases can shift last-ulp results;
# real numerics bugs move outputs by far more than this.
RTOL, ATOL = 1e-4, 1e-5


@pytest.fixture(scope="module")
def built():
    from scripts.make_goldens import build

    return build()


def test_teacher_forward_matches_golden(built):
    d, tp, state, wav, mask = built
    g = np.load(os.path.join(GOLD, "teacher_fwd.npz"))
    t_out = d.teacher.apply(tp, wav, mask, need_taps=False)
    np.testing.assert_allclose(
        np.asarray(t_out.x, np.float32), g["x"], rtol=RTOL, atol=ATOL)
    hiddens = np.stack(
        [np.asarray(h, np.float32) for (h, _, _) in t_out.layer_results])
    np.testing.assert_allclose(hiddens, g["hiddens"], rtol=RTOL, atol=ATOL)


def test_student_forward_matches_golden(built):
    d, tp, state, wav, mask = built
    g = np.load(os.path.join(GOLD, "student_fwd.npz"))
    s_out = d.student.apply(
        {"params": state.params}, wav, mask, deterministic=True,
        need_taps=False)
    np.testing.assert_allclose(
        np.asarray(s_out.x, np.float32), g["x"], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(s_out.projections, np.float32), g["proj"],
        rtol=RTOL, atol=ATOL)


def test_train_step_matches_golden(built):
    import jax
    import jax.numpy as jnp

    d, tp, state, wav, mask = built
    g = np.load(os.path.join(GOLD, "train_step.npz"))
    batch = {"x": wav[None], "padding_mask": mask[None]}
    # the step DONATES its state: feed a copy so the module-scoped fixture
    # survives for the other tests regardless of execution order
    state = jax.tree.map(jnp.array, state)
    new_state, logs = d.make_train_step()(
        state, tp, batch, jnp.zeros((1,), jnp.int32), jax.random.PRNGKey(7))
    np.testing.assert_allclose(
        np.float32(logs["loss"]), g["loss"], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        np.float32(logs["grad_norm"]), g["grad_norm"], rtol=1e-3, atol=ATOL)
    leaves = jax.tree_util.tree_leaves(new_state.params)
    probe = np.asarray([float(jnp.ravel(l)[0]) for l in leaves], np.float32)
    np.testing.assert_allclose(probe, g["param_probe"], rtol=1e-3, atol=1e-6)


def test_conformer_forward_matches_golden():
    """rel_pos conformer pin (VERDICT r4 #8): rel_shift, macaron halves and
    the row-masked BatchNorm drift-checked without torch."""
    from scripts.make_goldens import build_conformer

    model, variables, wav, mask = build_conformer()
    g = np.load(os.path.join(GOLD, "conformer_fwd.npz"))
    out = model.apply(variables, wav, mask, deterministic=True,
                      need_taps=False)
    np.testing.assert_allclose(
        np.asarray(out.x, np.float32), g["x"], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(out.projections, np.float32), g["proj"],
        rtol=RTOL, atol=ATOL)


def test_ctc_step_matches_golden():
    """wav2vec_ctc pseudo-label train step pin (VERDICT r4 #8): teacher
    ctc_proj -> argmax -> collapse_pseudo_labels -> optax CTC, the sequence
    path the reference crashes on (SURVEY §4)."""
    import jax
    import jax.numpy as jnp

    from scripts.make_goldens import build_ctc

    d, tp, state, wav, mask = build_ctc()
    g = np.load(os.path.join(GOLD, "ctc_step.npz"))
    batch = {"x": wav[None], "padding_mask": mask[None]}
    new_state, logs = d.make_train_step()(
        state, tp, batch, jnp.zeros((0,), jnp.int32), jax.random.PRNGKey(9))
    np.testing.assert_allclose(
        np.float32(logs["loss"]), g["loss"], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        np.float32(logs["ctc_loss"]), g["ctc_loss"], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        np.float32(logs["grad_norm"]), g["grad_norm"], rtol=1e-3, atol=ATOL)
    leaves = jax.tree_util.tree_leaves(new_state.params)
    probe = np.asarray([float(jnp.ravel(l)[0]) for l in leaves], np.float32)
    np.testing.assert_allclose(probe, g["param_probe"], rtol=1e-3, atol=1e-6)


def test_mel_forward_matches_golden():
    """Mel front-end + MelSpecHead pin (torchaudio center=False/HTK
    semantics) — drift-checked without torch."""
    from scripts.make_goldens import build_mel

    model, variables, wav, mask = build_mel()
    g = np.load(os.path.join(GOLD, "mel_fwd.npz"))
    out = model.apply(variables, wav, mask, deterministic=True,
                      need_taps=False)
    np.testing.assert_allclose(
        np.asarray(out.x, np.float32), g["x"], rtol=RTOL, atol=ATOL)


def test_tr_fc1_forward_matches_golden():
    """fc1 time-reduction pin (concat_channelwise semantics — the TR type
    the reference crashes on, SURVEY §4)."""
    from scripts.make_goldens import build_tr_fc1

    model, variables, wav, mask = build_tr_fc1()
    g = np.load(os.path.join(GOLD, "tr_fc1_fwd.npz"))
    out = model.apply(variables, wav, mask, deterministic=True,
                      need_taps=False)
    np.testing.assert_allclose(
        np.asarray(out.x, np.float32), g["x"], rtol=RTOL, atol=ATOL)
    np.testing.assert_array_equal(np.asarray(out.padding_mask), g["mask"])
