"""scripts/hlo_audit.py — compiled-HLO convolution-orientation auditor.

The round-5 pos-conv dx win (+3.7% step) only exists in the OPTIMIZED HLO:
XLA:TPU's algebraic simplifier folds an explicit kernel flip back into the
convolution as window `rhs_reversal` (the ~4x-slower transposed orientation)
unless an optimization_barrier hides the flipped weight (ops/conv.py:_gc_bwd).
These tests pin (a) the audit parser against real optimized-HLO conv lines and
(b) the barrier-mode invariant on this backend's lowering: no convolution in
the pos-conv grad carries rhs_reversal. The fold itself is TPU-simplifier
-specific (measured: XLA:CPU emits rhs_reversal=0 in BOTH modes), so the
on-chip report (artifacts/hlo_train_step_tpu_r5.txt) is the hardware evidence;
this tier keeps the parser and the graph contract from drifting.
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from hlo_audit import audit  # noqa: E402

# Shape-faithful excerpts of v5e optimized-HLO convolution lines (window
# configs as the TPU compiler prints them; names/operands elided).
_HLO_SAMPLE = """\
  %convolution.1 = bf16[12,3894,512]{2,1,0} convolution(%p0, %p1), window={size=10 stride=5}, dim_labels=b0f_0io->b0f
  %convolution.2 = bf16[12,3894,768]{2,1,0} convolution(%p2, %p3), window={size=128 pad=64_63}, feature_group_count=16, dim_labels=b0f_0io->b0f
  %convolution.3 = bf16[12,3894,768]{2,1,0} convolution(%p4, %p5), window={size=128 pad=63_64 rhs_reversal=1}, feature_group_count=16, dim_labels=b0f_0io->b0f
  %convolution.4 = f32[10,512,512]{2,1,0} convolution(%p6, %p7), window={size=3894 lhs_dilate=5}, dim_labels=0bf_0io->0bf
  %add.9 = f32[4]{0} add(%a, %b)
"""


def test_audit_parses_conv_windows():
    rep = audit(_HLO_SAMPLE)
    assert rep["n_convs"] == 4
    assert rep["n_rhs_reversal"] == 1
    assert rep["n_lhs_dilate"] == 1
    flagged = [c for c in rep["convs"] if c["rhs_reversal"]]
    assert [c["name"] for c in flagged] == ["%convolution.3"]
    assert flagged[0]["shape"].startswith("bf16[12,3894,768]")
    assert "pad=63_64" in flagged[0]["window"]
    # size=128 stride-1 no-dilate reversed IS the pos-conv regression class
    assert flagged[0]["reversal_class"] == "dx-stride1-bigk"
    assert rep["n_alarm"] == 1 and rep["alarms"] == flagged


def test_reversal_classifier_expected_grad_forms():
    """Window configs lifted verbatim from the r5 on-chip audit
    (artifacts/hlo_train_step_tpu_r5.txt) — all expected, none alarm."""
    from hlo_audit import _classify_reversal

    # XLA's canonical strided-conv input-grad: lhs_dilate=stride + reversal
    assert _classify_reversal(
        "size=3 pad=2_3 lhs_dilate=2 rhs_reversal=1") == "dx-strided"
    assert _classify_reversal(
        "size=12x12 stride=11x1 pad=0_0x11_11 lhs_dilate=12x1 "
        "rhs_reversal=0x1") == "dx-strided"
    # weight-grad: window spans the time axis (599 frames)
    assert _classify_reversal(
        "size=599x16 stride=1x15 pad=63_63x0_0 lhs_dilate=1x16 "
        "rhs_reversal=1x0") == "dw"
    # tiny k<=3 glue windows: negligible
    assert _classify_reversal(
        "size=1x2 pad=0_0x1_1 rhs_reversal=0x1") == "small"


def test_all_zero_reversal_not_counted():
    hlo = ("  %c = bf16[2,4,8]{2,1,0} convolution(%a, %b), "
           "window={size=3 rhs_reversal=0x0}, dim_labels=b0f_0io->b0f\n")
    rep = audit(hlo)
    assert rep["n_convs"] == 1
    assert rep["n_rhs_reversal"] == 0 and rep["n_alarm"] == 0


def test_audit_empty_hlo():
    rep = audit("ENTRY %main\n  ROOT %t = f32[2]{0} parameter(0)\n")
    assert rep["n_convs"] == 0 and rep["convs"] == []


def test_posconv_grad_barrier_mode_has_no_rhs_reversal():
    """Barrier mode (the default): the flipped weight is opaque to the
    simplifier, so every conv in the pos-conv grad runs in a forward
    orientation. Guards accidental removal of the optimization_barrier or a
    VJP rewrite that reintroduces the transposed conv on this lowering."""
    from fithubert_tpu.ops.conv import grouped_conv_same

    assert os.environ.get("FITHUBERT_POSCONV_DX", "barrier") != "folded"
    x = jnp.zeros((2, 64, 32), jnp.float32)
    k = jnp.zeros((9, 8, 32), jnp.float32)  # (k, cin/g, cout), groups=4

    def loss(x_, k_):
        return grouped_conv_same(x_, k_, (4, 4), 4).sum()

    hlo = (
        jax.jit(jax.grad(loss, argnums=(0, 1)))
        .lower(x, k)
        .compile()
        .as_text()
    )
    rep = audit(hlo)
    assert rep["n_convs"] >= 1  # dx (forward grouped conv); dw may fuse
    assert rep["n_rhs_reversal"] == 0, [
        c["window"] for c in rep["convs"] if c["rhs_reversal"]
    ]
