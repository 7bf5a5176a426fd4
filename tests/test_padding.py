"""Padding-mask machinery parity tests (reference formulas cited per test)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fithubert_tpu.ops.padding import (
    conv_out_length,
    feat_extract_output_lengths,
    lengths_to_padding_mask,
    pad_to_multiple,
    padding_mask_to_lengths,
    reduce_padding_mask,
)

FITHUBERT_CONV = (
    (128, 10, 5), (256, 1, 1), (256, 3, 2), (256, 3, 2), (256, 3, 2),
    (256, 3, 2), (512, 1, 1), (512, 2, 2), (512, 2, 2),
)


def torch_conv_len(length, layers):
    """Independent oracle: torch floor formula (reference modules/model.py:381)."""
    import torch

    x = torch.tensor(float(length))
    for (_, k, s) in layers:
        x = torch.floor((x - k) / s + 1)
    return int(x)


@pytest.mark.parametrize("length", [400, 16000, 32000, 160000, 562480])
def test_feat_extract_output_lengths_matches_torch(length):
    ours = int(feat_extract_output_lengths(jnp.array([length]), FITHUBERT_CONV)[0])
    assert ours == torch_conv_len(length, FITHUBERT_CONV)


def test_conv_output_length_matches_actual_conv_shape():
    import jax

    from fithubert_tpu.ops.conv import ConvFeatureExtractor

    wav = jnp.zeros((1, 24321))
    model = ConvFeatureExtractor(conv_layers=FITHUBERT_CONV)
    params = model.init(jax.random.PRNGKey(0), wav)
    out = model.apply(params, wav)
    expected = int(feat_extract_output_lengths(jnp.array([24321]), FITHUBERT_CONV)[0])
    assert out.shape[1] == expected


def test_lengths_to_padding_mask_roundtrip():
    lengths = jnp.array([5, 3, 8])
    mask = lengths_to_padding_mask(lengths, 8)
    assert mask.shape == (3, 8)
    assert bool(mask[0, 4]) is False and bool(mask[0, 5]) is True
    np.testing.assert_array_equal(padding_mask_to_lengths(mask), lengths)


def test_reduce_padding_mask_matches_reference_any_semantics():
    """reference modules/module.py:312-316: split(factor), drop partial tail,
    stack(...).any(-1)."""
    import torch

    mask_np = np.array(
        [[False, False, False, True, True], [False, False, False, False, False]]
    )
    ours = np.asarray(reduce_padding_mask(jnp.asarray(mask_np), 2))

    t = torch.from_numpy(mask_np)
    sp = t.split(2, 1)
    if t.shape[-1] % 2 != 0:
        sp = sp[:-1]
    theirs = torch.stack(sp).any(-1).transpose(0, 1).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_pad_to_multiple():
    x = jnp.ones((2, 7, 4))
    y, rem = pad_to_multiple(x, 4, axis=1)
    assert y.shape == (2, 8, 4) and rem == 1
    assert float(y[:, -1].sum()) == 0.0
    y2, rem2 = pad_to_multiple(x, 7, axis=1)
    assert rem2 == 0 and y2 is x
    m = jnp.zeros((2, 7), bool)
    ym, _ = pad_to_multiple(m, 4, axis=-1, value=True)
    assert bool(ym[:, -1].all())


def test_reduce_padding_mask_ceil_for_fc_tr_types():
    """fc1/fc2 TR zero-pad x to ceil(t/f) frames, so their mask must keep
    the trailing partial chunk (reduced over its real positions): at odd T
    the reference floor-reduces and hands MHA a short mask (SURVEY §4)."""
    import jax.numpy as jnp

    # t=5, f=2: chunks (0,1) (2,3) (4,); row 0 pads from position 3
    mask = jnp.asarray([[False, False, False, True, True],
                        [False, False, False, False, False]])
    out = np.asarray(reduce_padding_mask(mask, 2, ceil=True))
    assert out.shape == (2, 3)
    np.testing.assert_array_equal(out[0], [False, True, True])
    np.testing.assert_array_equal(out[1], [False, False, False])
    # floor semantics unchanged by default
    out_floor = np.asarray(reduce_padding_mask(mask, 2))
    assert out_floor.shape == (2, 2)
