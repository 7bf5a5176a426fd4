"""Full-model numeric parity for the STUDENT: a torch oracle of the reference
CustomStudentModel forward (conv extractor -> LN -> post_extract_proj ->
pos-conv -> TR conv1d at index 0 -> post-LN transformer layers -> per-layer
upsample+proj heads; reference modules/model.py:420-552) is saved with the
reference's state-dict naming, imported via export/reference_import, and our
StudentModel must reproduce every layer hidden and projection."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from fithubert_tpu.config import StudentConfig
from fithubert_tpu.models import StudentModel
from tests.test_teacher_full_parity import TorchLayer, CONV, D, FFN, HEADS

OUT_D = 48
TRF = 2

CFG = StudentConfig(
    conv_feature_layers=CONV, conv_pos=16, conv_pos_groups=4,
    encoder_layers=2, encoder_embed_dim=D, encoder_ffn_embed_dim=FFN,
    encoder_attention_heads=HEADS, dropout=0.0, attention_dropout=0.0,
    dropout_input=0.0, pred_head_final_dim=OUT_D, pred_layer_id=(1,),
    layerwise_proj=True, enable_tr_layer=True, tr_layer_type="conv1d",
    tr_layer_index=0, tr_reduce_factor=TRF, use_pallas_attention=False,
    required_seq_len_multiple=1,  # the release config value (fithubert.yaml)
)


class TorchStudentOracle(nn.Module):
    def __init__(self):
        super().__init__()
        convs = []
        c_in = 1
        for (dim, k, s) in CONV:
            convs.append(nn.Conv1d(c_in, dim, k, stride=s, bias=False))
            c_in = dim
        self.convs = nn.ModuleList(convs)
        self.group_norm = nn.GroupNorm(CONV[0][0], CONV[0][0])
        self.layer_norm = nn.LayerNorm(CONV[-1][0])
        self.post_extract_proj = nn.Linear(CONV[-1][0], D)
        pos = nn.Conv1d(D, D, 16, padding=8, groups=4)
        self.pos_conv = nn.utils.weight_norm(pos, name="weight", dim=2)
        self.enc_layer_norm = nn.LayerNorm(D)
        self.tr = nn.Conv1d(D, D, TRF, stride=TRF)
        self.layers = nn.ModuleList([TorchLayer() for _ in range(2)])
        self.upsamplers = nn.ModuleList(
            [nn.ConvTranspose1d(D, D, TRF, stride=TRF) for _ in range(2)]
        )
        self.lin_projs = nn.ModuleList([nn.Linear(D, OUT_D) for _ in range(2)])

    def forward(self, wav, padding_mask):
        x = wav.unsqueeze(1)
        for i, conv in enumerate(self.convs):
            x = conv(x)
            if i == 0:
                x = self.group_norm(x)
            x = F.gelu(x, approximate="none")
        x = x.transpose(1, 2)
        x = self.layer_norm(x)

        lengths = (~padding_mask).sum(-1)
        for (_d, k, s) in CONV:
            lengths = torch.div(lengths - k, s, rounding_mode="floor") + 1
        frame_mask = torch.arange(x.shape[1])[None, :] >= lengths[:, None]

        x = self.post_extract_proj(x)
        x = x.masked_fill(frame_mask.unsqueeze(-1), 0.0)
        pos = self.pos_conv(x.transpose(1, 2))[:, :, :-1]
        pos = F.gelu(pos, approximate="none").transpose(1, 2)
        x = x + pos
        x = self.enc_layer_norm(x)

        # TR conv1d at slot 0 (reference modules/module.py:317-328): T -> T/f,
        # mask reduced by split(f).any(-1)
        t = x.shape[1]
        x = self.tr(x.transpose(1, 2)).transpose(1, 2)
        t_red = x.shape[1]
        m = frame_mask[:, : t_red * TRF].reshape(frame_mask.shape[0], t_red, TRF)
        red_mask = m.any(-1)

        hiddens, projections = [], []
        for layer, up, proj in zip(self.layers, self.upsamplers, self.lin_projs):
            x = layer(x, red_mask)
            hiddens.append(x)
            y = up(x.transpose(1, 2)).transpose(1, 2)
            projections.append(proj(y))
        return hiddens, projections, red_mask


def _reference_state_dict(o: TorchStudentOracle):
    sd = {}
    for i, conv in enumerate(o.convs):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = conv.weight
    sd["feature_extractor.conv_layers.0.2.weight"] = o.group_norm.weight
    sd["feature_extractor.conv_layers.0.2.bias"] = o.group_norm.bias
    sd["layer_norm.weight"] = o.layer_norm.weight
    sd["layer_norm.bias"] = o.layer_norm.bias
    sd["post_extract_proj.weight"] = o.post_extract_proj.weight
    sd["post_extract_proj.bias"] = o.post_extract_proj.bias
    sd["encoder.pos_conv.0.weight_g"] = o.pos_conv.weight_g
    sd["encoder.pos_conv.0.weight_v"] = o.pos_conv.weight_v
    sd["encoder.pos_conv.0.bias"] = o.pos_conv.bias
    sd["encoder.layer_norm.weight"] = o.enc_layer_norm.weight
    sd["encoder.layer_norm.bias"] = o.enc_layer_norm.bias
    # torch ModuleList with TR inserted at index 0 -> layers 1, 2 are encoders
    sd["encoder.layers.0.weight"] = o.tr.weight
    sd["encoder.layers.0.bias"] = o.tr.bias
    for j, layer in enumerate(o.layers, start=1):
        p = f"encoder.layers.{j}"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            mod = getattr(layer, name)
            sd[f"{p}.self_attn.{name}.weight"] = mod.weight
            sd[f"{p}.self_attn.{name}.bias"] = mod.bias
        for name in ("self_attn_layer_norm", "fc1", "fc2", "final_layer_norm"):
            mod = getattr(layer, name)
            sd[f"{p}.{name}.weight"] = mod.weight
            sd[f"{p}.{name}.bias"] = mod.bias
    for i in range(2):
        sd[f"proj_head.{i}.upsampler.weight"] = o.upsamplers[i].weight
        sd[f"proj_head.{i}.upsampler.bias"] = o.upsamplers[i].bias
        sd[f"proj_head.{i}.lin_proj.weight"] = o.lin_projs[i].weight
        sd[f"proj_head.{i}.lin_proj.bias"] = o.lin_projs[i].bias
    return {k: v.detach() for k, v in sd.items()}


def test_student_forward_matches_torch_oracle():
    from fithubert_tpu.export.reference_import import map_student_state_dict

    torch.manual_seed(1)
    oracle = TorchStudentOracle().eval()
    params = map_student_state_dict(_reference_state_dict(oracle), CFG)

    rng = np.random.default_rng(1)
    b, t_wav = 2, 4000
    wav = rng.standard_normal((b, t_wav)).astype(np.float32) * 0.1
    lengths = np.array([4000, 2600])
    pad = np.arange(t_wav)[None, :] >= lengths[:, None]

    with torch.no_grad():
        hiddens_t, projs_t, red_mask_t = oracle(
            torch.from_numpy(wav), torch.from_numpy(pad)
        )

    model = StudentModel(cfg=CFG)
    out = model.apply({"params": params}, jnp.asarray(wav), jnp.asarray(pad))

    np.testing.assert_array_equal(
        np.asarray(out.padding_mask), red_mask_t.numpy()
    )
    valid = ~red_mask_t.numpy()
    for i, ht in enumerate(hiddens_t):
        np.testing.assert_allclose(
            np.asarray(out.layer_results[i][0])[valid], ht.numpy()[valid],
            atol=5e-5, err_msg=f"layer {i} hidden mismatch",
        )
    # projections are at the upsampled frame rate; compare the valid prefix
    up_valid = np.repeat(valid, TRF, axis=1)
    for i, pt in enumerate(projs_t):
        np.testing.assert_allclose(
            np.asarray(out.projections[:, i])[up_valid], pt.numpy()[up_valid],
            atol=1e-4, err_msg=f"projection {i} mismatch",
        )
    # x is the last projection (reference modules/model.py:505-516 layerwise)
    np.testing.assert_allclose(
        np.asarray(out.x)[up_valid], projs_t[-1].numpy()[up_valid], atol=1e-4
    )
