"""Full-model numeric parity: a torch oracle of the fairseq HuBERT/wav2vec2
forward (conv extractor -> layernorm -> post_extract_proj -> pos-conv ->
post-LN transformer stack) is built at tiny geometry, its state dict is saved
with fairseq key naming, imported via export/fairseq_import, and our
TeacherModel must reproduce hidden states end to end — including padding-mask
interactions. This is the 'teacher-forward numerical parity' hard part of
SURVEY.md §7."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from fithubert_tpu.models import TeacherModel

CONV = ((8, 10, 5), (16, 3, 2), (16, 2, 2))
D, FFN, HEADS, LAYERS = 32, 64, 4, 2
POS_K, POS_G = 16, 4


class TorchOracle(nn.Module):
    """fairseq-semantics forward, written against the equations (exact GELU,
    q scaled pre-QK^T, fp32 norms). model_type selects the fairseq frame-mask
    recompute: 'hubert' = HubertModel.forward_padding_mask (crop wave mask to
    a multiple of T', view (B, T', chunk), all(-1)); 'wav2vec2' =
    _get_feat_extract_output_lengths conv formula. extractor 'default' =
    GroupNorm on block 0; 'layer_norm' = per-block LayerNorm(+bias convs)."""

    def __init__(self, model_type="hubert", extractor_mode="default",
                 layer_norm_first=False):
        super().__init__()
        self.model_type = model_type
        self.extractor_mode = extractor_mode
        self.layer_norm_first = layer_norm_first
        convs = []
        c_in = 1
        for (dim, k, s) in CONV:
            convs.append(nn.Conv1d(c_in, dim, k, stride=s,
                                   bias=extractor_mode == "layer_norm"))
            c_in = dim
        self.convs = nn.ModuleList(convs)
        if extractor_mode == "layer_norm":
            self.block_norms = nn.ModuleList(
                [nn.LayerNorm(d) for (d, _k, _s) in CONV]
            )
        else:
            self.group_norm = nn.GroupNorm(CONV[0][0], CONV[0][0])
        self.layer_norm = nn.LayerNorm(CONV[-1][0])
        self.post_extract_proj = nn.Linear(CONV[-1][0], D)
        pos = nn.Conv1d(D, D, POS_K, padding=POS_K // 2, groups=POS_G)
        self.pos_conv = nn.utils.weight_norm(pos, name="weight", dim=2)
        self.enc_layer_norm = nn.LayerNorm(D)
        self.layers = nn.ModuleList(
            [TorchLayer(layer_norm_first) for _ in range(LAYERS)]
        )

    def forward(self, wav, padding_mask):
        x = wav.unsqueeze(1)  # (B, 1, T)
        for i, conv in enumerate(self.convs):
            x = conv(x)
            if self.extractor_mode == "layer_norm":
                x = self.block_norms[i](x.transpose(1, 2)).transpose(1, 2)
            elif i == 0:
                x = self.group_norm(x)
            x = F.gelu(x, approximate="none")
        x = x.transpose(1, 2)  # (B, T', C)
        x = self.layer_norm(x)

        if self.model_type == "hubert":
            # fairseq hubert.py forward_padding_mask: chunked all() reduction
            extra = padding_mask.size(1) % x.size(1)
            pm = padding_mask[:, :-extra] if extra > 0 else padding_mask
            frame_mask = pm.view(pm.size(0), x.size(1), -1).all(-1)
        else:
            # wav2vec2: conv length formula
            lengths = (~padding_mask).sum(-1)
            for (_d, k, s) in CONV:
                lengths = torch.div(lengths - k, s, rounding_mode="floor") + 1
            frame_mask = torch.arange(x.shape[1])[None, :] >= lengths[:, None]

        x = self.post_extract_proj(x)
        feats = x.clone()

        x = x.masked_fill(frame_mask.unsqueeze(-1), 0.0)
        pos = self.pos_conv(x.transpose(1, 2))[:, :, :-1]  # SamePad even k
        pos = F.gelu(pos, approximate="none").transpose(1, 2)
        x = x + pos
        if not self.layer_norm_first:
            x = self.enc_layer_norm(x)

        # per-layer hook capture; the reference wrapper's 'x' is the LAST
        # HOOK output (utils/utils.py:96) — for pre-LN stacks the final
        # encoder.layer_norm is therefore NEVER applied to it
        hiddens = []
        for layer in self.layers:
            x = layer(x, frame_mask)
            hiddens.append(x)
        return feats, hiddens, frame_mask


class TorchLayer(nn.Module):
    def __init__(self, layer_norm_first=False):
        super().__init__()
        self.layer_norm_first = layer_norm_first
        self.q_proj = nn.Linear(D, D)
        self.k_proj = nn.Linear(D, D)
        self.v_proj = nn.Linear(D, D)
        self.out_proj = nn.Linear(D, D)
        self.self_attn_layer_norm = nn.LayerNorm(D)
        self.fc1 = nn.Linear(D, FFN)
        self.fc2 = nn.Linear(FFN, D)
        self.final_layer_norm = nn.LayerNorm(D)

    def _attn(self, x, key_padding_mask):
        b, t, _ = x.shape
        hd = D // HEADS
        q = self.q_proj(x) * hd ** -0.5
        k = self.k_proj(x)
        v = self.v_proj(x)
        q = q.view(b, t, HEADS, hd).transpose(1, 2)
        k = k.view(b, t, HEADS, hd).transpose(1, 2)
        v = v.view(b, t, HEADS, hd).transpose(1, 2)
        logits = q @ k.transpose(-1, -2)
        logits = logits.masked_fill(
            key_padding_mask[:, None, None, :], float("-inf")
        )
        probs = logits.float().softmax(-1).to(v.dtype)
        attn = (probs @ v).transpose(1, 2).reshape(b, t, D)
        return self.out_proj(attn)

    def forward(self, x, key_padding_mask):
        if self.layer_norm_first:
            residual = x
            x = residual + self._attn(self.self_attn_layer_norm(x), key_padding_mask)
            residual = x
            y = self.fc2(F.gelu(self.fc1(self.final_layer_norm(x)), approximate="none"))
            return residual + y
        residual = x
        x = self.self_attn_layer_norm(residual + self._attn(x, key_padding_mask))
        residual = x
        y = self.fc2(F.gelu(self.fc1(x), approximate="none"))
        return self.final_layer_norm(residual + y)


def _fairseq_state_dict(oracle: TorchOracle, hubert_marker=True):
    sd = {}
    for i, conv in enumerate(oracle.convs):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = conv.weight
        if conv.bias is not None:
            sd[f"feature_extractor.conv_layers.{i}.0.bias"] = conv.bias
    if oracle.extractor_mode == "layer_norm":
        # fairseq layer_norm blocks: Sequential(conv, Dropout,
        # Sequential(TransposeLast, Fp32LayerNorm, TransposeLast), GELU)
        for i, ln in enumerate(oracle.block_norms):
            sd[f"feature_extractor.conv_layers.{i}.2.1.weight"] = ln.weight
            sd[f"feature_extractor.conv_layers.{i}.2.1.bias"] = ln.bias
    else:
        sd["feature_extractor.conv_layers.0.2.weight"] = oracle.group_norm.weight
        sd["feature_extractor.conv_layers.0.2.bias"] = oracle.group_norm.bias
    sd["layer_norm.weight"] = oracle.layer_norm.weight
    sd["layer_norm.bias"] = oracle.layer_norm.bias
    sd["post_extract_proj.weight"] = oracle.post_extract_proj.weight
    sd["post_extract_proj.bias"] = oracle.post_extract_proj.bias
    sd["encoder.pos_conv.0.weight_g"] = oracle.pos_conv.weight_g
    sd["encoder.pos_conv.0.weight_v"] = oracle.pos_conv.weight_v
    sd["encoder.pos_conv.0.bias"] = oracle.pos_conv.bias
    sd["encoder.layer_norm.weight"] = oracle.enc_layer_norm.weight
    sd["encoder.layer_norm.bias"] = oracle.enc_layer_norm.bias
    for i, layer in enumerate(oracle.layers):
        p = f"encoder.layers.{i}"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            mod = getattr(layer, name)
            sd[f"{p}.self_attn.{name}.weight"] = mod.weight
            sd[f"{p}.self_attn.{name}.bias"] = mod.bias
        for name in ("self_attn_layer_norm", "fc1", "fc2", "final_layer_norm"):
            mod = getattr(layer, name)
            sd[f"{p}.{name}.weight"] = mod.weight
            sd[f"{p}.{name}.bias"] = mod.bias
    if hubert_marker:
        sd["label_embs_concat"] = torch.zeros(4, D)  # hubert marker
    return {k: v.detach() for k, v in sd.items()}


@pytest.mark.parametrize(
    "model_type,extractor_mode,layer_norm_first",
    [
        ("hubert", "default", False),  # HuBERT-Base shape (the release teacher)
        ("wav2vec2", "default", False),  # wav2vec2-Base: conv-formula mask
        ("hubert", "layer_norm", True),  # Large-style: pre-LN + per-block LN
    ],
)
def test_teacher_forward_matches_torch_oracle(
    tmp_path, model_type, extractor_mode, layer_norm_first
):
    from fithubert_tpu.export.fairseq_import import load_fairseq_teacher

    torch.manual_seed(0)
    oracle = TorchOracle(model_type, extractor_mode, layer_norm_first).eval()
    path = str(tmp_path / "tiny_teacher.pt")
    torch.save({"model": _fairseq_state_dict(oracle, model_type == "hubert"),
                "cfg": None,
                "args": __import__("argparse").Namespace(
                    conv_feature_layers=str([tuple(t) for t in CONV]),
                    encoder_attention_heads=HEADS, activation_fn="gelu",
                    layer_norm_first=layer_norm_first,
                    extractor_mode=extractor_mode)},
               path)
    geom, variables = load_fairseq_teacher(path)
    assert geom.encoder_attention_heads == HEADS
    assert geom.model_type == model_type
    assert geom.extractor_mode == extractor_mode
    model = TeacherModel(geometry=geom)

    rng = np.random.default_rng(0)
    b, t_wav = 2, 4000
    wav = rng.standard_normal((b, t_wav)).astype(np.float32) * 0.1
    lengths = np.array([4000, 2500])
    pad = np.arange(t_wav)[None, :] >= lengths[:, None]

    with torch.no_grad():
        feats_t, hiddens_t, frame_mask_t = oracle(
            torch.from_numpy(wav), torch.from_numpy(pad)
        )

    out = model.apply(variables, jnp.asarray(wav), jnp.asarray(pad))

    np.testing.assert_array_equal(
        np.asarray(out.padding_mask), frame_mask_t.numpy()
    )
    fm = ~frame_mask_t.numpy()  # compare valid positions only
    np.testing.assert_allclose(
        np.asarray(out.features)[fm], feats_t.numpy()[fm], atol=2e-5
    )
    assert len(out.layer_results) == LAYERS
    for i, ht in enumerate(hiddens_t):
        np.testing.assert_allclose(
            np.asarray(out.layer_results[i][0])[fm], ht.numpy()[fm],
            atol=5e-5, err_msg=f"layer {i} hidden mismatch",
        )
    np.testing.assert_allclose(
        np.asarray(out.x)[fm], hiddens_t[-1].numpy()[fm], atol=5e-5
    )


def test_hubert_vs_wav2vec2_mask_differs_at_boundary():
    """The two fairseq frame-mask recomputes genuinely differ (off-by-one at
    the valid/padded boundary) — guard that our dispatch keeps them apart."""
    import dataclasses

    from fithubert_tpu.models import TeacherGeometry

    geoms = {}
    for mt in ("hubert", "wav2vec2"):
        g = TeacherGeometry(
            model_type=mt, conv_feature_layers=CONV, encoder_layers=1,
            encoder_embed_dim=D, encoder_ffn_embed_dim=FFN,
            encoder_attention_heads=HEADS, conv_pos=POS_K, conv_pos_groups=POS_G,
            use_pallas_attention=False, use_pallas_conv=False,
        )
        model = TeacherModel(geometry=g)
        wav = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 4000)), jnp.float32
        )
        pad = jnp.asarray(np.arange(4000)[None, :] >= 2500)
        variables = model.init(jax.random.PRNGKey(0), wav, pad)
        geoms[mt] = np.asarray(model.apply(variables, wav, pad).padding_mask)
    # hubert chunking admits one more boundary frame than the conv formula
    assert (~geoms["hubert"]).sum() == (~geoms["wav2vec2"]).sum() + 1
