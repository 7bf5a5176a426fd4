"""Conformer encoder numeric parity vs a torch oracle of fairseq semantics.

The reference's conformer family is built from fairseq modules (reference
modules/module.py:132-143,386-469): ConformerWav2Vec2EncoderLayer (macaron
0.5*FFN -> MHA -> conv module -> 0.5*FFN -> LN), espnet
RelPositionMultiHeadedAttention / RotaryPositionMultiHeadedAttention, and
espnet RelPositionalEncoding. This file reimplements those modules in torch
with fairseq's exact state-dict naming, imports the weights through
export/fairseq_import.map_conformer_layer, and asserts our ConformerEncoder
reproduces every layer hidden, every ffn2 pre-residual layer_result, and the
final output.

Quirks deliberately pinned here:
  - rotary is applied to the PRE-projection per-head view of query/key
    (fairseq espnet_multihead_attention.py RotaryPositionMultiHeadedAttention
    rotates before linear_q/linear_k; value stays unrotated);
  - the conv module's three convs are bias-free (fairseq bias=False default);
  - BatchNorm runs in eval mode off imported running stats (batch_stats);
  - the rel-pos table spans positions T-1 .. -(T-1) (espnet extend_pe).
"""

import dataclasses
import math

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

import jax.numpy as jnp

from fithubert_tpu.config import StudentConfig
from fithubert_tpu.export.fairseq_import import _layernorm, map_conformer_layer
from fithubert_tpu.ops.conformer import ConformerEncoder

B, T, D, H, FFN, K = 2, 18, 48, 4, 96, 7
DK = D // H
LAYERS = 2

CFG = StudentConfig(
    conv_feature_layers=((16, 10, 5),),
    encoder_layers=LAYERS,
    encoder_embed_dim=D,
    encoder_ffn_embed_dim=FFN,
    encoder_attention_heads=H,
    dropout=0.0,
    attention_dropout=0.0,
    layer_type="conformer",
    attn_type="espnet",
    depthwise_conv_kernel_size=K,
    enable_tr_layer=False,
    use_pallas_attention=False,
)


def relpos_table(t: int, d: int) -> torch.Tensor:
    """espnet RelPositionalEncoding.extend_pe (positions t-1 .. -(t-1))."""
    position = torch.arange(0, t, dtype=torch.float32).unsqueeze(1)
    div = torch.exp(
        torch.arange(0, d, 2, dtype=torch.float32) * -(math.log(10000.0) / d)
    )
    pe_pos = torch.zeros(t, d)
    pe_neg = torch.zeros(t, d)
    pe_pos[:, 0::2] = torch.sin(position * div)
    pe_pos[:, 1::2] = torch.cos(position * div)
    pe_neg[:, 0::2] = torch.sin(-position * div)
    pe_neg[:, 1::2] = torch.cos(-position * div)
    return torch.cat([torch.flip(pe_pos, [0]), pe_neg[1:]], dim=0)  # (2t-1, d)


class TorchFFN(nn.Module):
    """fairseq FeedForwardModule: LN -> w_1 -> SiLU -> w_2."""

    def __init__(self):
        super().__init__()
        self.layer_norm = nn.LayerNorm(D)
        self.w_1 = nn.Linear(D, FFN)
        self.w_2 = nn.Linear(FFN, D)

    def forward(self, x):
        return self.w_2(torch.nn.functional.silu(self.w_1(self.layer_norm(x))))


class TorchRelPosAttn(nn.Module):
    """espnet RelPositionMultiHeadedAttention (fairseq adaptation)."""

    def __init__(self):
        super().__init__()
        self.linear_q = nn.Linear(D, D)
        self.linear_k = nn.Linear(D, D)
        self.linear_v = nn.Linear(D, D)
        self.linear_out = nn.Linear(D, D)
        self.linear_pos = nn.Linear(D, D, bias=False)
        self.pos_bias_u = nn.Parameter(torch.randn(H, DK) * 0.2)
        self.pos_bias_v = nn.Parameter(torch.randn(H, DK) * 0.2)

    @staticmethod
    def rel_shift(x):
        b, h, t, n = x.shape  # n = 2t-1
        x = torch.cat([torch.zeros(b, h, t, 1), x], dim=-1)
        x = x.view(b, h, n + 1, t)[:, :, 1:].reshape(b, h, t, n)
        return x[..., :t]

    def forward(self, x, pos_emb, mask):
        b, t, _ = x.shape
        q = self.linear_q(x).view(b, t, H, DK)
        k = self.linear_k(x).view(b, t, H, DK).transpose(1, 2)
        v = self.linear_v(x).view(b, t, H, DK).transpose(1, 2)
        p = self.linear_pos(pos_emb).view(1, -1, H, DK).transpose(1, 2)
        ac = (q + self.pos_bias_u).transpose(1, 2) @ k.transpose(-2, -1)
        bd = self.rel_shift(
            (q + self.pos_bias_v).transpose(1, 2) @ p.transpose(-2, -1)
        )
        scores = (ac + bd) / math.sqrt(DK)
        scores = scores.masked_fill(mask[:, None, None, :], float("-inf"))
        out = (torch.softmax(scores, -1) @ v).transpose(1, 2).reshape(b, t, D)
        return self.linear_out(out)


class TorchRotaryAttn(nn.Module):
    """fairseq RotaryPositionMultiHeadedAttention: rotary on the raw
    per-head input BEFORE the linear projections; value unrotated."""

    def __init__(self):
        super().__init__()
        self.linear_q = nn.Linear(D, D)
        self.linear_k = nn.Linear(D, D)
        self.linear_v = nn.Linear(D, D)
        self.linear_out = nn.Linear(D, D)

    @staticmethod
    def rotate(x):  # (B, T, H, DK), positions over T
        inv = 1.0 / (10000 ** (torch.arange(0, DK, 2).float() / DK))
        freqs = torch.einsum(
            "i,j->ij", torch.arange(x.shape[1]).float(), inv
        )
        emb = torch.cat((freqs, freqs), dim=-1)
        cos = emb.cos()[None, :, None, :]
        sin = emb.sin()[None, :, None, :]
        half = torch.cat((-x[..., DK // 2:], x[..., : DK // 2]), dim=-1)
        return x * cos + half * sin

    def forward(self, x, pos_emb, mask):
        b, t, _ = x.shape
        x_rot = self.rotate(x.view(b, t, H, DK)).reshape(b, t, D)
        q = self.linear_q(x_rot).view(b, t, H, DK).transpose(1, 2)
        k = self.linear_k(x_rot).view(b, t, H, DK).transpose(1, 2)
        v = self.linear_v(x).view(b, t, H, DK).transpose(1, 2)
        scores = q @ k.transpose(-2, -1) / math.sqrt(DK)
        scores = scores.masked_fill(mask[:, None, None, :], float("-inf"))
        out = (torch.softmax(scores, -1) @ v).transpose(1, 2).reshape(b, t, D)
        return self.linear_out(out)


class TorchConvModule(nn.Module):
    """fairseq ConvolutionModule (all convs bias=False)."""

    def __init__(self):
        super().__init__()
        self.layer_norm = nn.LayerNorm(D)
        self.pointwise_conv1 = nn.Conv1d(D, 2 * D, 1, bias=False)
        self.depthwise_conv = nn.Conv1d(
            D, D, K, padding=(K - 1) // 2, groups=D, bias=False
        )
        self.batch_norm = nn.BatchNorm1d(D)
        self.pointwise_conv2 = nn.Conv1d(D, D, 1, bias=False)

    def forward(self, x):  # (B, T, C)
        x = self.layer_norm(x).transpose(1, 2)
        x = torch.nn.functional.glu(self.pointwise_conv1(x), dim=1)
        x = self.batch_norm(self.depthwise_conv(x))
        x = self.pointwise_conv2(torch.nn.functional.silu(x))
        return x.transpose(1, 2)


class TorchConformerLayer(nn.Module):
    def __init__(self, pos_enc_type):
        super().__init__()
        self.ffn1 = TorchFFN()
        self.self_attn_layer_norm = nn.LayerNorm(D)
        self.self_attn = (
            TorchRelPosAttn() if pos_enc_type == "rel_pos" else TorchRotaryAttn()
        )
        self.conv_module = TorchConvModule()
        self.ffn2 = TorchFFN()
        self.final_layer_norm = nn.LayerNorm(D)

    def forward(self, x, pos_emb, mask):
        x = self.ffn1(x) * 0.5 + x
        residual = x
        x = self.self_attn(self.self_attn_layer_norm(x), pos_emb, mask)
        x = x + residual
        x = x + self.conv_module(x)
        residual = x
        x = self.ffn2(x)
        layer_result = x
        x = x * 0.5 + residual
        return self.final_layer_norm(x), layer_result


class TorchConformerEncoder(nn.Module):
    """Reference ConformerEncoder.extract_features, minus its latent bugs
    (undefined self.need_weights, tgt_layer-gated capture — SURVEY §4)."""

    def __init__(self, pos_enc_type):
        super().__init__()
        self.pos_enc_type = pos_enc_type
        self.layers = nn.ModuleList(
            [TorchConformerLayer(pos_enc_type) for _ in range(LAYERS)]
        )
        self.layer_norm = nn.LayerNorm(D)

    def forward(self, x, mask):
        x = x.masked_fill(mask.unsqueeze(-1), 0.0)
        pos_emb = relpos_table(T, D) if self.pos_enc_type == "rel_pos" else None
        x = self.layer_norm(x)  # layer_norm_first=False: pre-stack LN
        results = []
        for layer in self.layers:
            x, lr = layer(x, pos_emb, mask)
            results.append((x, lr))
        return x, results


def _import_params(oracle):
    sd = {k: v.detach() for k, v in oracle.state_dict().items()}
    params = {"layer_norm": _layernorm(sd, "layer_norm")}
    stats = {}
    for i in range(LAYERS):
        p, s = map_conformer_layer(sd, f"layers.{i}")
        params[f"layers_{i}"] = p
        stats[f"layers_{i}"] = s
    return params, stats


@pytest.mark.parametrize("pos_enc_type", ["rel_pos", "rope"])
def test_conformer_encoder_matches_torch_oracle(pos_enc_type):
    torch.manual_seed(3)
    oracle = TorchConformerEncoder(pos_enc_type)
    # exercise imported BatchNorm running stats, not the (0, 1) defaults
    for layer in oracle.layers:
        bn = layer.conv_module.batch_norm
        bn.running_mean.copy_(torch.randn(D) * 0.3)
        bn.running_var.copy_(torch.rand(D) + 0.5)
    oracle.eval()

    x_np = np.random.default_rng(7).standard_normal((B, T, D)).astype(np.float32)
    mask_np = np.arange(T)[None, :] >= np.asarray([T, T - 5])[:, None]

    with torch.no_grad():
        want_x, want_results = oracle(
            torch.from_numpy(x_np), torch.from_numpy(mask_np)
        )

    cfg = dataclasses.replace(CFG, pos_enc_type=pos_enc_type)
    params, stats = _import_params(oracle)
    enc = ConformerEncoder(cfg=cfg)
    out = enc.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x_np),
        jnp.asarray(mask_np),
        deterministic=True,
    )

    np.testing.assert_allclose(
        np.asarray(out.x), want_x.numpy(), atol=2e-5, rtol=1e-5
    )
    assert len(out.layer_results) == LAYERS
    for i, (ours, want) in enumerate(zip(out.layer_results, want_results)):
        x_i, _taps, lr_i = ours
        np.testing.assert_allclose(
            np.asarray(x_i), want[0].numpy(), atol=2e-5, rtol=1e-5,
            err_msg=f"layer {i} hidden",
        )
        np.testing.assert_allclose(
            np.asarray(lr_i), want[1].numpy(), atol=2e-5, rtol=1e-5,
            err_msg=f"layer {i} ffn2 pre-residual",
        )


def test_imported_tree_matches_init_tree():
    """map_conformer_layer's output must be structurally identical to what
    ConformerEncoder.init creates (missing/mistyped leaves would make flax
    silently re-init or crash at apply time)."""
    torch.manual_seed(0)
    oracle = TorchConformerEncoder("rel_pos")
    params, stats = _import_params(oracle)
    cfg = dataclasses.replace(CFG, pos_enc_type="rel_pos")
    variables = ConformerEncoder(cfg=cfg).init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, T, D)),
        jnp.zeros((1, T), bool),
    )
    want_p = jax.tree_util.tree_map(lambda a: a.shape, variables["params"])
    got_p = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    assert want_p == got_p
    want_s = jax.tree_util.tree_map(lambda a: a.shape, variables["batch_stats"])
    got_s = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, stats)
    assert want_s == got_s


def test_default_attn_type_builds_plain_mha():
    """attn_type='' (the config default) must build the standard fairseq
    MultiheadAttention even under pos_enc_type=rel_pos — fairseq only uses
    the espnet attentions when attn_type == 'espnet'
    (fairseq conformer_layer.py dispatch; reference modules/module.py:396)."""
    cfg = dataclasses.replace(CFG, pos_enc_type="rel_pos", attn_type="")
    variables = ConformerEncoder(cfg=cfg).init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, T, D)),
        jnp.zeros((1, T), bool),
    )
    attn = variables["params"]["layers_0"]["self_attn"]
    assert "linear_pos" not in attn and "pos_bias_u" not in attn
    assert "q_proj" in attn
