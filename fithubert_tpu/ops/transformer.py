"""Transformer encoder with an explicit time-reduction schedule.

Replaces the reference's module-type dispatch inside the layer loop
(reference modules/module.py:303-337 dispatches on isinstance nn.Linear /
nn.Conv1d) with a static schedule: the TR layer sits at `tr_layer_index` in
the layer list, everything is shape-static and jit-safe, and all intermediate
results (layer hiddens, FFN pre-residual outputs, attention taps, TR outputs)
are explicit return values instead of hook captures.

Layout is (B, T, C) throughout — the reference's T×B×C transposes
(modules/module.py:296-297,342-343) are a cuDNN-ism with no TPU benefit.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fithubert_tpu.config import StudentConfig
from fithubert_tpu.ops.activations import gelu_exact
from fithubert_tpu.ops.attention import AttentionTaps, MultiHeadSelfAttention, bert_init
from fithubert_tpu.ops.conv import Conv1D, MultiLayerPositionalConv, PositionalConv
from fithubert_tpu.ops.norms import FP32LayerNorm
from fithubert_tpu.ops.padding import (
    apply_padding_mask,
    pad_to_multiple,
    reduce_padding_mask,
)

ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": gelu_exact,  # erf-lowered; jax.nn.gelu's erfc form is ~2x the fc matmul on VPU
    "gelu_fast": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_accurate": lambda x: jax.nn.gelu(x, approximate=True),
    "tanh": jnp.tanh,
    "linear": lambda x: x,
    "swish": jax.nn.silu,
}


class EncoderOutput(NamedTuple):
    x: jnp.ndarray  # (B, T', C) final hidden states
    layer_results: List[Tuple[jnp.ndarray, AttentionTaps, jnp.ndarray]]
    # per transformer layer: (hidden (B,T',C), taps, ffn pre-residual (B,T',C))
    tr_layer_results: List[jnp.ndarray]
    padding_mask: Optional[jnp.ndarray]  # time-reduced (B, T')


class TransformerEncoderLayer(nn.Module):
    """Pre-/post-LN BERT-style block (reference modules/module.py:472-582).

    Returns (x, taps, layer_result) where layer_result is the FFN output
    before dropout3/residual — the tensor the reference captures for
    distillation (modules/module.py:553,576).
    """

    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    activation_fn: str = "gelu"
    layer_norm_first: bool = False
    use_pallas: bool = False
    quantize: bool = False  # int8 qkvo/fc matmuls (ops/quant.py)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x,
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        need_taps: bool = False,
    ):
        from fithubert_tpu.ops.quant import dense_cls

        act = ACTIVATIONS[self.activation_fn]
        attn = MultiHeadSelfAttention(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            dropout=self.attention_dropout,
            use_pallas=self.use_pallas,
            quantize=self.quantize,
            dtype=self.dtype,
            name="self_attn",
        )
        ln_attn = FP32LayerNorm(name="self_attn_layer_norm")
        ln_final = FP32LayerNorm(name="final_layer_norm")
        fc = dense_cls(self.quantize)
        fc1 = fc(self.ffn_dim, kernel_init=bert_init, dtype=self.dtype,
                 param_dtype=jnp.float32, name="fc1")
        fc2 = fc(self.embed_dim, kernel_init=bert_init, dtype=self.dtype,
                 param_dtype=jnp.float32, name="fc2")
        drop1 = nn.Dropout(self.dropout)
        drop2 = nn.Dropout(self.activation_dropout)
        drop3 = nn.Dropout(self.dropout)

        if self.layer_norm_first:
            residual = x
            y = ln_attn(x)
            y, taps = attn(y, padding_mask, deterministic, need_taps)
            y = drop1(y, deterministic=deterministic)
            x = residual + y

            residual = x
            y = ln_final(x)
            y = act(fc1(y))
            y = drop2(y, deterministic=deterministic)
            y = fc2(y)
            layer_result = y
            y = drop3(y, deterministic=deterministic)
            x = residual + y
        else:
            residual = x
            y, taps = attn(x, padding_mask, deterministic, need_taps)
            y = drop1(y, deterministic=deterministic)
            x = ln_attn(residual + y)

            residual = x
            y = act(fc1(x))
            y = drop2(y, deterministic=deterministic)
            y = fc2(y)
            layer_result = y
            y = drop3(y, deterministic=deterministic)
            x = ln_final(residual + y)

        return x, taps, layer_result


class TimeReduction(nn.Module):
    """Time-reduction layer: halves (or /f) the sequence before attention.

    Types (reference modules/module.py:210-248):
      fc1    — concat f frames channel-wise, Linear(f*d -> d), xavier init
      fc2    — concat, Linear(f*d -> f*d) + GELU + Linear(f*d -> d)
      conv1d — Conv1d(d, d, kernel=f, stride=f)  [the released config;
               note the reference binds kernel_size to tr_reduce_factor,
               ignoring its tr_conv1d_kernel field — we keep that behavior]
    """

    embed_dim: int
    reduce_factor: int = 2
    layer_type: str = "conv1d"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        f = self.reduce_factor
        if self.layer_type == "conv1d":
            # conv with k=f, stride=f: floor(T/f) outputs, no pad needed
            t_out = t // f
            return Conv1D(
                features=self.embed_dim,
                kernel_size=f,
                stride=f,
                dtype=self.dtype,
                kernel_init=nn.initializers.variance_scaling(
                    1.0 / 3.0, "fan_in", "uniform"  # torch conv default (kaiming_uniform a=√5)
                ),
                name="conv",
            )(x)[:, :t_out, :]
        # fc variants: zero-pad T up to a multiple of f, then channel-concat
        # (reference concat_channelwise, modules/module.py:360-379)
        pad = (-t) % f
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        t_pad = x.shape[1]
        xc = x.reshape(b, t_pad // f, f, c)
        # reference concatenates strided slices x[j::f] on the channel dim
        xc = jnp.concatenate([xc[:, :, j, :] for j in range(f)], axis=-1)
        # fc variants effectively initialize N(0, 0.02): the reference's
        # explicit xavier init is dead code — init_bert_params re-initializes
        # every Linear in the encoder layer list after the TR insert
        # (reference modules/module.py:221,253-254)
        if self.layer_type == "fc1":
            return nn.Dense(
                self.embed_dim, kernel_init=bert_init,
                dtype=self.dtype, param_dtype=jnp.float32, name="fc",
            )(xc)
        if self.layer_type == "fc2":
            h = nn.Dense(self.embed_dim * f, kernel_init=bert_init,
                         dtype=self.dtype, param_dtype=jnp.float32, name="fc_a")(xc)
            h = gelu_exact(h)
            return nn.Dense(self.embed_dim, kernel_init=bert_init,
                            dtype=self.dtype, param_dtype=jnp.float32, name="fc_b")(h)
        raise NotImplementedError(
            "tr_layer_type must be one of ['fc1', 'fc2', 'conv1d']"
        )


def _transformer_layer_kwargs(cfg: StudentConfig, dtype):
    """Single source of layer hyperparameters for BOTH the unrolled loop and
    the scan template — a field added in one place reaches both paths."""
    return dict(
        embed_dim=cfg.encoder_embed_dim,
        ffn_dim=cfg.encoder_ffn_embed_dim,
        num_heads=cfg.encoder_attention_heads,
        dropout=cfg.dropout,
        attention_dropout=cfg.attention_dropout,
        activation_dropout=cfg.activation_dropout,
        activation_fn=cfg.activation_fn,
        layer_norm_first=cfg.layer_norm_first,
        use_pallas=cfg.use_pallas_attention,
        quantize=cfg.quantize_matmuls,
        dtype=dtype,
    )


class TransformerEncoder(nn.Module):
    """Encoder stack with conv positional embedding and TR-layer schedule.

    Reference modules/module.py:119-383. Differences by design:
      - static TR schedule instead of isinstance dispatch;
      - layerdrop is a stochastic identity gate (jit-safe) rather than a
        python-level skip — identical in expectation, and the release
        configs use layerdrop 0.0;
      - layer_results are always captured for all transformer layers.
    """

    cfg: StudentConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x,
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        need_taps: bool = False,
        tgt_slot: Optional[int] = None,  # stop after layer-list slot N —
        # SLOT indexing includes the TR module, exactly like the reference's
        # tgt_layer over the torch ModuleList (modules/module.py:330-337)
    ) -> EncoderOutput:
        cfg = self.cfg

        # under a kernel mesh, pin the encoder input to the 'data' axis —
        # GSPMD propagation can drift to replication inside scan bodies
        # (observed: pos_conv all-gathering its batch in the accum loop)
        from fithubert_tpu.parallel import constrain_batch_sharded

        x = constrain_batch_sharded(x)

        if padding_mask is not None:
            x = apply_padding_mask(x, padding_mask)

        if cfg.pos_conv_depth > 1:
            pos = MultiLayerPositionalConv(
                embed_dim=cfg.encoder_embed_dim,
                depth=cfg.pos_conv_depth,
                kernel_size=cfg.conv_pos,
                groups=cfg.conv_pos_groups,
                dtype=self.dtype,
                name="pos_conv",
            )(x)
        else:
            pos = PositionalConv(
                embed_dim=cfg.encoder_embed_dim,
                kernel_size=cfg.conv_pos,
                groups=cfg.conv_pos_groups,
                dtype=self.dtype,
                name="pos_conv",
            )(x)
        x = x + pos

        if not cfg.layer_norm_first:
            x = FP32LayerNorm(name="layer_norm")(x)

        x, pad_length = pad_to_multiple(x, cfg.required_seq_len_multiple, axis=-2)
        if pad_length > 0 and padding_mask is None:
            b, t = x.shape[0], x.shape[1]
            padding_mask = jnp.zeros((b, t), dtype=bool).at[:, -pad_length:].set(True)
        elif padding_mask is not None:
            padding_mask, _ = pad_to_multiple(
                padding_mask, cfg.required_seq_len_multiple, axis=-1, value=True
            )

        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        layer_results = []
        tr_layer_results = []
        tr_slot = cfg.tr_layer_index if cfg.enable_tr_layer else -1

        # scan-over-layers: trace/compile the layer ONCE and lax.scan over
        # per-layer params stacked at trace time from the layers_{i} subtrees
        # — the param tree stays byte-identical to the unrolled path, so
        # importers / checkpoints / TP sharding rules are untouched.
        # Compile-time lever: the 12-layer release stacks dominate both the
        # CPU test suite's tracing and the ~80 s remote TPU compiles.
        # Fallbacks to the unrolled loop: param creation (init), tgt_slot
        # early exit, conformer blocks, and need_taps (scan would physically
        # stack every layer's (B*H, T, T) taps; unrolled lets XLA DCE all but
        # the last layer's, the only one the attn/v_rel losses read).
        scan_pref = cfg.scan_layers
        if scan_pref is None:  # auto: throughput on TPU, compile speed off it
            scan_pref = jax.devices()[0].platform != "tpu"
        use_scan = (
            scan_pref
            and not self.is_initializing()
            and tgt_slot is None
            and cfg.layer_type != "conformer"
            and not need_taps
        )

        layer_idx = 0
        num_slots = cfg.encoder_layers + (1 if cfg.enable_tr_layer else 0)
        slot = 0
        while slot < num_slots:
            if slot == tr_slot:
                x = TimeReduction(
                    embed_dim=cfg.encoder_embed_dim,
                    reduce_factor=cfg.tr_reduce_factor,
                    layer_type=cfg.tr_layer_type,
                    dtype=self.dtype,
                    name="tr_layer",
                )(x)
                tr_layer_results.append(x)
                padding_mask = reduce_padding_mask(
                    padding_mask, cfg.tr_reduce_factor,
                    # fc types pad x to ceil(t/f) frames (concat_channelwise);
                    # the mask must match (see reduce_padding_mask)
                    ceil=cfg.tr_layer_type in ("fc1", "fc2"),
                )
                if tgt_slot is not None and slot >= tgt_slot:
                    break
                slot += 1
                continue

            if use_scan:
                # contiguous run of transformer layers up to the TR slot/end
                run_end = slot
                while run_end < num_slots and run_end != tr_slot:
                    run_end += 1
                n_run = run_end - slot
                ids = list(range(layer_idx, layer_idx + n_run))
                x, results = self._scan_layer_run(
                    x, padding_mask, deterministic, ids
                )
                layer_results.extend(results)
                layer_idx += n_run
                slot = run_end
                continue

            if cfg.layer_type == "conformer":
                # layer_type=conformer with pos_enc_type='abs' builds conformer
                # blocks inside the plain encoder (reference modules/module.py:132-143)
                from fithubert_tpu.ops.conformer import ConformerEncoderLayer

                layer_cls = ConformerEncoderLayer
                if cfg.checkpoint_activations:
                    # rematerialize activations in backward (reference wraps
                    # layers in fairseq checkpoint_wrapper, modules/module.py:
                    # 144-145; here jax.checkpoint trades FLOPs for HBM)
                    # __call__(self, x, mask, pos_emb, deterministic, need_taps)
                    layer_cls = nn.remat(layer_cls, static_argnums=(4, 5))
                layer = layer_cls(
                    embed_dim=cfg.encoder_embed_dim,
                    ffn_dim=cfg.encoder_ffn_embed_dim,
                    num_heads=cfg.encoder_attention_heads,
                    dropout=cfg.dropout,
                    depthwise_conv_kernel_size=cfg.depthwise_conv_kernel_size,
                    pos_enc_type="abs",
                    attn_type=cfg.attn_type,
                    quantize=cfg.quantize_matmuls,
                    dtype=self.dtype,
                    name=f"layers_{layer_idx}",
                )
                y, taps, layer_result = layer(
                    x, padding_mask, None, deterministic, need_taps
                )
            else:
                layer_cls = TransformerEncoderLayer
                if cfg.checkpoint_activations:
                    # __call__(self, x, padding_mask, deterministic, need_taps)
                    layer_cls = nn.remat(layer_cls, static_argnums=(3, 4))
                layer = layer_cls(
                    **_transformer_layer_kwargs(cfg, self.dtype),
                    name=f"layers_{layer_idx}",
                )
                y, taps, layer_result = layer(x, padding_mask, deterministic, need_taps)
            if cfg.encoder_layerdrop > 0 and not deterministic:
                keep = (
                    jax.random.uniform(self.make_rng("layerdrop"), ())
                    > cfg.encoder_layerdrop
                )
                y = jnp.where(keep, y, x)
            x = y
            layer_results.append((x, taps, layer_result))
            layer_idx += 1
            if tgt_slot is not None and slot >= tgt_slot:
                break
            slot += 1

        # undo pad_to_multiple (reference modules/module.py:346-356). After a
        # TR layer the tail pad has been folded into reduced frames; the
        # reference only unpads when pad_length survives (no TR in release
        # config path since required_seq_len_multiple=1).
        if pad_length > 0 and not cfg.enable_tr_layer:
            x = x[:, :-pad_length]
            if padding_mask is not None:
                padding_mask = padding_mask[:, :-pad_length]
            layer_results = [
                (h[:, :-pad_length], taps, lr[:, :-pad_length])
                for (h, taps, lr) in layer_results
            ]

        # pre-norm stacks normalize the FINAL hidden (fairseq applies
        # encoder.layer_norm after the layer loop when layer_norm_first and
        # no tgt_layer; layer_results stay un-normalized, matching fairseq)
        if cfg.layer_norm_first and tgt_slot is None:
            x = FP32LayerNorm(name="layer_norm")(x)

        return EncoderOutput(
            x=x,
            layer_results=layer_results,
            tr_layer_results=tr_layer_results,
            padding_mask=padding_mask,
        )

    def _scan_layer_run(self, x, padding_mask, deterministic: bool, ids):
        """lax.scan over a contiguous run of transformer layers.

        Per-layer params are stacked at trace time from this module's
        `layers_{i}` subtrees and the (unbound) layer template is applied
        functionally per step — numerically identical to the unrolled loop
        while tracing/compiling the layer body once. Returns
        (x, [(hidden, taps, layer_result)] per layer), matching the
        unrolled list interface (taps are None: scan is gated off when
        need_taps)."""
        cfg = self.cfg
        n = len(ids)
        params = self.variables["params"]
        stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[params[f"layers_{i}"] for i in ids]
        )
        template = TransformerEncoderLayer(
            **_transformer_layer_kwargs(cfg, self.dtype)
        )
        # draw dropout rngs only when a dropout actually fires — flax
        # nn.Dropout(rate=0) never calls make_rng, and callers relying on
        # that may legitimately omit the 'dropout' rng. Layerdrop is gated
        # independently (it has its own rng stream).
        use_dropout_rng = not deterministic and (
            cfg.dropout > 0
            or cfg.attention_dropout > 0
            or cfg.activation_dropout > 0
        )
        drop_keys = (
            jax.random.split(self.make_rng("dropout"), n)
            if use_dropout_rng
            else jnp.zeros((n, 2), jnp.uint32)
        )
        layerdrop = cfg.encoder_layerdrop > 0 and not deterministic
        ld_keys = (
            jax.random.split(self.make_rng("layerdrop"), n)
            if layerdrop
            else jnp.zeros((n, 2), jnp.uint32)
        )

        from fithubert_tpu.parallel import constrain_batch_sharded

        def body(carry, per):
            # pin the carry's batch sharding: GSPMD propagation can drift to
            # replication inside scan bodies (same failure mode as the
            # encoder-entry pin above; no-op without a kernel mesh)
            h = constrain_batch_sharded(carry)
            p, dk, lk = per
            rngs = {"dropout": dk} if use_dropout_rng else {}
            y, _taps, layer_result = template.apply(
                {"params": p}, h, padding_mask, deterministic, False,
                rngs=rngs,
            )
            if layerdrop:
                keep = jax.random.uniform(lk, ()) > cfg.encoder_layerdrop
                y = jnp.where(keep, y, h)
            return y, (y, layer_result)

        if cfg.checkpoint_activations:
            # reference wraps layers in fairseq checkpoint_wrapper
            # (modules/module.py:144-145); remat the scan body.
            # prevent_cse=False: lax.scan already provides the CSE barrier
            # (per the jax.checkpoint docs), avoiding optimization-barrier
            # overhead in compile and backward
            body = jax.checkpoint(body, prevent_cse=False)
        x, (hiddens, layer_res) = jax.lax.scan(
            body, x, (stacked, drop_keys, ld_keys)
        )
        results = [
            (hiddens[i], AttentionTaps(None, None), layer_res[i])
            for i in range(n)
        ]
        return x, results
