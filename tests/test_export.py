"""Export-layer tests: fairseq teacher import, reference student import, and
the s3prl upstream expert contract (SURVEY.md §2.15, §7 steps 3/7).

Synthetic torch checkpoints are built with the exact fairseq / reference key
naming and shapes, then imported; the resulting pytrees must match the
model-initialized trees key-for-key and shape-for-shape.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fithubert_tpu.config import (
    ExperimentConfig,
    StudentConfig,
    dump_yaml_config,
)
from fithubert_tpu.models import StudentModel, TeacherGeometry, TeacherModel


TINY_CONV = ((8, 10, 5), (16, 3, 2), (16, 2, 2))


def _t(*shape):
    return torch.randn(*shape) * 0.05


def make_fairseq_state_dict(d=32, ffn=64, layers=2, conv=TINY_CONV, ctc_vocab=0):
    sd = {}
    in_ch = 1
    for i, (dim, k, _s) in enumerate(conv):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = _t(dim, in_ch, k)
        in_ch = dim
    sd["feature_extractor.conv_layers.0.2.weight"] = _t(conv[0][0])
    sd["feature_extractor.conv_layers.0.2.bias"] = _t(conv[0][0])
    embed = conv[-1][0]
    sd["layer_norm.weight"] = _t(embed)
    sd["layer_norm.bias"] = _t(embed)
    sd["post_extract_proj.weight"] = _t(d, embed)
    sd["post_extract_proj.bias"] = _t(d)
    k_pos, g_pos = 16, 4
    sd["encoder.pos_conv.0.weight_g"] = _t(1, 1, k_pos)
    sd["encoder.pos_conv.0.weight_v"] = _t(d, d // g_pos, k_pos)
    sd["encoder.pos_conv.0.bias"] = _t(d)
    sd["encoder.layer_norm.weight"] = _t(d)
    sd["encoder.layer_norm.bias"] = _t(d)
    for i in range(layers):
        p = f"encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{p}.self_attn.{proj}.weight"] = _t(d, d)
            sd[f"{p}.self_attn.{proj}.bias"] = _t(d)
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            sd[f"{p}.{ln}.weight"] = _t(d)
            sd[f"{p}.{ln}.bias"] = _t(d)
        sd[f"{p}.fc1.weight"] = _t(ffn, d)
        sd[f"{p}.fc1.bias"] = _t(ffn)
        sd[f"{p}.fc2.weight"] = _t(d, ffn)
        sd[f"{p}.fc2.bias"] = _t(d)
    sd["label_embs_concat"] = _t(10, d)  # hubert marker
    if ctc_vocab:
        del sd["label_embs_concat"]
        sd = {f"w2v_encoder.w2v_model.{k}": v for k, v in sd.items()}
        sd["w2v_encoder.proj.weight"] = _t(ctc_vocab, d)
        sd["w2v_encoder.proj.bias"] = _t(ctc_vocab)
    return sd


def _shapes(tree):
    return jax.tree.map(lambda x: tuple(x.shape), tree)


def test_fairseq_teacher_import(tmp_path):
    from fithubert_tpu.export.fairseq_import import load_fairseq_teacher

    sd = make_fairseq_state_dict()
    path = str(tmp_path / "hubert_tiny.pt")
    torch.save(
        {
            "model": sd,
            "cfg": None,
            "args": __import__("argparse").Namespace(
                conv_feature_layers=str([tuple(t) for t in TINY_CONV]),
                encoder_attention_heads=4,
                activation_fn="gelu",
                layer_norm_first=False,
                conv_pos=16,
                conv_pos_groups=4,
                extractor_mode="default",
            ),
        },
        path,
    )
    geom, variables = load_fairseq_teacher(path)
    assert geom.model_type == "hubert"
    assert geom.encoder_layers == 2
    assert geom.encoder_embed_dim == 32
    assert geom.encoder_attention_heads == 4
    assert geom.conv_feature_layers == TINY_CONV

    model = TeacherModel(geometry=geom)
    wav = jnp.zeros((1, 4000))
    init_vars = model.init(jax.random.PRNGKey(0), wav, jnp.zeros((1, 4000), bool))
    assert _shapes(init_vars["params"]) == _shapes(variables["params"])

    out = model.apply(variables, wav, jnp.zeros((1, 4000), bool))
    assert out.x.shape[-1] == 32
    assert len(out.layer_results) == 2
    assert np.all(np.isfinite(np.asarray(out.x)))


def test_fairseq_ctc_teacher_import(tmp_path):
    from fithubert_tpu.export.fairseq_import import load_fairseq_teacher

    sd = make_fairseq_state_dict(ctc_vocab=32)
    path = str(tmp_path / "w2v_ctc_tiny.pt")
    torch.save({"model": sd, "cfg": None}, path)
    geom, variables = load_fairseq_teacher(path)
    assert geom.model_type == "wav2vec_ctc"
    assert geom.vocab_size == 32
    model = TeacherModel(geometry=geom)
    out = model.apply(variables, jnp.zeros((1, 4000)), jnp.zeros((1, 4000), bool))
    assert out.ctc_logits.shape[-1] == 32


STUDENT_CFG = StudentConfig(
    conv_feature_layers=TINY_CONV,
    conv_pos=16,
    conv_pos_groups=4,
    encoder_layers=2,
    encoder_embed_dim=32,
    encoder_ffn_embed_dim=64,
    encoder_attention_heads=4,
    dropout=0.0,
    attention_dropout=0.0,
    dropout_input=0.0,
    pred_head_final_dim=48,
    pred_layer_id=(1,),
    layerwise_proj=True,
    enable_tr_layer=True,
    tr_layer_type="conv1d",
    tr_layer_index=0,
    tr_reduce_factor=2,
    use_pallas_attention=False,
)


def make_reference_student_state_dict(cfg: StudentConfig):
    d = cfg.encoder_embed_dim
    sd = {}
    in_ch = 1
    for i, (dim, k, _s) in enumerate(cfg.conv_feature_layers):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = _t(dim, in_ch, k)
        in_ch = dim
    dim0 = cfg.conv_feature_layers[0][0]
    sd["feature_extractor.conv_layers.0.2.weight"] = _t(dim0)
    sd["feature_extractor.conv_layers.0.2.bias"] = _t(dim0)
    embed = cfg.conv_feature_layers[-1][0]
    sd["layer_norm.weight"] = _t(embed)
    sd["layer_norm.bias"] = _t(embed)
    sd["post_extract_proj.weight"] = _t(d, embed)
    sd["post_extract_proj.bias"] = _t(d)
    sd["encoder.pos_conv.0.weight_g"] = _t(1, 1, cfg.conv_pos)
    sd["encoder.pos_conv.0.weight_v"] = _t(d, d // cfg.conv_pos_groups, cfg.conv_pos)
    sd["encoder.pos_conv.0.bias"] = _t(d)
    sd["encoder.layer_norm.weight"] = _t(d)
    sd["encoder.layer_norm.bias"] = _t(d)
    # torch ModuleList with the TR conv1d inserted at index 0
    sd["encoder.layers.0.weight"] = _t(d, d, cfg.tr_reduce_factor)
    sd["encoder.layers.0.bias"] = _t(d)
    for j in (1, 2):
        p = f"encoder.layers.{j}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{p}.self_attn.{proj}.weight"] = _t(d, d)
            sd[f"{p}.self_attn.{proj}.bias"] = _t(d)
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            sd[f"{p}.{ln}.weight"] = _t(d)
            sd[f"{p}.{ln}.bias"] = _t(d)
        sd[f"{p}.fc1.weight"] = _t(cfg.encoder_ffn_embed_dim, d)
        sd[f"{p}.fc1.bias"] = _t(cfg.encoder_ffn_embed_dim)
        sd[f"{p}.fc2.weight"] = _t(d, cfg.encoder_ffn_embed_dim)
        sd[f"{p}.fc2.bias"] = _t(d)
    for i in range(cfg.encoder_layers):
        sd[f"proj_head.{i}.upsampler.weight"] = _t(d, d, cfg.tr_reduce_factor)
        sd[f"proj_head.{i}.upsampler.bias"] = _t(d)
        sd[f"proj_head.{i}.lin_proj.weight"] = _t(cfg.pred_head_final_dim, d)
        sd[f"proj_head.{i}.lin_proj.bias"] = _t(cfg.pred_head_final_dim)
    return sd


def test_reference_student_import_shapes():
    from fithubert_tpu.export.reference_import import map_student_state_dict

    cfg = STUDENT_CFG
    sd = make_reference_student_state_dict(cfg)
    params = map_student_state_dict(sd, cfg)

    model = StudentModel(cfg=cfg)
    wav = jnp.zeros((1, 4000))
    init_vars = model.init(
        {"params": jax.random.PRNGKey(0)}, wav, jnp.zeros((1, 4000), bool)
    )
    assert _shapes(init_vars["params"]) == _shapes(params)
    out = model.apply({"params": params}, wav, jnp.zeros((1, 4000), bool))
    assert np.all(np.isfinite(np.asarray(out.x)))


def test_reference_conformer_student_import_shapes():
    """Student-level import wiring for the dedicated ConformerEncoder family:
    no TR slot and no pos_conv are mapped (the reference ConformerEncoder
    rebuilds its layer list without the TR module and never runs pos_conv,
    modules/module.py:420-430,434-469), espnet rel_pos attention naming, and
    BatchNorm running stats land in the batch_stats collection."""
    import dataclasses

    from fithubert_tpu.export.reference_import import map_student_state_dict

    cfg = dataclasses.replace(
        STUDENT_CFG, layer_type="conformer", pos_enc_type="rel_pos",
        attn_type="espnet", depthwise_conv_kernel_size=7,
        enable_tr_layer=False,
    )
    d = cfg.encoder_embed_dim
    h = cfg.encoder_attention_heads
    sd = {}
    in_ch = 1
    for i, (dim, k, _s) in enumerate(cfg.conv_feature_layers):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = _t(dim, in_ch, k)
        in_ch = dim
    dim0 = cfg.conv_feature_layers[0][0]
    sd["feature_extractor.conv_layers.0.2.weight"] = _t(dim0)
    sd["feature_extractor.conv_layers.0.2.bias"] = _t(dim0)
    embed = cfg.conv_feature_layers[-1][0]
    sd["layer_norm.weight"] = _t(embed)
    sd["layer_norm.bias"] = _t(embed)
    sd["post_extract_proj.weight"] = _t(d, embed)
    sd["post_extract_proj.bias"] = _t(d)
    # the torch module still BUILDS pos_conv (inherited) — present but unused
    sd["encoder.pos_conv.0.weight_g"] = _t(1, 1, cfg.conv_pos)
    sd["encoder.pos_conv.0.weight_v"] = _t(d, d // cfg.conv_pos_groups, cfg.conv_pos)
    sd["encoder.pos_conv.0.bias"] = _t(d)
    sd["encoder.layer_norm.weight"] = _t(d)
    sd["encoder.layer_norm.bias"] = _t(d)
    for j in range(cfg.encoder_layers):
        p = f"encoder.layers.{j}"
        for ffn in ("ffn1", "ffn2"):
            sd[f"{p}.{ffn}.layer_norm.weight"] = _t(d)
            sd[f"{p}.{ffn}.layer_norm.bias"] = _t(d)
            sd[f"{p}.{ffn}.w_1.weight"] = _t(cfg.encoder_ffn_embed_dim, d)
            sd[f"{p}.{ffn}.w_1.bias"] = _t(cfg.encoder_ffn_embed_dim)
            sd[f"{p}.{ffn}.w_2.weight"] = _t(d, cfg.encoder_ffn_embed_dim)
            sd[f"{p}.{ffn}.w_2.bias"] = _t(d)
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            sd[f"{p}.{ln}.weight"] = _t(d)
            sd[f"{p}.{ln}.bias"] = _t(d)
        for proj in ("linear_q", "linear_k", "linear_v", "linear_out"):
            sd[f"{p}.self_attn.{proj}.weight"] = _t(d, d)
            sd[f"{p}.self_attn.{proj}.bias"] = _t(d)
        sd[f"{p}.self_attn.linear_pos.weight"] = _t(d, d)
        sd[f"{p}.self_attn.pos_bias_u"] = _t(h, d // h)
        sd[f"{p}.self_attn.pos_bias_v"] = _t(h, d // h)
        cm = f"{p}.conv_module"
        sd[f"{cm}.layer_norm.weight"] = _t(d)
        sd[f"{cm}.layer_norm.bias"] = _t(d)
        sd[f"{cm}.pointwise_conv1.weight"] = _t(2 * d, d, 1)
        sd[f"{cm}.depthwise_conv.weight"] = _t(d, 1, 7)
        sd[f"{cm}.batch_norm.weight"] = _t(d)
        sd[f"{cm}.batch_norm.bias"] = _t(d)
        sd[f"{cm}.batch_norm.running_mean"] = _t(d)
        sd[f"{cm}.batch_norm.running_var"] = _t(d).abs() + 0.5
        sd[f"{cm}.pointwise_conv2.weight"] = _t(d, d, 1)
    for i in range(cfg.encoder_layers):
        sd[f"proj_head.{i}.lin_proj.weight"] = _t(cfg.pred_head_final_dim, d)
        sd[f"proj_head.{i}.lin_proj.bias"] = _t(cfg.pred_head_final_dim)

    collections = {}
    params = map_student_state_dict(sd, cfg, collections)
    assert "batch_stats" in collections

    model = StudentModel(cfg=cfg)
    wav = jnp.zeros((1, 4000))
    init_vars = model.init(
        {"params": jax.random.PRNGKey(0)}, wav, jnp.zeros((1, 4000), bool)
    )
    assert _shapes(init_vars["params"]) == _shapes(params)
    assert _shapes(init_vars["batch_stats"]) == _shapes(collections["batch_stats"])
    out = model.apply(
        {"params": params, **collections}, wav, jnp.zeros((1, 4000), bool)
    )
    assert np.all(np.isfinite(np.asarray(out.x)))


def test_upstream_expert_from_lightning_ckpt(tmp_path):
    from fithubert_tpu.export.expert import UpstreamExpert

    cfg = STUDENT_CFG
    sd = make_reference_student_state_dict(cfg)
    lightning_sd = {f"student_model.{k}": v for k, v in sd.items()}
    ckpt_path = str(tmp_path / "checkpoint-epoch=00.ckpt")
    torch.save({"state_dict": lightning_sd, "epoch": 0}, ckpt_path)

    exp_cfg = ExperimentConfig(distiller=cfg)
    yaml_path = str(tmp_path / "dumped.yaml")
    dump_yaml_config(exp_cfg, yaml_path)

    expert = UpstreamExpert(ckpt_path, yaml_path, length_quantum=2000)
    assert expert.get_downsample_rates() == 20  # TINY_CONV stride product 5*2*2
    # (the release config's stride product is 320, reference fithubert/expert.py:49-50)

    wavs = [np.zeros(3000, np.float32), np.ones(1500, np.float32) * 0.01]
    out = expert(wavs)
    assert set(out) >= {"last_hidden_state", "hidden_states"}
    assert out["last_hidden_state"].shape[-1] == cfg.pred_head_final_dim
    assert len(out["hidden_states"]) == cfg.encoder_layers
    # final head must be the LAST proj head (reference modules/model.py:393-399)
    assert "proj_head_0" not in expert._variables["params"]
    assert f"proj_head_{cfg.encoder_layers - 1}" in expert._variables["params"]


def test_expert_from_our_export_pair(tmp_path):
    from flax import serialization

    from fithubert_tpu.export.expert import UpstreamExpert
    from fithubert_tpu.train.checkpoint import export_student

    cfg = ExperimentConfig(distiller=STUDENT_CFG)
    model = StudentModel(cfg=cfg.distiller)
    wav = jnp.zeros((1, 4000))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, wav, jnp.zeros((1, 4000), bool)
    )["params"]

    yaml_path, weights_path = export_student(cfg, params, str(tmp_path), tag="student")
    expert = UpstreamExpert(weights_path, yaml_path, length_quantum=2000)
    out = expert([np.zeros(3000, np.float32)])
    assert out["last_hidden_state"].shape[0] == 1


def test_converted_teacher_roundtrip(tmp_path):
    from fithubert_tpu.export.fairseq_import import (
        load_fairseq_teacher,
        load_teacher_any,
        save_converted_teacher,
    )

    sd = make_fairseq_state_dict()
    src = str(tmp_path / "t.pt")
    torch.save({"model": sd, "cfg": None}, src)
    geom, variables = load_fairseq_teacher(src)

    prefix = str(tmp_path / "converted")
    save_converted_teacher(geom, variables, prefix)
    geom2, variables2 = load_teacher_any(prefix + ".msgpack")
    assert geom2 == geom
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_close(variables["params"], variables2["params"])


def test_extract_features_cli(tmp_path):
    """scripts/extract_features.py: export pair + flacs -> per-utterance .npy
    at the 320-sample downsample rate."""
    import subprocess
    import sys

    from fithubert_tpu.train.checkpoint import export_student
    from tests.flac_writer import write_flac

    cfg = ExperimentConfig(distiller=STUDENT_CFG)
    model = StudentModel(cfg=cfg.distiller)
    wav = jnp.zeros((1, 4000))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, wav, jnp.zeros((1, 4000), bool)
    )["params"]
    yaml_path, weights_path = export_student(cfg, params, str(tmp_path), tag="student")

    flacs = []
    for i, n in enumerate((4000, 3200)):
        sig = np.round(2000 * np.sin(np.arange(n) * 0.05)).astype(np.int64)
        p = str(tmp_path / f"utt{i}.flac")
        write_flac(p, [sig], kind="verbatim")
        flacs.append(p)

    out_dir = tmp_path / "feats"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "scripts/extract_features.py",
         "--ckpt", weights_path, "--config", yaml_path,
         "--inputs", *flacs, "--out", str(out_dir), "--platform", "cpu"],
        cwd=repo, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    f0 = np.load(out_dir / "utt0.npy")
    f1 = np.load(out_dir / "utt1.npy")
    # ground truth: the expert API's own frame mask for the same audio
    from fithubert_tpu.data import audio
    from fithubert_tpu.export.expert import UpstreamExpert

    expert = UpstreamExpert(weights_path, yaml_path)
    ref = expert([audio.decode(flacs[0]), audio.decode(flacs[1])])
    # the frame mask lives at the post-TR rate; the output is upsampled back
    factor = ref["last_hidden_state"].shape[1] // ref["padding_mask"].shape[1]
    n0 = int((~ref["padding_mask"][0]).sum()) * factor
    n1 = int((~ref["padding_mask"][1]).sum()) * factor
    assert f0.shape == (n0, STUDENT_CFG.pred_head_final_dim), (f0.shape, n0)
    assert f1.shape[0] == n1 and n1 < n0
    np.testing.assert_allclose(f0, ref["last_hidden_state"][0][:n0], atol=1e-5)
    assert np.isfinite(f0).all()


def test_expert_from_conformer_export(tmp_path):
    """Conformer students carry batch_stats: the export pair must feed the
    expert a complete variables dict or apply() dies looking up the
    missing collection (round-1..4 review finding)."""
    import dataclasses

    from fithubert_tpu.export.expert import UpstreamExpert
    from fithubert_tpu.train.checkpoint import export_student

    cfg_c = dataclasses.replace(
        STUDENT_CFG, layer_type="conformer", pos_enc_type="rel_pos",
        attn_type="espnet", enable_tr_layer=False,
    )
    cfg = ExperimentConfig(distiller=cfg_c)
    model = StudentModel(cfg=cfg_c)
    wav = jnp.zeros((1, 4000))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, wav, jnp.zeros((1, 4000), bool)
    )
    extra = {k: v for k, v in variables.items() if k != "params"}
    assert "batch_stats" in extra  # the collection under test
    yaml_path, weights_path = export_student(
        cfg, variables["params"], str(tmp_path), tag="conf", extra_vars=extra
    )
    expert = UpstreamExpert(weights_path, yaml_path, length_quantum=2000)
    out = expert([np.zeros(3000, np.float32)])
    assert np.isfinite(np.asarray(out["last_hidden_state"])).all()
