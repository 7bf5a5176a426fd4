"""End-to-end: train.py over a real (tiny, synthetic) LibriSpeech directory
tree with real file I/O — flac decode, transcript layout, bucket-CSV
AUTO-GENERATION (no manifests pre-exist), training + eval + export.

Reference equivalent: `python train.py -c <yaml>` over a corpus prepared by
s3prl preprocessing (reference utils/dataset.py:26-61); there a missing CSV
is a hard FileNotFoundError. Here the pipeline scans the corpus itself.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_split(root, split, n_utts, rng, base_len=6000):
    from tests.flac_writer import write_flac

    chap = os.path.join(root, split, "1", "2")
    os.makedirs(chap, exist_ok=True)
    lines = []
    for i in range(n_utts):
        n = base_len + 517 * i
        sig = np.round(
            3000 * np.sin(np.arange(n) * (0.02 + 0.001 * i))
            + 50 * rng.standard_normal(n)
        ).astype(np.int64)
        utt = f"1-2-{i:04d}"
        write_flac(os.path.join(chap, utt + ".flac"), [sig], kind="verbatim")
        lines.append(f"{utt} HELLO WORLD {i}")
    with open(os.path.join(root, split, "1", "2", "1-2.trans.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


CFG_TEMPLATE = """
teacher:
  teacher_model: ''
  model_type: hubert
  encoder_layers: 2
  encoder_embed_dim: 64
  encoder_ffn_embed_dim: 128
  encoder_attention_heads: 4

train:
  output_dir: '{out_dir}'
  checkpoint:
  num_epochs: 1
  gpus: 0
  batch_size: 2
  accumulate_grad_batches: 2
  use_fp16: False
  monitor_losses: True
  log_every: 1
  rec_loss_weight: 1.0
  rec_loss_type: mse
  distil_random_layer: 1
  random_layer_weight: 0.1
  specaug: False
  max_steps: 2

distiller:
  extractor_mode: default
  conv_feature_layers: '[(32, 10, 5)] + [(48, 8, 4)] + [(48, 4, 4)] * 2'
  conv_pos: 16
  conv_pos_groups: 4
  encoder_layers: 2
  encoder_embed_dim: 48
  encoder_ffn_embed_dim: 96
  encoder_attention_heads: 4
  dropout: 0.0
  attention_dropout: 0.0
  activation_dropout: 0.0
  encoder_layerdrop: 0.0
  dropout_input: 0.0
  pred_head_final_dim: 64
  layerwise_proj: True
  pred_layer_id: '[1]'
  enable_tr_layer: True
  tr_conv1d_kernel: 2
  tr_layer_index: 0
  tr_reduce_factor: 2
  tr_layer_type: conv1d
  required_seq_len_multiple: 1
  use_pallas_attention: False

optimizer:
  name: AdamW_with_schedule
  lr: 5.e-4
  warmup_proportion: 0.05
  betas: [0.9, 0.98]
  eps: 1.e-6
  weight_decay: 1.e-6

data:
  bucketing_path: '{buckets}'
  libri_root: '{libri}'
  train_set: ['train-tiny']
  dev_set: ['dev-tiny']
  test_set: ['dev-tiny']
  synthetic: false
  length_quantum: 4000
  num_workers: 2
"""


@pytest.mark.slow
def test_train_py_over_real_corpus_tree(tmp_path):
    libri = tmp_path / "LibriSpeech"
    rng = np.random.default_rng(0)
    _make_split(str(libri), "train-tiny", 8, rng)
    _make_split(str(libri), "dev-tiny", 4, rng)

    buckets = tmp_path / "len_for_bucket"  # does NOT exist: must auto-generate
    out_dir = tmp_path / "run"
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(
        CFG_TEMPLATE.format(libri=libri, buckets=buckets, out_dir=out_dir)
    )

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single-device run (conftest injects 8)
    proc = subprocess.run(
        [sys.executable, "train.py", "-c", str(cfg_path), "--platform", "cpu"],
        cwd=REPO, capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "[train] step=" in proc.stdout + proc.stderr, proc.stdout + proc.stderr
    assert "'preempted': False" in proc.stdout
    # CSVs were generated from the corpus scan
    assert (buckets / "train-tiny.csv").exists()
    assert (buckets / "dev-tiny.csv").exists()


def test_missing_corpus_gives_clear_error(tmp_path):
    """Without CSVs AND without a corpus, the failure says 'corpus not
    found' — never a bare missing-metadata FileNotFoundError."""
    from fithubert_tpu.config import DataConfig
    from fithubert_tpu.data.librispeech import BucketedLibriSpeech

    cfg = DataConfig(
        bucketing_path=str(tmp_path / "nope"),
        libri_root=str(tmp_path / "nocorpus"),
        synthetic=False,
    )
    with pytest.raises(FileNotFoundError, match="corpus not found"):
        BucketedLibriSpeech(cfg, ["train-clean-100"], batch_size=2)
