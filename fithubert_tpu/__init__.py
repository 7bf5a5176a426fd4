"""fithubert_tpu — a TPU-native (JAX/XLA/Pallas/pjit) speech knowledge-distillation
framework with the capabilities of glory20h/FitHuBERT.

A frozen teacher (HuBERT-Base / wav2vec2-Base / wav2vec2-CTC geometry) and a
thin-and-deep student (narrow transformer/conformer with a time-reduction
layer) run fused inside one jitted, data-parallel train step; the student is
trained to regress the teacher's layer-wise hidden states on LibriSpeech
waveforms and exported as an s3prl-compatible upstream.

Layer map (mirrors reference SURVEY.md §1):
  L6 CLI            fithubert_tpu.cli / train.py
  L5 training       fithubert_tpu.train (losses, step, loop, checkpoint)
  L4 teacher        fithubert_tpu.models.teacher + export.fairseq_import
  L3 student        fithubert_tpu.models.student
  L2 blocks         fithubert_tpu.ops (+ ops.pallas kernels)
  L1 data           fithubert_tpu.data
  L0 export         fithubert_tpu.export (s3prl upstream contract)
"""

from fithubert_tpu.version import __version__

__all__ = ["__version__"]
