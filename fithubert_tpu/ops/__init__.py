from fithubert_tpu.ops.padding import (
    conv_out_length,
    feat_extract_output_lengths,
    lengths_to_padding_mask,
    padding_mask_to_lengths,
    pad_to_multiple,
    reduce_padding_mask,
)
from fithubert_tpu.ops.norms import FP32LayerNorm, FP32GroupNorm
from fithubert_tpu.ops.conv import (
    Conv1D,
    ConvTranspose1D,
    ConvFeatureExtractor,
    PositionalConv,
    grad_multiply,
)
from fithubert_tpu.ops.attention import MultiHeadSelfAttention
from fithubert_tpu.ops.transformer import TransformerEncoderLayer, TransformerEncoder
from fithubert_tpu.ops.heads import SplitLinear, LayerWiseProjHead, MelSpecHead
