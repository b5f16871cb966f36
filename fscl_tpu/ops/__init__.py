from fscl_tpu.ops.masking import length_mask, attn_mask_from_valid, mask_fill, masked_mean
from fscl_tpu.ops.length_regulator import regulate_lengths, gather_frame_labels
from fscl_tpu.ops.segment_ops import (
    segment_mean, phoneme_query_extract, frame_phoneme_query_extract,
    phoneme_query_sums, queries_from_sums,
)
from fscl_tpu.ops.attention import attend, xla_attention, pallas_attention
from fscl_tpu.ops.stft import mel_spectrogram, stft_magnitude, mel_filterbank, hann_window
