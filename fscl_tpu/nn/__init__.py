from fscl_tpu.nn.fft_block import (
    Encoder, Decoder, FFTBlock, FFTStack, PostNet, MultiHeadAttention,
    sinusoid_position_encoding,
)
from fscl_tpu.nn.variance_adaptor import VarianceAdaptor, VariancePredictor, variance_bins
from fscl_tpu.nn.embeddings import (
    MultilingualEmbedding, SoftMultiAttCodebook, SoftMultiAttCodebook2,
)
from fscl_tpu.nn.speaker_encoder import SpeakerEncoder, LanguageEncoder, GE2EEncoder
from fscl_tpu.nn.losses import (
    fastspeech2_loss, fastspeech2_ada_loss, framewise_ce_loss, framewise_accuracy,
    FastSpeech2LossOutput,
)
