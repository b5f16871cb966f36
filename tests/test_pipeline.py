"""Fused text->wav serving pipeline (one jit: FastSpeech2 + HiFiGAN)."""
import jax
import jax.numpy as jnp
import numpy as np

from fscl_tpu.audio_out.pipeline import make_text2wav
from fscl_tpu.core.config import (
    ModelConfig, OptimConfig, SpeakerConfig, TransformerConfig,
)
from fscl_tpu.data.batch import Batch
from fscl_tpu.models.hifigan import HiFiGANGenerator
from fscl_tpu.systems.baseline import BaselineSystem


def test_text2wav_fused():
    cfg = ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_hidden=32,
            decoder_hidden=32, conv_filter_size=32, encoder_head=2,
            decoder_head=2),
        max_seq_len=64, speaker=SpeakerConfig(n_speakers=2))
    n_sym = 20
    system = BaselineSystem(cfg, OptimConfig(), (("en", n_sym),))
    rng = np.random.default_rng(0)
    B, L, T = 2, 8, 32
    batch = Batch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, n_sym, (B, L)).astype(np.int32),
        src_lens=np.full((B,), L, np.int32),
        mels=rng.normal(size=(B, T, 80)).astype(np.float32),
        mel_lens=np.full((B,), T, np.int32),
        pitches=rng.normal(size=(B, L)).astype(np.float32),
        energies=rng.normal(size=(B, L)).astype(np.float32),
        durations=np.full((B, L), 3, np.int32),
        lang_ids=np.zeros(B, np.int32))
    state = system.init_state(jax.random.PRNGKey(0), batch)

    voc = HiFiGANGenerator(
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 2),))
    vv = voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 80)))

    f = make_text2wav(system, state, voc, vv, max_mel_len=T)
    wav, mel_len = f(jnp.asarray(batch.texts), jnp.asarray(batch.src_lens),
                     jnp.asarray(batch.speaker_args),
                     jnp.asarray(batch.lang_ids))
    assert wav.shape == (B, T * 16)
    assert bool(jnp.isfinite(wav).all())
    assert int(mel_len.max()) <= T
