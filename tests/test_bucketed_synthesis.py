"""Two-pass bucketed synthesis: picks a small bucket and matches the
full-bucket output on valid frames."""
import jax
import jax.numpy as jnp
import numpy as np

from fscl_tpu.core.config import (
    ModelConfig, OptimConfig, SpeakerConfig, TransformerConfig,
)
from fscl_tpu.data.batch import Batch
from fscl_tpu.systems.baseline import BaselineSystem

CFG = ModelConfig(
    transformer=TransformerConfig(
        encoder_layer=1, decoder_layer=1, encoder_hidden=32,
        decoder_hidden=32, conv_filter_size=32, encoder_head=2,
        decoder_head=2),
    max_seq_len=256, speaker=SpeakerConfig(n_speakers=4))
N_SYM = 30


def test_bucketed_matches_full():
    rng = np.random.default_rng(0)
    B, L = 2, 10
    dur = rng.integers(1, 3, (B, L)).astype(np.int32)
    batch = Batch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, N_SYM, (B, L)).astype(np.int32),
        src_lens=np.full((B,), L, np.int32),
        mels=rng.normal(size=(B, 24, 80)).astype(np.float32),
        mel_lens=np.minimum(dur.sum(1), 24).astype(np.int32),
        pitches=rng.normal(size=(B, L)).astype(np.float32),
        energies=rng.normal(size=(B, L)).astype(np.float32),
        durations=dur, lang_ids=np.zeros(B, np.int32))
    system = BaselineSystem(CFG, OptimConfig(), (("en", N_SYM),))
    state = system.init_state(jax.random.PRNGKey(0), batch)

    texts = jnp.asarray(batch.texts)
    src_lens = jnp.asarray(batch.src_lens)
    spk = jnp.asarray(batch.speaker_args)
    lang = jnp.asarray(batch.lang_ids)

    out_b = system.synthesize_bucketed(
        state.params, state.batch_stats, texts, src_lens, spk, lang,
        mel_buckets=(32, 64, 128))
    out_full = system.synthesize(
        state.params, state.batch_stats, texts, src_lens, 128, spk, lang)

    # bucket chosen small (durations at random init are tiny)
    assert out_b.mel.shape[1] in (32, 64)
    np.testing.assert_array_equal(
        np.asarray(out_b.mel_len), np.asarray(out_full.mel_len))
    n = int(out_b.mel_len[0])
    np.testing.assert_allclose(
        np.asarray(out_b.postnet_mel)[0, :n],
        np.asarray(out_full.postnet_mel)[0, :n], atol=2e-5)
