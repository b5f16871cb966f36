"""FSCL saver artifacts (codebook attention heatmaps + layer weights)."""
import glob
import os

import jax
import numpy as np

from fscl_tpu.core.config import (
    CodebookConfig, ModelConfig, OptimConfig, SpeakerConfig,
    TransformerConfig, UpstreamConfig,
)
from fscl_tpu.data.batch import Batch, SupInfo
from fscl_tpu.models.hubert import SSLUpstream
from fscl_tpu.systems.fscl import Episode, TransEmbSystem

N_SYM = 8
CFG = ModelConfig(
    transformer=TransformerConfig(
        encoder_layer=1, decoder_layer=1, encoder_hidden=32,
        decoder_hidden=32, conv_filter_size=32, encoder_head=2,
        decoder_head=2),
    codebook=CodebookConfig(size=4, num_heads=2, dim=32),
    upstream=UpstreamConfig(name="tiny", dim=16, n_layers=2),
    max_seq_len=16, speaker=SpeakerConfig(n_speakers=2))


def test_fscl_saver_artifacts(tmp_path):
    from fscl_tpu.obs.fscl_saver import FSCLSaver
    rng = np.random.default_rng(0)
    sup = SupInfo(
        wavs=rng.normal(size=(2, 8000)).astype(np.float32),
        wav_lens=np.full((2,), 8000, np.int32),
        avg_frames=rng.integers(1, 4, (2, 5)).astype(np.int32),
        phonemes=rng.integers(1, N_SYM, (2, 5)).astype(np.int32),
        n_symbols=N_SYM)
    dur = rng.integers(1, 3, (2, 5)).astype(np.int32)
    qry = Batch(
        speaker_args=np.zeros(2, np.int32),
        texts=rng.integers(1, N_SYM, (2, 5)).astype(np.int32),
        src_lens=np.full((2,), 5, np.int32),
        mels=rng.normal(size=(2, 12, 80)).astype(np.float32),
        mel_lens=np.minimum(dur.sum(1), 12).astype(np.int32),
        pitches=rng.normal(size=(2, 5)).astype(np.float32),
        energies=rng.normal(size=(2, 5)).astype(np.float32),
        durations=dur, lang_ids=np.zeros(2, np.int32))
    episode = Episode(sup=sup, qry=qry)
    system = TransEmbSystem(
        CFG, OptimConfig(), N_SYM,
        upstream=SSLUpstream(dim=16, n_layers=1, n_heads=2, ffn_dim=32))
    state = system.init_state(jax.random.PRNGKey(0), episode)

    saver = FSCLSaver(str(tmp_path), system, synth_step=1)
    saver.on_validation_sample(5, state, episode)
    assert glob.glob(str(tmp_path / "matching-5-step5-head-*.png"))
    assert os.path.isfile(tmp_path / "step5-layer-weights.png")
