"""Batch-sharded serving synthesis == single-device synthesis."""
import jax
import numpy as np
import pytest

from fscl_tpu.core.config import (
    ModelConfig, OptimConfig, SpeakerConfig, TransformerConfig,
)
from fscl_tpu.data.batch import Batch
from fscl_tpu.parallel.mesh import make_mesh, replicate
from fscl_tpu.parallel.serving import make_parallel_synth
from fscl_tpu.systems.baseline import BaselineSystem


def test_parallel_synth_matches_single():
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    mesh = make_mesh(n_data=4)
    cfg = ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_hidden=32,
            decoder_hidden=32, conv_filter_size=32, encoder_head=2,
            decoder_head=2),
        max_seq_len=64, speaker=SpeakerConfig(n_speakers=4))
    n_sym = 20
    system = BaselineSystem(cfg, OptimConfig(), (("en", n_sym),))

    rng = np.random.default_rng(0)
    B, L, T = 8, 12, 48
    texts = rng.integers(1, n_sym, (B, L)).astype(np.int32)
    src_lens = np.full((B,), L, np.int32)
    speakers = (np.arange(B) % 4).astype(np.int32)
    langs = np.zeros((B,), np.int32)
    batch = Batch(
        speaker_args=speakers, texts=texts, src_lens=src_lens,
        mels=rng.normal(size=(B, T, 80)).astype(np.float32),
        mel_lens=np.full((B,), T, np.int32),
        pitches=rng.normal(size=(B, L)).astype(np.float32),
        energies=rng.normal(size=(B, L)).astype(np.float32),
        durations=np.full((B, L), 3, np.int32), lang_ids=langs)
    state = system.init_state(jax.random.PRNGKey(0), batch)

    want = system.synthesize(state.params, state.batch_stats,
                             texts, src_lens, T, speakers, langs)

    p = replicate(state.params, mesh)
    bs = (jax.tree_util.tree_map(lambda x: jax.device_put(x), state.batch_stats)
          if state.batch_stats is not None else None)
    synth = make_parallel_synth(system, mesh, T)
    got_mel, got_len = synth(p, bs, texts, src_lens, speakers, langs)

    np.testing.assert_allclose(np.asarray(got_mel),
                               np.asarray(want.postnet_mel), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(got_len),
                                  np.asarray(want.mel_len))
