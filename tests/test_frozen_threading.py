"""Frozen-upstream threading guards (TrainState.frozen).

Round-2 regression: systems used to close over self.upstream_params inside
jitted steps, so jit embedded the whole upstream as literal constants —
2.5 GB of HLO at hubert-large scale, which broke remote compilation.
These tests pin the fix structurally:

1. the episode-step HLO stays small (weights enter as arguments, not
   literals) — with a ~1M-param upstream, literal embedding would balloon
   the program text well past the bound asserted here;
2. checkpoints never contain the frozen collection (reference parity:
   TransEmbOrig.py:156-166 strips frozen upstream weights on save);
3. a state round-tripped through the checkpoint manager keeps training
   (frozen reattached from the live system).
"""
import numpy as np
import pytest


def _episode(n_sym=40, S=2, Lp=8, B=2, L=16, T=48, Tw=4000):
    from fscl_tpu.data.batch import Batch, SupInfo
    from fscl_tpu.systems.fscl import Episode

    rng = np.random.default_rng(0)
    sup = SupInfo(
        wavs=rng.normal(size=(S, Tw)).astype(np.float32) * 0.1,
        wav_lens=np.full((S,), Tw, np.int32),
        avg_frames=rng.integers(1, 4, (S, Lp)).astype(np.int32),
        phonemes=rng.integers(1, n_sym, (S, Lp)).astype(np.int32),
        n_symbols=n_sym)
    dur = rng.integers(1, 4, (B, L)).astype(np.int32)
    qry = Batch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, n_sym, (B, L)).astype(np.int32),
        src_lens=np.full((B,), L, np.int32),
        mels=rng.normal(size=(B, T, 80)).astype(np.float32),
        mel_lens=np.minimum(dur.sum(1), T).astype(np.int32),
        pitches=rng.normal(size=(B, L)).astype(np.float32),
        energies=rng.normal(size=(B, L)).astype(np.float32),
        durations=dur, lang_ids=np.zeros((B,), np.int32))
    return Episode(sup=sup, qry=qry)


@pytest.fixture(scope="module")
def fscl_and_state():
    import dataclasses

    import jax

    from fscl_tpu.core.config import (
        CodebookConfig, ModelConfig, OptimConfig, SpeakerConfig,
        TransformerConfig, UpstreamConfig,
    )
    from fscl_tpu.systems.fscl import TransEmbSystem

    # upstream big enough (~1M params) that literal embedding would be
    # obvious in the HLO text, small enough to stay fast on CPU
    cfg = ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_hidden=32,
            decoder_hidden=32, conv_filter_size=32),
        speaker=SpeakerConfig(n_speakers=4), max_seq_len=64,
        codebook=CodebookConfig(size=4, num_heads=2, dim=32),
        upstream=UpstreamConfig(name="tiny", dim=128, n_layers=3))
    system = TransEmbSystem(cfg, OptimConfig(), 40)
    episode = _episode()
    state = system.init_state(jax.random.PRNGKey(0), episode)
    return system, state, episode


def test_frozen_is_threaded_not_embedded(fscl_and_state):
    import jax

    system, state, episode = fscl_and_state
    assert state.frozen is not None and "upstream" in state.frozen
    n_up = sum(np.asarray(x).size for x in
               jax.tree_util.tree_leaves(state.frozen))
    assert n_up > 500_000   # the bound below is only meaningful then

    hlo = jax.jit(system.train_step).lower(
        state, episode, jax.random.PRNGKey(1)).as_text()
    # >500k f32 literals would be tens of MB of text; arguments are O(100KB)
    assert len(hlo) < 5_000_000, (
        f"episode HLO is {len(hlo)/1e6:.1f} MB - upstream weights are "
        "being embedded as literal constants again")


def test_checkpoint_excludes_frozen_and_roundtrips(fscl_and_state, tmp_path):
    import jax

    from fscl_tpu.core.checkpoint import CheckpointManager

    system, state, episode = fscl_and_state
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(0, state)
    restored_tree = mgr.restore(0)
    assert "frozen" not in restored_tree           # stripped like the ref
    assert "params" in restored_tree

    # round-trip into a fresh state: frozen stays attached from init
    state2 = mgr.restore_into(state)
    assert state2.frozen is not None
    step = jax.jit(system.train_step)
    state3, metrics = step(state2, episode, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["Total Loss"]))


def test_e2e_tune_u2s_threaded_not_embedded():
    """Round-3 regression: E2ETuneSystem used to close over the frozen u2s
    FastSpeech2 params inside the jitted tune step, baking them into the
    HLO as literal constants (same failure class as the upstream capture
    above). Pin that they now travel in TrainState.frozen."""
    import jax

    from fscl_tpu.core.config import (
        ModelConfig, OptimConfig, SpeakerConfig, TransformerConfig,
    )
    from fscl_tpu.data.batch import Batch
    from fscl_tpu.models.tacotron2_t2u import T2UConfig
    from fscl_tpu.systems.baseline import BaselineSystem
    from fscl_tpu.systems.t2u import T2UBatch
    from fscl_tpu.systems.t2u_tune import E2EBatch, E2ETuneSystem

    rng = np.random.default_rng(3)
    # u2s big enough (~1M params) that literal embedding would blow the
    # HLO-text bound below
    u2s_cfg = ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_hidden=128,
            decoder_hidden=128, conv_filter_size=512),
        speaker=SpeakerConfig(n_speakers=4), max_seq_len=32)
    tcfg = T2UConfig(
        n_units=12, d_unit=16, symbols_embedding_dim=16,
        encoder_embedding_dim=32, prenet_dim=16, attention_rnn_dim=32,
        decoder_rnn_dim=32, attention_dim=16,
        attention_location_n_filters=4, attention_location_kernel_size=7)
    B, L, TU, T = 2, 6, 8, 16
    dur = np.full((B, TU), 2, np.int32)
    u2s_b = Batch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, tcfg.n_units, (B, TU)).astype(np.int32),
        src_lens=np.full((B,), TU, np.int32),
        mels=rng.normal(size=(B, T, 80)).astype(np.float32),
        mel_lens=np.full((B,), T, np.int32),
        pitches=rng.normal(size=(B, TU)).astype(np.float32),
        energies=rng.normal(size=(B, TU)).astype(np.float32),
        durations=dur, lang_ids=np.zeros(B, np.int32))
    u2s = BaselineSystem(u2s_cfg, OptimConfig(), (("unit", tcfg.n_units),))
    u2s_state = u2s.init_state(jax.random.PRNGKey(0), u2s_b)
    n_u2s = sum(np.asarray(x).size for x in
                jax.tree_util.tree_leaves(u2s_state.params))
    assert n_u2s > 500_000

    t2u_b = T2UBatch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, 10, (B, L)).astype(np.int32),
        src_lens=np.full((B,), L, np.int32),
        units=u2s_b.texts, unit_lens=np.full((B,), TU, np.int32),
        lang_ids=np.zeros(B, np.int32))
    batch = E2EBatch(t2u=t2u_b, u2s=u2s_b)
    model_cfg = ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_hidden=32,
            decoder_hidden=32, conv_filter_size=32),
        speaker=SpeakerConfig(n_speakers=4), max_seq_len=16)
    system = E2ETuneSystem(model_cfg, OptimConfig(), (("en", 10),), tcfg,
                           u2s, u2s_state.params, u2s_state.batch_stats,
                           u2s_symbol_id="unit")
    state = system.init_state(jax.random.PRNGKey(1), batch)
    assert state.frozen is not None and "u2s" in state.frozen

    hlo = jax.jit(system.train_step).lower(
        state, batch, jax.random.PRNGKey(2)).as_text()
    assert len(hlo) < 5_000_000, (
        f"E2E tune HLO is {len(hlo)/1e6:.1f} MB - the frozen u2s params "
        "are being embedded as literal constants again")
