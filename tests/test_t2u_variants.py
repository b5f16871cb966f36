"""T2U C/C2 variants + DAE2E combo."""
import jax
import numpy as np
import pytest

from fscl_tpu.core.config import (
    CodebookConfig, ModelConfig, OptimConfig, SpeakerConfig,
    TransformerConfig, UpstreamConfig,
)
from fscl_tpu.data.batch import Batch, SupInfo
from fscl_tpu.models.hubert import SSLUpstream
from fscl_tpu.models.tacotron2_t2u import T2UConfig
from fscl_tpu.systems.t2u import (
    T2UBatch, T2UEpisode, TransEmbCT2USystem, TransEmbC2T2USystem,
)

N_SYM = 10
CFG = ModelConfig(
    transformer=TransformerConfig(
        encoder_layer=1, decoder_layer=1, encoder_hidden=32,
        decoder_hidden=32, conv_filter_size=32, encoder_head=2,
        decoder_head=2),
    codebook=CodebookConfig(size=4, num_heads=2, dim=16),
    upstream=UpstreamConfig(name="tiny", dim=16, n_layers=2),
    speaker=SpeakerConfig(n_speakers=4))
TINY = SSLUpstream(dim=16, n_layers=1, n_heads=2, ffn_dim=32)
TCFG = T2UConfig(
    n_units=12, d_unit=16, symbols_embedding_dim=16,
    encoder_embedding_dim=32, prenet_dim=16, attention_rnn_dim=32,
    decoder_rnn_dim=32, attention_dim=16,
    attention_location_n_filters=4, attention_location_kernel_size=7)

B, L, TU = 2, 6, 8


def make_episode(rng):
    sup = SupInfo(
        wavs=rng.normal(size=(2, 8000)).astype(np.float32),
        wav_lens=np.full((2,), 8000, np.int32),
        avg_frames=rng.integers(0, 4, (2, L)).astype(np.int32),
        phonemes=rng.integers(1, N_SYM, (2, L)).astype(np.int32),
        n_symbols=N_SYM)
    qry = T2UBatch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, N_SYM, (B, L)).astype(np.int32),
        src_lens=np.full((B,), L, np.int32),
        units=rng.integers(1, TCFG.n_units, (B, TU)).astype(np.int32),
        unit_lens=np.full((B,), TU, np.int32),
        lang_ids=np.zeros(B, np.int32))
    return T2UEpisode(sup=sup, qry=qry)


@pytest.mark.parametrize("cls", [TransEmbCT2USystem, TransEmbC2T2USystem])
def test_t2u_codebook_variants(cls):
    rng = np.random.default_rng(0)
    episode = make_episode(rng)
    system = cls(CFG, OptimConfig(), N_SYM, TCFG, upstream=TINY)
    state = system.init_state(jax.random.PRNGKey(0), episode)
    state, metrics = jax.jit(system.train_step)(
        state, episode, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Total Loss"]))


def test_dae2e_tune():
    from fscl_tpu.systems.baseline import BaselineSystem
    from fscl_tpu.systems.t2u_tune import DAE2EBatch, DAE2ETuneSystem
    rng = np.random.default_rng(1)
    u2s_cfg = ModelConfig(
        transformer=CFG.transformer, max_seq_len=16,
        speaker=SpeakerConfig(n_speakers=4))
    u2s = BaselineSystem(u2s_cfg, OptimConfig(), (("unit", TCFG.n_units),))
    dur = rng.integers(1, 3, (B, TU)).astype(np.int32)
    u2s_b = Batch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, TCFG.n_units, (B, TU)).astype(np.int32),
        src_lens=np.full((B,), TU, np.int32),
        mels=rng.normal(size=(B, 16, 80)).astype(np.float32),
        mel_lens=np.minimum(dur.sum(1), 16).astype(np.int32),
        pitches=rng.normal(size=(B, TU)).astype(np.float32),
        energies=rng.normal(size=(B, TU)).astype(np.float32),
        durations=dur, lang_ids=np.zeros(B, np.int32))
    u2s_state = u2s.init_state(jax.random.PRNGKey(0), u2s_b)
    episode = make_episode(rng)
    batch = DAE2EBatch(
        t2u=episode.qry, u2s=u2s_b,
        real_units=rng.integers(1, TCFG.n_units, (B, TU)).astype(np.int32),
        real_unit_lens=np.full((B,), TU, np.int32))
    system = DAE2ETuneSystem(CFG, OptimConfig(), (("en", N_SYM),), TCFG,
                             u2s, u2s_state.params, u2s_state.batch_stats)
    state = system.init_state(jax.random.PRNGKey(1), batch)
    state, metrics = jax.jit(system.train_step)(
        state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["Total Loss"]))
    assert "DA Loss" in metrics and "U2S Loss" in metrics


def test_tune_table_uses_codebook_path_for_c_variants():
    """t2u_build_reference_table must route through the variant's frame
    features / codebook (TransEmbC/C2 tune semantics), so the C and C2
    tables differ from the plain Downstream1 table on the same episode."""
    from fscl_tpu.systems.t2u import TransEmbT2USystem
    from fscl_tpu.systems.t2u_tune import t2u_build_reference_table
    rng = np.random.default_rng(3)
    episode = make_episode(rng)
    sup_batches = [episode.sup]

    tables = {}
    for name, cls in (("d1", TransEmbT2USystem), ("c", TransEmbCT2USystem),
                      ("c2", TransEmbC2T2USystem)):
        system = cls(CFG, OptimConfig(), N_SYM, TCFG, upstream=TINY)
        state = system.init_state(jax.random.PRNGKey(0), episode)
        tables[name] = np.asarray(t2u_build_reference_table(
            system, state.params, sup_batches))
    assert tables["d1"].shape == (N_SYM, TCFG.symbols_embedding_dim)
    assert tables["c"].shape == tables["d1"].shape
    assert tables["c2"].shape == tables["d1"].shape
    assert not np.allclose(tables["c"], tables["d1"], atol=1e-4)
    assert not np.allclose(tables["c2"], tables["d1"], atol=1e-4)

    # the C2 tune table equals codebook(post) applied to the d1-style
    # pre-table built from ITS OWN params — i.e. post_table is exercised
    c2 = TransEmbC2T2USystem(CFG, OptimConfig(), N_SYM, TCFG, upstream=TINY)
    st = c2.init_state(jax.random.PRNGKey(1), episode)
    got = np.asarray(t2u_build_reference_table(c2, st.params, sup_batches))
    hidden, _ = c2.extract_ssl(episode.sup.wavs, episode.sup.wav_lens)
    want = np.asarray(c2.build_embedding_table(st.params, hidden, episode.sup))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_e2e_u2s_table_selection_multilingual():
    """A multilingual u2s checkpoint (several embedding tables) must chain
    through the table named by u2s_symbol_id, not an arbitrary one."""
    from fscl_tpu.systems.baseline import BaselineSystem
    from fscl_tpu.systems.t2u_tune import E2ETuneSystem
    rng = np.random.default_rng(2)
    u2s_cfg = ModelConfig(
        transformer=CFG.transformer, max_seq_len=16,
        speaker=SpeakerConfig(n_speakers=4))
    # "en" table (different size) sorts before "unit": a naive first-table
    # grab would pick the wrong one
    u2s = BaselineSystem(
        u2s_cfg, OptimConfig(), (("en", 20), ("unit", TCFG.n_units)))
    dur = rng.integers(1, 3, (B, TU)).astype(np.int32)
    u2s_b = Batch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, TCFG.n_units, (B, TU)).astype(np.int32),
        src_lens=np.full((B,), TU, np.int32),
        mels=rng.normal(size=(B, 16, 80)).astype(np.float32),
        mel_lens=np.minimum(dur.sum(1), 16).astype(np.int32),
        pitches=rng.normal(size=(B, TU)).astype(np.float32),
        energies=rng.normal(size=(B, TU)).astype(np.float32),
        durations=dur, lang_ids=np.zeros(B, np.int32))
    u2s_state = u2s.init_state(jax.random.PRNGKey(0), u2s_b)

    sys_sel = E2ETuneSystem(CFG, OptimConfig(), (("en", N_SYM),), TCFG,
                            u2s, u2s_state.params, u2s_state.batch_stats,
                            u2s_symbol_id="unit")
    table = sys_sel._u2s_unit_table(sys_sel.u2s_params)
    assert table.shape[0] == TCFG.n_units

    sys_none = E2ETuneSystem(CFG, OptimConfig(), (("en", N_SYM),), TCFG,
                             u2s, u2s_state.params, u2s_state.batch_stats)
    with pytest.raises(ValueError):
        sys_none._u2s_unit_table(sys_none.u2s_params)
    with pytest.raises(KeyError):
        E2ETuneSystem(CFG, OptimConfig(), (("en", N_SYM),), TCFG,
                      u2s, u2s_state.params, u2s_state.batch_stats,
                      u2s_symbol_id="missing")._u2s_unit_table(
                          u2s_state.params)
