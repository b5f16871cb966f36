"""T2U tests: teacher-forced forward, batched inference with <eos>, system step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fscl_tpu.core.config import ModelConfig, OptimConfig, UpstreamConfig
from fscl_tpu.models.tacotron2_t2u import EOS_ID, T2UConfig, TacoT2U

TCFG = T2UConfig(
    n_units=12, d_unit=16, symbols_embedding_dim=16,
    encoder_embedding_dim=32, prenet_dim=16,
    attention_rnn_dim=32, decoder_rnn_dim=32, attention_dim=16,
    attention_location_n_filters=4, attention_location_kernel_size=7,
)

B, L, TU = 2, 6, 10


@pytest.fixture(scope="module")
def model_and_vars():
    model = TacoT2U(TCFG)
    rng = jax.random.PRNGKey(0)
    emb = jax.random.normal(rng, (B, L, TCFG.symbols_embedding_dim))
    src_lens = jnp.array([L, L - 2])
    units = jax.random.randint(rng, (B, TU), 1, TCFG.n_units)
    variables = model.init(rng, emb, src_lens, units, rng)
    return model, variables, emb, src_lens, units


def test_teacher_forced_forward(model_and_vars):
    model, variables, emb, src_lens, units = model_and_vars
    logits, aligns = model.apply(
        variables, emb, src_lens, units, jax.random.PRNGKey(1))
    assert logits.shape == (B, TU, TCFG.n_units)
    assert aligns.shape == (B, TU, L)
    # attention over memory sums to 1
    np.testing.assert_allclose(np.asarray(aligns.sum(-1)), 1.0, atol=1e-5)
    assert np.isfinite(np.asarray(logits)).all()


def test_scheduled_sampling_path(model_and_vars):
    model, variables, emb, src_lens, units = model_and_vars
    logits, _ = model.apply(
        variables, emb, src_lens, units, jax.random.PRNGKey(2),
        teacher_forcing_ratio=0.0)
    assert np.isfinite(np.asarray(logits)).all()


def test_batched_inference(model_and_vars):
    model, variables, emb, src_lens, _ = model_and_vars
    logits, preds, n_steps, aligns = model.apply(
        variables, emb, src_lens, jax.random.PRNGKey(3), 20,
        method=TacoT2U.infer)
    assert logits.shape[0] == B and logits.shape[1] == 20
    assert preds.shape == (B, 20)
    assert (np.asarray(n_steps) <= 20).all()
    # positions after finish are masked to 0
    for b in range(B):
        n = int(n_steps[b])
        if n < 20:
            assert (np.asarray(preds)[b, n:] == 0).all() or \
                np.asarray(preds)[b, n] == 0


def test_t2u_system_step():
    from fscl_tpu.systems.t2u import T2UBatch, TacoT2USystem
    rng = np.random.default_rng(0)
    batch = T2UBatch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, 10, (B, L)).astype(np.int32),
        src_lens=np.array([L, L - 1], np.int32),
        units=rng.integers(1, TCFG.n_units, (B, TU)).astype(np.int32),
        unit_lens=np.full((B,), TU, np.int32),
        lang_ids=np.zeros(B, np.int32),
    )
    system = TacoT2USystem(ModelConfig(), OptimConfig(), (("en", 10),), TCFG)
    state = system.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(system.train_step)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Total Loss"]))
    assert 0.0 <= float(metrics["Acc"]) <= 1.0


def test_fscl_t2u_episode():
    from fscl_tpu.data.batch import SupInfo
    from fscl_tpu.models.hubert import SSLUpstream
    from fscl_tpu.systems.t2u import T2UEpisode, TransEmbT2USystem
    rng = np.random.default_rng(0)
    n_sym = 10
    sup = SupInfo(
        wavs=rng.normal(size=(2, 16000)).astype(np.float32),
        wav_lens=np.array([16000, 8000], np.int32),
        avg_frames=rng.integers(0, 5, (2, L)).astype(np.int32),
        phonemes=rng.integers(1, n_sym, (2, L)).astype(np.int32),
        n_symbols=n_sym,
    )
    from fscl_tpu.systems.t2u import T2UBatch
    qry = T2UBatch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, n_sym, (B, L)).astype(np.int32),
        src_lens=np.full((B,), L, np.int32),
        units=rng.integers(1, TCFG.n_units, (B, TU)).astype(np.int32),
        unit_lens=np.full((B,), TU, np.int32),
        lang_ids=np.zeros(B, np.int32),
    )
    cfg = ModelConfig(upstream=UpstreamConfig(name="tiny", dim=32, n_layers=3))
    system = TransEmbT2USystem(
        cfg, OptimConfig(), n_sym, TCFG,
        upstream=SSLUpstream(dim=32, n_layers=2, n_heads=2, ffn_dim=64))
    episode = T2UEpisode(sup=sup, qry=qry)
    state = system.init_state(jax.random.PRNGKey(0), episode)
    step = jax.jit(system.train_step)
    state, metrics = step(state, episode, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Total Loss"]))


def test_t2u_alignment_saver(tmp_path):
    """Validation-time T2U alignment heatmap artifact (reference T2U saver
    alignment figures)."""
    from fscl_tpu.obs.t2u_saver import T2UAlignmentSaver
    from fscl_tpu.systems.t2u import T2UBatch, TacoT2USystem
    rng = np.random.default_rng(0)
    batch = T2UBatch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, 10, (B, L)).astype(np.int32),
        src_lens=np.array([L, L - 1], np.int32),
        units=rng.integers(1, TCFG.n_units, (B, TU)).astype(np.int32),
        unit_lens=np.full((B,), TU, np.int32),
        lang_ids=np.zeros(B, np.int32),
    )
    system = TacoT2USystem(ModelConfig(), OptimConfig(), (("en", 10),), TCFG)
    state = system.init_state(jax.random.PRNGKey(0), batch)
    saver = T2UAlignmentSaver(str(tmp_path), system, synth_step=1)
    saver.on_validation_sample(1, state, batch)
    import os
    assert os.path.isfile(str(tmp_path / "step1_alignment.png"))
