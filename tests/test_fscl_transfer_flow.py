"""Flagship workflow end-to-end (driver config 5 shape): FSCL meta-training
over two languages, then few-shot transfer to a HELD-OUT language — the
transplanted (generated) embedding table must give a better starting loss
and better post-adaptation loss than a random table."""
import numpy as np
import pytest

from fscl_tpu.core.config import (
    CodebookConfig, ModelConfig, OptimConfig, SpeakerConfig,
    TransformerConfig, UpstreamConfig,
)
from fscl_tpu.data.batch import Batch, SupInfo

N_SYM = 10
TINY = ModelConfig(
    transformer=TransformerConfig(
        encoder_layer=1, decoder_layer=1, encoder_hidden=32,
        decoder_hidden=32, conv_filter_size=64, encoder_head=2,
        decoder_head=2, encoder_dropout=0.0, decoder_dropout=0.0),
    codebook=CodebookConfig(size=8, num_heads=2, dim=32),
    upstream=UpstreamConfig(name="tiny", dim=16, n_layers=2),
    max_seq_len=32, speaker=SpeakerConfig(n_speakers=2))


def synthetic_language(seed: int, rng_wav, upstream, variables):
    """A 'language' where mel targets are a deterministic function of the
    phoneme sequence (so the phoneme->acoustic mapping is learnable), and
    support wavs whose SSL features correlate with phoneme identity."""
    rng = np.random.default_rng(seed)
    proto = rng.normal(size=(N_SYM, 80)).astype(np.float32)

    def make_batch(B=4, L=8, T=24):
        dur = np.full((B, L), 3, np.int32)
        texts = rng.integers(1, N_SYM, (B, L)).astype(np.int32)
        mels = np.zeros((B, T, 80), np.float32)
        for b in range(B):
            pos = 0
            for l in range(L):
                mels[b, pos: pos + 3] = proto[texts[b, l]]
                pos += 3
        return Batch(
            speaker_args=np.zeros(B, np.int32), texts=texts,
            src_lens=np.full((B,), L, np.int32), mels=mels,
            mel_lens=np.full((B,), T, np.int32),
            pitches=np.zeros((B, L), np.float32),
            energies=np.zeros((B, L), np.float32),
            durations=dur, lang_ids=np.zeros(B, np.int32))

    def make_sup(B=3, L=8):
        return SupInfo(
            wavs=rng_wav.normal(size=(B, 8000)).astype(np.float32),
            wav_lens=np.full((B,), 8000, np.int32),
            avg_frames=np.full((B, L), 3, np.int32),
            phonemes=rng.integers(1, N_SYM, (B, L)).astype(np.int32),
            n_symbols=N_SYM)

    return make_batch, make_sup


@pytest.mark.slow
def test_fscl_meta_train_then_transfer():
    import jax
    import jax.numpy as jnp
    from fscl_tpu.models.hubert import SSLUpstream
    from fscl_tpu.systems.baseline import BaselineSystem
    from fscl_tpu.systems.fscl import Episode, TransEmbSystem
    from fscl_tpu.systems.tune import adapt_on_chip, tune_init

    upstream = SSLUpstream(dim=16, n_layers=1, n_heads=2, ffn_dim=32)
    rng_wav = np.random.default_rng(99)

    fscl = TransEmbSystem(
        TINY, OptimConfig(lr=2e-3, warmup_step=10, anneal_steps=()),
        N_SYM, upstream=upstream)

    langs = [synthetic_language(s, rng_wav, None, None) for s in (1, 2)]
    episode0 = Episode(sup=langs[0][1](), qry=langs[0][0]())
    state = fscl.init_state(jax.random.PRNGKey(0), episode0)
    step = jax.jit(fscl.train_step)
    first = last = None
    for i in range(60):
        mk_b, mk_s = langs[i % 2]
        ep = Episode(sup=mk_s(), qry=mk_b())
        state, metrics = step(state, ep, jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics["Total Loss"])
        last = float(metrics["Total Loss"])
    assert last < first, (first, last)

    # --- transfer to a held-out language ---------------------------------
    mk_b3, mk_s3 = synthetic_language(7, rng_wav, None, None)
    baseline = BaselineSystem(
        TINY, OptimConfig(lr=2e-3, warmup_step=5, anneal_steps=()),
        (("heldout", N_SYM),))
    b_state = baseline.init_state(jax.random.PRNGKey(1), mk_b3())

    transplanted = tune_init(fscl, state.params, baseline, b_state.params,
                             [mk_s3() for _ in range(2)], "heldout")

    eval_batch = mk_b3()

    def batch_loss(params):
        loss, _ = baseline.loss_and_metrics(
            params, b_state.batch_stats, eval_batch, None, False)
        return float(loss)

    # adaptation from the transplanted table vs from the random init
    batches = [mk_b3() for _ in range(40)]
    adapted_t, losses_t = adapt_on_chip(
        baseline, transplanted, b_state.batch_stats, batches, lr=2e-3)
    adapted_r, losses_r = adapt_on_chip(
        baseline, b_state.params, b_state.batch_stats, batches, lr=2e-3)
    # adaptation improves things in both cases
    assert float(np.asarray(losses_t)[-1]) < float(np.asarray(losses_t)[0])
    final_t = batch_loss(jax.tree_util.tree_map(np.asarray, adapted_t))
    final_r = batch_loss(jax.tree_util.tree_map(np.asarray, adapted_r))
    # the meta-learned transplant should not be worse than random init
    assert final_t <= final_r * 1.1, (final_t, final_r)
