"""d-vector speaker batches end to end: masked GE2E average, DvecRefs
collate, FastSpeech2 forward with slice-based speaker_args.

The reference feeds ragged lists of spk_ref_mel_slices through the GE2E
encoder and averages partial embeddings (speaker_encoder.py:115-136,
collates/utils.py:29-37). Here the slice count is padded to a static N and
masked so the batch is one jit-stable array.
"""
import jax
import jax.numpy as jnp
import numpy as np

from fscl_tpu.core.config import ModelConfig, SpeakerConfig, TransformerConfig
from fscl_tpu.core.stats import DEFAULT_STATS
from fscl_tpu.data.batch import DvecRefs, collate_batch, collate_dvec_refs
from fscl_tpu.nn.speaker_encoder import GE2EEncoder
from fscl_tpu.ops.masking import length_mask


def test_masked_ge2e_matches_unpadded():
    enc = GE2EEncoder(hidden_size=32, out_dim=16)
    rng = jax.random.PRNGKey(0)
    real = jax.random.normal(rng, (3, 160, 40))
    v = enc.init(jax.random.PRNGKey(1), real)
    d_exact = enc.apply(v, real)
    # pad to 6 slices with garbage; mask the padding out
    pad = jnp.concatenate([real, 7.0 * jnp.ones((3, 160, 40))], axis=0)
    mask = jnp.array([1, 1, 1, 0, 0, 0], jnp.float32)
    d_masked = enc.apply(v, pad, mask)
    np.testing.assert_allclose(
        np.asarray(d_exact), np.asarray(d_masked), atol=1e-5)


def _sample(rng, n_slices, n_ph=6, n_mel=24):
    return {
        "id": "u", "text": "t", "speaker": 0, "lang_id": 0,
        "phonemes": rng.integers(1, 10, n_ph),
        "mel": rng.normal(size=(n_mel, 80)).astype(np.float32),
        "pitch": rng.normal(size=n_ph).astype(np.float32),
        "energy": rng.normal(size=n_ph).astype(np.float32),
        "duration": np.full(n_ph, n_mel // n_ph, np.int64),
        "spk_ref_mel_slices":
            rng.normal(size=(n_slices, 160, 40)).astype(np.float32),
    }


def test_collate_dvec_refs_pads_and_truncates():
    rng = np.random.default_rng(0)
    samples = [_sample(rng, 2), _sample(rng, 5)]
    refs = collate_dvec_refs(samples, n_slices=4)
    assert refs.slices.shape == (2, 4, 160, 40)
    np.testing.assert_allclose(refs.mask, [[1, 1, 0, 0], [1, 1, 1, 1]])
    # truncation keeps leading slices
    np.testing.assert_allclose(
        refs.slices[1], samples[1]["spk_ref_mel_slices"][:4])
    # padding region is zero
    assert float(np.abs(refs.slices[0, 2:]).max()) == 0.0


def test_collate_batch_emits_dvec_refs():
    rng = np.random.default_rng(1)
    samples = [_sample(rng, 3), _sample(rng, 1)]
    _, batch = collate_batch(samples, dvec_slices=4)
    assert isinstance(batch.speaker_args, DvecRefs)
    # without the flag it stays an id vector
    _, batch2 = collate_batch(samples)
    assert batch2.speaker_args.dtype == np.int32


def test_fastspeech2_forward_with_dvec_refs():
    cfg = ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_hidden=64,
            decoder_hidden=64, conv_filter_size=128,
            encoder_head=2, decoder_head=2),
        max_seq_len=64,
        speaker=SpeakerConfig(emb_type="dvec", n_ref_slices=3),
    )
    from fscl_tpu.models.fastspeech2 import FastSpeech2
    model = FastSpeech2(cfg, DEFAULT_STATS)
    B, L, T = 2, 8, 32
    rng = jax.random.PRNGKey(0)
    emb = jax.random.normal(rng, (B, L, 64))
    src_lens = jnp.array([8, 5])
    dur = jnp.where(length_mask(src_lens, L), 3, 0)
    mel_lens = jnp.minimum(dur.sum(-1), T)
    pe = jnp.zeros((B, L))
    refs = DvecRefs(
        slices=jax.random.normal(rng, (B, 3, 160, 40)),
        mask=jnp.array([[1, 1, 0], [1, 1, 1]], jnp.float32))
    variables = model.init(
        rng, emb, src_lens, T, speaker_args=refs, mel_lens=mel_lens,
        p_targets=pe, e_targets=pe, d_targets=dur, lang_args=jnp.array([0, 0]))
    out = model.apply(
        variables, emb, src_lens, T, speaker_args=refs, mel_lens=mel_lens,
        p_targets=pe, e_targets=pe, d_targets=dur, lang_args=jnp.array([0, 0]))
    assert out.mel.shape == (B, T, 80)
    assert bool(jnp.isfinite(out.mel).all())


def test_dvec_emb_type_freezes_ge2e():
    """"dvec" freezes the GE2E encoder in the optimizer partition;
    "encoder" leaves it trainable (speaker_encoder.py:115-136)."""
    import jax
    from fscl_tpu.core.config import OptimConfig
    from fscl_tpu.systems.baseline import BaselineSystem

    def mask_values(emb_type):
        cfg = ModelConfig(
            transformer=TransformerConfig(
                encoder_layer=1, decoder_layer=1, encoder_hidden=32,
                decoder_hidden=32, conv_filter_size=32,
                encoder_head=2, decoder_head=2),
            max_seq_len=64,
            speaker=SpeakerConfig(emb_type=emb_type, n_ref_slices=2))
        system = BaselineSystem(cfg, OptimConfig(), (("en", 8),))
        params = {"model": {"speaker_emb": {"ge2e": {"proj": {
            "kernel": np.zeros(1)}}},
            "mel_linear": {"kernel": np.zeros(1)}}}
        mask = system.trainable_mask(params)
        return (mask["model"]["speaker_emb"]["ge2e"]["proj"]["kernel"],
                mask["model"]["mel_linear"]["kernel"])

    ge2e, other = mask_values("dvec")
    assert ge2e is False and other is True
    ge2e, other = mask_values("encoder")
    assert ge2e is True and other is True
