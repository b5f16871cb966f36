"""Numerical parity: same weights -> same mels as the reference torch
FastSpeech2 (architectural equivalence; BASELINE.md MCD < 0.1 target).

Builds the reference model (CPU torch, eval mode, deps stubbed), converts
its random-initialized weights into our flax model, runs both teacher-forced
on identical inputs, and compares outputs.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference not mounted")


@pytest.fixture(scope="module")
def parity_pair():
    sys.path.insert(0, BENCH)
    import torch
    from reference_harness import build_reference_fastspeech2
    from convert_reference import convert_fastspeech2_state_dict

    cwd = os.getcwd()
    torch.manual_seed(0)
    ref_model = build_reference_fastspeech2(n_speakers=8)
    os.chdir(cwd)
    variables = convert_fastspeech2_state_dict(ref_model.state_dict())

    from fscl_tpu.core.config import ModelConfig, SpeakerConfig
    from fscl_tpu.core.stats import DEFAULT_STATS
    from fscl_tpu.models.fastspeech2 import FastSpeech2

    cfg = ModelConfig(speaker=SpeakerConfig(n_speakers=8), max_seq_len=1000)
    model = FastSpeech2(cfg, DEFAULT_STATS)
    return ref_model, model, variables


def test_teacher_forced_mel_parity(parity_pair):
    import torch
    import jax.numpy as jnp
    from fscl_tpu.eval.metrics import mel_cepstral_distortion

    ref_model, model, variables = parity_pair
    rng = np.random.default_rng(0)
    B, L = 2, 24
    emb = rng.normal(size=(B, L, 256)).astype(np.float32)
    dur = rng.integers(1, 5, (B, L)).astype(np.int64)
    src_lens = np.array([L, L - 4], np.int64)
    for b, n in enumerate(src_lens):
        dur[b, n:] = 0
    mel_lens = dur.sum(1)
    T = int(mel_lens.max())
    pitch = rng.normal(size=(B, L)).astype(np.float32)
    energy = rng.normal(size=(B, L)).astype(np.float32)
    spk = np.array([0, 3])
    lang = np.array([0, 1])

    with torch.no_grad():
        t_out = ref_model(
            torch.from_numpy(spk), torch.from_numpy(emb),
            torch.from_numpy(src_lens), L,
            mel_lens=torch.from_numpy(mel_lens), max_mel_len=T,
            p_targets=torch.from_numpy(pitch),
            e_targets=torch.from_numpy(energy),
            d_targets=torch.from_numpy(dur),
            lang_args=torch.from_numpy(lang),
        )
    ref_mel = t_out[0].numpy()
    ref_postnet = t_out[1].numpy()
    ref_logd = t_out[4].numpy()

    j_out = model.apply(
        {"params": variables["params"],
         "batch_stats": {"postnet": variables["batch_stats"]["postnet"]}},
        jnp.asarray(emb), jnp.asarray(src_lens.astype(np.int32)), T,
        speaker_args=jnp.asarray(spk.astype(np.int32)),
        mel_lens=jnp.asarray(mel_lens.astype(np.int32)),
        p_targets=jnp.asarray(pitch), e_targets=jnp.asarray(energy),
        d_targets=jnp.asarray(dur.astype(np.int32)),
        lang_args=jnp.asarray(lang.astype(np.int32)),
    )
    our_mel = np.asarray(j_out.mel)
    our_postnet = np.asarray(j_out.postnet_mel)

    # compare only valid frames of sample 0 (full length)
    n0 = int(mel_lens[0])
    mcd = mel_cepstral_distortion(ref_mel[0, :n0], our_mel[0, :n0])
    mcd_post = mel_cepstral_distortion(ref_postnet[0, :n0],
                                       our_postnet[0, :n0])
    max_diff = np.max(np.abs(ref_mel[0, :n0] - our_mel[0, :n0]))
    print(f"MCD(mel)={mcd:.4f} MCD(postnet)={mcd_post:.4f} "
          f"max|diff|={max_diff:.5f}")
    assert mcd < 0.1, mcd
    assert mcd_post < 0.1, mcd_post
    np.testing.assert_allclose(
        np.asarray(j_out.log_duration_prediction)[0, :int(src_lens[0])],
        ref_logd[0, :int(src_lens[0])], atol=2e-4)


def test_inference_duration_parity(parity_pair):
    """No-target path: predicted (rounded) durations must match exactly."""
    import torch
    import jax.numpy as jnp

    ref_model, model, variables = parity_pair
    rng = np.random.default_rng(1)
    B, L = 2, 16
    emb = rng.normal(size=(B, L, 256)).astype(np.float32)
    src_lens = np.array([L, L], np.int64)
    spk = np.array([1, 2])
    lang = np.array([0, 0])

    with torch.no_grad():
        t_out = ref_model(
            torch.from_numpy(spk), torch.from_numpy(emb),
            torch.from_numpy(src_lens), L, lang_args=torch.from_numpy(lang))
    ref_dur = t_out[5].numpy()
    ref_mel_len = t_out[9].numpy()
    T = int(ref_mel_len.max())

    j_out = model.apply(
        {"params": variables["params"],
         "batch_stats": {"postnet": variables["batch_stats"]["postnet"]}},
        jnp.asarray(emb), jnp.asarray(src_lens.astype(np.int32)), T,
        speaker_args=jnp.asarray(spk.astype(np.int32)),
        lang_args=jnp.asarray(lang.astype(np.int32)),
    )
    np.testing.assert_array_equal(
        np.asarray(j_out.duration_rounded), ref_dur.astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(j_out.mel_len), ref_mel_len.astype(np.int32))
