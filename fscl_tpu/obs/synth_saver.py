"""Synthesis saver: validation-time sample synthesis artifacts.

Re-provides the reference saver's synth_step path (callbacks/language/
baseline_saver.py:47-128 + utils/log.py synth_one_sample_with_target):
reconstruction (teacher-forced durations) and synthesis (predicted
durations) of one validation sample, written as wav + mel figure, with
pitch/energy de-normalized for the overlay.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from fscl_tpu.core.stats import DEFAULT_STATS, GlobalStats
from fscl_tpu.obs.figures import plot_mel
from fscl_tpu.obs.loggers import Callback


class SynthSaver(Callback):
    def __init__(self, result_dir: str, system, vocoder=None,
                 stats: GlobalStats = DEFAULT_STATS, sample_rate: int = 22050,
                 synth_step: int = 1000, write_audio: bool = True):
        self.result_dir = result_dir
        self.system = system
        self.vocoder = vocoder
        self.stats = stats
        self.sample_rate = sample_rate
        self.synth_step = synth_step
        self.write_audio = write_audio
        os.makedirs(result_dir, exist_ok=True)

    def _vocode(self, mel: np.ndarray) -> np.ndarray:
        if self.vocoder is not None:
            return self.vocoder.infer(mel)
        from fscl_tpu.audio_out.vocoder import griffin_lim
        return griffin_lim(mel, sr=self.sample_rate, n_iter=8)

    def save_sample(self, step: int, tag: str, mel: np.ndarray,
                    pitch: Optional[np.ndarray] = None,
                    energy: Optional[np.ndarray] = None,
                    write_audio: bool = True):
        """mel (T, n_mels); pitch/energy normalized (de-normalized for the
        figure like utils/log.py:24-33)."""
        if pitch is not None:
            pitch = pitch * self.stats.pitch.std + self.stats.pitch.mean
        if energy is not None:
            energy = energy * self.stats.energy.std + self.stats.energy.mean
        base = os.path.join(self.result_dir, f"step{step}-{tag}")
        plot_mel(mel, pitch, energy, title=tag, path=base + ".png")
        if write_audio:
            from fscl_tpu.dsp.audio_io import save_wav
            wav = self._vocode(mel)
            save_wav(base + ".wav", wav, self.sample_rate)

    def on_validation_sample(self, step: int, state, batch, symbol_id=None):
        """Reconstruction + synthesis of the first sample in the batch."""
        import jax
        import jax.numpy as jnp

        if step % self.synth_step != 0:
            return
        out, _ = self.system.forward(state.params, state.batch_stats, batch)
        n = int(np.asarray(out.mel_len)[0])
        self.save_sample(
            step, "recon", np.asarray(out.postnet_mel)[0, :n],
            pitch=np.asarray(batch.pitches)[0],
            energy=np.asarray(batch.energies)[0],
            write_audio=self.write_audio)
        synth = self.system.synthesize(
            state.params, state.batch_stats,
            jnp.asarray(batch.texts[:1]), jnp.asarray(batch.src_lens[:1]),
            # [:1] per leaf: speaker_args may be a DvecRefs pytree
            batch.mels.shape[1],
            jax.tree.map(lambda x: jnp.asarray(x[:1]), batch.speaker_args),
            jnp.asarray(batch.lang_ids[:1]), symbol_id=symbol_id)
        m = int(np.asarray(synth.mel_len)[0])
        self.save_sample(
            step, "synth", np.asarray(synth.postnet_mel)[0, :max(m, 1)],
            pitch=np.asarray(synth.pitch_prediction)[0],
            energy=np.asarray(synth.energy_prediction)[0],
            write_audio=self.write_audio)
