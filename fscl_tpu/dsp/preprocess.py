"""Shared preprocessing pipeline (Parsers/template.py:20-129 equivalent).

Stages per utterance:
  1. prepare_initial_features: load wav at 22.05 k + 16 k, peak-normalize,
     store text (template.py:20-27).
  2. preprocess: TextGrid -> segments + phonemes; trim wavs to the voiced
     span; wav -> log-mel/energy (XLA, batched on device) + pitch (YIN/C++)
     + interpolated pitch; segments -> durations; duration-averaged
     pitch/energy; speaker-reference mel slices for the d-vector path;
     corpus stats.json (template.py:30-100).
  3. split datasets -> train/val/test txt files (template.py:103-129).

The mel/energy path runs through fscl_tpu.ops.stft (jit, device-batched) —
the fused-XLA replacement for the reference's per-utterance librosa calls.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from fscl_tpu.core.config import AudioConfig
from fscl_tpu.data.feature_store import FeatureStore, write_queries_to_txt
from fscl_tpu.dsp.audio_io import load_wav, wav_normalization
from fscl_tpu.dsp.pitch import extract_pitch, interpolate_f0
from fscl_tpu.dsp.textgrid import textgrid_to_segments_and_phonemes

# d-vector slicing constants (resemblyzer contract: 16 kHz, 40-mel,
# 10 ms hop, ~1.6 s partials with 50% overlap)
DVEC_SR = 16000
DVEC_MEL = 40
DVEC_HOP = 160
DVEC_WIN = 400
PARTIAL_FRAMES = 160
PARTIAL_HOP = 80


def prepare_initial_features(store: FeatureStore, query, wav_path: str,
                             text: str, audio: AudioConfig = AudioConfig()):
    wav22 = wav_normalization(load_wav(wav_path, audio.sampling_rate))
    wav16 = wav_normalization(load_wav(wav_path, audio.ssl_sampling_rate))
    store.wav_22050.save(wav22, query)
    store.wav_16000.save(wav16, query)
    store.text.save(text, query)


_WAV_BUCKETS = tuple(22050 * s for s in (2, 4, 6, 8, 10, 12, 15, 20))
_mel_fns = {}


def _get_mel_fn(padded_len: int, audio: AudioConfig):
    """Cached jitted log-mel + energy for one wav-length bucket; works on
    (T,) or (B, T) inputs (ops/stft.py is batch-dim generic)."""
    import jax

    from fscl_tpu.ops.stft import mel_spectrogram

    key = (padded_len, audio)
    if key not in _mel_fns:
        _mel_fns[key] = jax.jit(lambda w: mel_spectrogram(
            w, sr=audio.sampling_rate, n_fft=audio.n_fft,
            hop_length=audio.hop_length, win_length=audio.win_length,
            n_mels=audio.n_mels, fmin=audio.mel_fmin, fmax=audio.mel_fmax))
    return _mel_fns[key]


_mel_pitch_fns = {}


def _get_mel_pitch_fn(padded_len: int, audio: AudioConfig,
                      tracker: str = "yin"):
    """Cached jitted fused log-mel + energy + F0 for one wav bucket —
    one upload and one round trip per batch instead of two (the mel and
    pitch passes consume the SAME (B, bucket) padded wavs). `tracker`
    picks the on-device algorithm: "yin" (dsp/pitch_device.py) or
    "world" (the parity-default DIO, dsp/world_device.py)."""
    import jax

    from fscl_tpu.ops.stft import mel_spectrogram

    key = (padded_len, audio, tracker)
    if key not in _mel_pitch_fns:
        if tracker == "world":
            from fscl_tpu.dsp.world_device import world_f0_batched as f0_fn
        else:
            from fscl_tpu.dsp.pitch_device import yin_f0_batched as f0_fn

        def fused(w, lens):
            mel, energy = mel_spectrogram(
                w, sr=audio.sampling_rate, n_fft=audio.n_fft,
                hop_length=audio.hop_length, win_length=audio.win_length,
                n_mels=audio.n_mels, fmin=audio.mel_fmin, fmax=audio.mel_fmax)
            f0 = f0_fn(w, lens, sr=audio.sampling_rate,
                       hop_length=audio.hop_length)
            return mel, energy, f0

        _mel_pitch_fns[key] = jax.jit(fused)
    return _mel_pitch_fns[key]


def mel_energy_from_wav(wav: np.ndarray, audio: AudioConfig):
    """Device-jitted log-mel + energy (ops.stft).

    Wav lengths are padded to buckets so XLA compiles once per bucket, not
    once per utterance length; padded frames are sliced off after.
    """
    import jax.numpy as jnp

    from fscl_tpu.data.batch import bucket_len

    n = len(wav)
    n_frames = 1 + n // audio.hop_length
    padded_len = bucket_len(n, _WAV_BUCKETS)
    padded = np.zeros(padded_len, np.float32)
    padded[:n] = wav
    mel, energy = _get_mel_fn(padded_len, audio)(jnp.asarray(padded))
    return np.asarray(mel)[:n_frames], np.asarray(energy)[:n_frames]


_DVEC_BUCKETS = tuple(16000 * s for s in (2, 4, 6, 8, 10, 12, 15, 20))
_dvec_fns = {}


def _get_dvec_fn(padded_len: int):
    """Cached jitted d-vector 40-mel log spectrogram for one bucket; (T,)
    or (B, T). The mel projection + log run fused with the STFT on device
    (the host matmul cost ~ms per utterance on a 1-vCPU TPU host)."""
    import jax
    import jax.numpy as jnp

    from fscl_tpu.ops.stft import mel_filterbank, stft_magnitude

    if padded_len not in _dvec_fns:
        fb = jnp.asarray(mel_filterbank(DVEC_SR, DVEC_WIN, DVEC_MEL, 0.0,
                                        DVEC_SR / 2).T)

        def dvec_mel(w):
            mag = stft_magnitude(w, n_fft=DVEC_WIN, hop_length=DVEC_HOP,
                                 win_length=DVEC_WIN)
            return jnp.log(jnp.maximum(mag @ fb, 1e-10))

        _dvec_fns[padded_len] = jax.jit(dvec_mel)
    return _dvec_fns[padded_len]


def _dvec_slices_from_mel(mel: np.ndarray) -> np.ndarray:
    """Host tail of the d-vector feature: partial slicing only
    (resemblyzer contract: ~1.6 s partials, 50% overlap)."""
    n = mel.shape[0]
    if n < PARTIAL_FRAMES:
        mel = np.pad(mel, ((0, PARTIAL_FRAMES - n), (0, 0)))
        n = PARTIAL_FRAMES
    starts = list(range(0, n - PARTIAL_FRAMES + 1, PARTIAL_HOP)) or [0]
    return np.stack([mel[s: s + PARTIAL_FRAMES] for s in starts]).astype(np.float32)


def dvec_mel_slices(wav16: np.ndarray) -> np.ndarray:
    """Speaker-reference 40-mel slices (spk_ref_mel_slices feature):
    resemblyzer-style partial utterances for GE2E averaging. The STFT is
    jitted per wav-length bucket — eager dispatch over the remote-TPU tunnel
    is catastrophically slow (one round-trip per op)."""
    import jax.numpy as jnp

    from fscl_tpu.data.batch import bucket_len

    n = len(wav16)
    padded_len = bucket_len(n, _DVEC_BUCKETS)
    padded = np.zeros(padded_len, np.float32)
    padded[:n] = wav16
    n_frames = 1 + n // DVEC_HOP
    mel = np.asarray(_get_dvec_fn(padded_len)(jnp.asarray(padded)))[:n_frames]
    return _dvec_slices_from_mel(mel)


def _stage2_prepare(store: FeatureStore, query, textgrid_path: str,
                    audio: AudioConfig) -> Optional[Dict]:
    """Host half A of stage-2: TextGrid parse + wav reads + trims.
    Returns a record for the device stage, or None on sanity failure."""
    segments, phonemes = textgrid_to_segments_and_phonemes(textgrid_path)
    if not segments:
        return None
    t0, t1 = segments[0][0], segments[-1][1]

    wav22 = store.wav_22050.read_from_query(query)
    wav16 = store.wav_16000.read_from_query(query)
    trim22 = wav22[int(t0 * audio.sampling_rate): int(t1 * audio.sampling_rate)]
    trim16 = wav16[int(t0 * audio.ssl_sampling_rate): int(t1 * audio.ssl_sampling_rate)]
    if len(trim22) < audio.n_fft:
        return None

    # re-zero segments to the trimmed origin
    segments = [(s - t0, e - t0) for s, e in segments]
    return {"query": query, "trim22": trim22, "trim16": trim16,
            "segments": segments, "phonemes": phonemes}


def preprocess_utterance(
    store: FeatureStore, query, textgrid_path: str,
    audio: AudioConfig = AudioConfig(),
    pitch_method: str = "world",
) -> Optional[Dict[str, float]]:
    """Full per-utterance stage-2: returns pitch/energy samples for stats,
    or None if the utterance fails sanity checks."""
    rec = _stage2_prepare(store, query, textgrid_path, audio)
    if rec is None:
        return None
    mel, energy = mel_energy_from_wav(rec["trim22"], audio)
    dvec = dvec_mel_slices(rec["trim16"])
    return _stage2_finish(store, rec, mel, energy, dvec, audio, pitch_method)


def _stage2_finish(store: FeatureStore, rec: Dict, mel, energy, dvec,
                   audio: AudioConfig,
                   pitch_method: str) -> Optional[Dict[str, float]]:
    """Host half B of stage-2: pitch, durations, averages, saves."""
    query, trim22, trim16 = rec["query"], rec["trim22"], rec["trim16"]
    segments, phonemes = rec["segments"], rec["phonemes"]
    if "pitch" in rec:                 # precomputed by the batched device path
        pitch = rec["pitch"]
    else:
        pitch = extract_pitch(trim22, audio.sampling_rate, audio.hop_length,
                              method=pitch_method)
    n = min(len(mel), len(pitch), len(energy))
    mel, pitch, energy = mel[:n], pitch[:n], energy[:n]
    interp_pitch, _ = interpolate_f0(pitch)

    fp = audio.hop_length / audio.sampling_rate
    durations = []
    pos = 0.0
    for s, e in segments:
        d = int(round(e / fp)) - int(round(pos / fp))
        durations.append(max(d, 0))
        pos = e
    total = sum(durations)
    if total > n:
        # clamp the last segments into the available frames
        overflow = total - n
        for i in range(len(durations) - 1, -1, -1):
            take = min(durations[i], overflow)
            durations[i] -= take
            overflow -= take
            if overflow == 0:
                break
        total = sum(durations)

    # duration-averaged pitch/energy (phoneme level)
    avg_pitch, avg_energy = [], []
    pos = 0
    for d in durations:
        if d > 0:
            seg_pitch = interp_pitch[pos: pos + d]
            avg_pitch.append(float(np.mean(seg_pitch)))
            avg_energy.append(float(np.mean(energy[pos: pos + d])))
        else:
            avg_pitch.append(0.0)
            avg_energy.append(0.0)
        pos += d

    store.wav_trim_22050.save(trim22, query)
    store.wav_trim_16000.save(trim16, query)
    store.mel.save(mel.astype(np.float32), query)
    store.pitch.save(pitch.astype(np.float32), query)
    store.interpolate_pitch.save(interp_pitch.astype(np.float32), query)
    store.energy.save(energy.astype(np.float32), query)
    store.mfa_duration.save(np.asarray(durations, np.int64), query)
    store.mfa_duration_avg_pitch.save(np.asarray(avg_pitch, np.float32), query)
    store.mfa_duration_avg_energy.save(np.asarray(avg_energy, np.float32), query)
    store.mfa_segment.save([[float(s), float(e)] for s, e in segments], query)
    store.phoneme.save(" ".join(phonemes), query)
    store.spk_ref_mel_slices.save(dvec, query)

    voiced = pitch[pitch > 0]
    return {
        "pitch": voiced.tolist(),
        "energy": energy.tolist(),
    }


def preprocess_utterances_batched(
    store: FeatureStore,
    items: Sequence[Tuple[Dict, str]],
    audio: AudioConfig = AudioConfig(),
    pitch_method: str = "world",
    device_batch: int = 16,
    chunk_size: int = 256,
    on_error=None,
) -> Tuple[List[Dict[str, list]], List[Dict]]:
    """Stage-2 over many utterances with BATCHED device dispatch.

    The per-utterance path issues two device calls per utterance (mel+
    energy, d-vector STFT); over a remote-TPU tunnel each call pays the
    round-trip latency, which dominates preprocessing (BASELINE.md: 3.33
    utt/s, transport-bound). Here utterances are grouped by wav-length
    bucket and each group of `device_batch` runs as ONE batched call —
    the same frame/FFT ops with a leading batch axis (ops/stft.py is
    written with `...` batch dims throughout).

    `items` = sequence of (query, textgrid_path). Per-utterance failures
    are isolated: `on_error(query, exception)` is called (default: print)
    and the rest proceed. Returns (stats_samples, ok_queries) in input
    order, matching the per-utterance loop's accounting. Peak memory is
    bounded: at most `chunk_size` utterances' wavs+features are held at
    once (the per-utterance path streams; a corpus-sized `items` must
    not pin the whole corpus in host RAM).
    """
    def _report(q, e):
        if on_error is not None:
            on_error(q, e)
        else:
            print(f"[preprocess] failed {q}: {e}")

    stats_samples, ok_queries = [], []
    for c in range(0, len(items), max(1, chunk_size)):
        s, q = _preprocess_chunk_batched(
            store, items[c: c + chunk_size], audio, pitch_method,
            device_batch, _report)
        stats_samples.extend(s)
        ok_queries.extend(q)
    return stats_samples, ok_queries


def _preprocess_chunk_batched(store, items, audio, pitch_method,
                              device_batch, _report):
    import jax.numpy as jnp

    from fscl_tpu.data.batch import bucket_len

    recs = []
    for query, tg_path in items:
        try:
            rec = _stage2_prepare(store, query, tg_path, audio)
        except Exception as e:  # ignore_errors=True semantics
            _report(query, e)
            continue
        if rec is not None:
            recs.append(rec)

    # Dispatch EVERY device call before materializing any result: jax
    # dispatch is async, so over a remote-TPU tunnel the round trips
    # pipeline (dispatch,dispatch,... -> wait) instead of serializing
    # (dispatch -> wait -> dispatch -> wait).
    pending = []  # (device arrays, chunk indices, kind)

    # ---- batched mel/energy (+ fused device pitch) over 22.05 kHz trim
    # buckets. pitch_method="yin_device" runs the whole YIN tracker on the
    # TPU fused into the SAME jitted call as mel/energy (one upload + one
    # round trip per batch; dsp/pitch_device.py) — on a slow host the
    # per-utterance C++/numpy pitch pass dominates otherwise.
    device_pitch = pitch_method in ("yin_device", "world_device")
    groups: Dict[int, List[int]] = {}
    for i, rec in enumerate(recs):
        groups.setdefault(
            bucket_len(len(rec["trim22"]), _WAV_BUCKETS), []).append(i)
    for bucket, idxs in groups.items():
        fn = (_get_mel_pitch_fn(
                  bucket, audio,
                  tracker="world" if pitch_method == "world_device"
                  else "yin")
              if device_pitch else _get_mel_fn(bucket, audio))
        for c in range(0, len(idxs), device_batch):
            chunk = idxs[c: c + device_batch]
            padded = np.zeros((device_batch, bucket), np.float32)
            lens = np.zeros(device_batch, np.int32)
            for row, i in enumerate(chunk):
                w = recs[i]["trim22"]
                padded[row, :len(w)] = w
                lens[row] = len(w)
            if device_pitch:
                out = fn(jnp.asarray(padded), jnp.asarray(lens))
            else:
                out = fn(jnp.asarray(padded))
            pending.append((out, chunk, "mel"))

    # ---- batched d-vector STFT over 16 kHz trim buckets ----
    groups = {}
    for i, rec in enumerate(recs):
        groups.setdefault(
            bucket_len(len(rec["trim16"]), _DVEC_BUCKETS), []).append(i)
    for bucket, idxs in groups.items():
        fn = _get_dvec_fn(bucket)
        for c in range(0, len(idxs), device_batch):
            chunk = idxs[c: c + device_batch]
            padded = np.zeros((device_batch, bucket), np.float32)
            for row, i in enumerate(chunk):
                w = recs[i]["trim16"]
                padded[row, :len(w)] = w
            pending.append((fn(jnp.asarray(padded)), chunk, "dvec"))

    for out, chunk, kind in pending:
        if kind == "mel":
            mel_b, energy_b = np.asarray(out[0]), np.asarray(out[1])
            pitch_b = np.asarray(out[2]) if len(out) > 2 else None
            for row, i in enumerate(chunk):
                nf = 1 + len(recs[i]["trim22"]) // audio.hop_length
                recs[i]["mel"] = mel_b[row, :nf]
                recs[i]["energy"] = energy_b[row, :nf]
                if pitch_b is not None:
                    recs[i]["pitch"] = pitch_b[row, :nf]
        else:
            dvec_mel_b = np.asarray(out)
            for row, i in enumerate(chunk):
                nf = 1 + len(recs[i]["trim16"]) // DVEC_HOP
                recs[i]["dvec"] = _dvec_slices_from_mel(dvec_mel_b[row, :nf])

    # ---- host tail (pitch, durations, averages, saves) in input order ----
    stats_samples, ok_queries = [], []
    for rec in recs:
        try:
            s = _stage2_finish(store, rec, rec["mel"], rec["energy"],
                               rec["dvec"], audio, pitch_method)
        except Exception as e:
            _report(rec["query"], e)
            continue
        if s is not None:
            stats_samples.append(s)
            ok_queries.append(rec["query"])
    return stats_samples, ok_queries


def compute_stats(samples: List[Dict[str, list]], store: FeatureStore) -> dict:
    """Corpus stats.json: pitch/energy min/max/mean/std over all frames
    (voiced-only pitch), like get_stats in template.preprocess."""
    pitch = np.concatenate([np.asarray(s["pitch"]) for s in samples if s["pitch"]])
    energy = np.concatenate([np.asarray(s["energy"]) for s in samples])
    stats = {
        "pitch": [float(pitch.min()), float(pitch.max()),
                  float(pitch.mean()), float(pitch.std())],
        "energy": [float(energy.min()), float(energy.max()),
                   float(energy.mean()), float(energy.std())],
    }
    with open(store.stats_path, "w") as f:
        json.dump(stats, f, indent=4)
    return stats


def split_monospeaker_dataset(store: FeatureStore, queries, output_dir: str,
                              val_size: int = 400, test_size: int = 400):
    """(template.py:103-115): deterministic tail split."""
    train = queries[: -(val_size + test_size)] if len(queries) > val_size + test_size else queries
    val = queries[-(val_size + test_size): -test_size] if len(queries) > val_size + test_size else queries
    test = queries[-test_size:] if len(queries) > test_size else queries
    write_queries_to_txt(store, train, os.path.join(output_dir, "train.txt"))
    write_queries_to_txt(store, val, os.path.join(output_dir, "val.txt"))
    write_queries_to_txt(store, test, os.path.join(output_dir, "test.txt"))


def split_multispeaker_dataset(store: FeatureStore, queries, output_dir: str,
                               val_spk_frac: float = 0.05):
    """(template.py:118-129): hold out whole speakers for val/test."""
    spks = sorted({q["spk"] for q in queries})
    n_hold = max(1, int(len(spks) * val_spk_frac))
    val_spks = set(spks[-2 * n_hold: -n_hold])
    test_spks = set(spks[-n_hold:])
    train = [q for q in queries if q["spk"] not in val_spks | test_spks]
    val = [q for q in queries if q["spk"] in val_spks]
    test = [q for q in queries if q["spk"] in test_spks]
    write_queries_to_txt(store, train, os.path.join(output_dir, "train.txt"))
    write_queries_to_txt(store, val, os.path.join(output_dir, "val.txt"))
    write_queries_to_txt(store, test, os.path.join(output_dir, "test.txt"))
