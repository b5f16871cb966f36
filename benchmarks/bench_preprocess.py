"""Preprocessing throughput: utterances/sec for the full per-utterance
stage-2 pipeline (mel+energy on device, C++ YIN pitch, durations, averages,
d-vector slices) — SURVEY §6 measurement target (c)."""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_utts: int = 20, dur_s: float = 5.0):
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.dsp.preprocess import preprocess_utterance
    from fscl_tpu.dsp.audio_io import save_wav

    sr = 22050
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp()
    store = FeatureStore(os.path.join(tmp, "corpus"))

    tg_lines = []
    n_seg = 20
    seg_d = (dur_s - 0.2) / n_seg
    intervals = [(0.0, 0.1, "")]
    t = 0.1
    for i in range(n_seg):
        intervals.append((t, t + seg_d, "HH" if i % 2 else "AY1"))
        t += seg_d
    intervals.append((t, dur_s, ""))
    body = "".join(
        f"        intervals [{i+1}]:\n            xmin = {a}\n"
        f"            xmax = {b}\n            text = \"{p}\"\n"
        for i, (a, b, p) in enumerate(intervals))
    tg = (
        'File type = "ooTextFile"\nObject class = "TextGrid"\n\n'
        f"xmin = 0\nxmax = {dur_s}\ntiers? <exists>\nsize = 1\nitem []:\n"
        "    item [1]:\n        class = \"IntervalTier\"\n"
        "        name = \"phones\"\n"
        f"        xmin = 0\n        xmax = {dur_s}\n"
        f"        intervals: size = {len(intervals)}\n" + body)
    tg_path = os.path.join(tmp, "u.TextGrid")
    with open(tg_path, "w") as f:
        f.write(tg)

    queries = []
    for i in range(n_utts):
        t_ax = np.arange(int(sr * dur_s)) / sr
        wav22 = (0.4 * np.sin(2 * np.pi * (150 + 10 * i) * t_ax)
                 + 0.02 * rng.normal(size=len(t_ax))).astype(np.float32)
        q = {"spk": "s", "basename": f"u{i}"}
        store.wav_22050.save(wav22, q)
        store.wav_16000.save(wav22[:: 2][: int(16000 * dur_s)], q)
        queries.append(q)

    # warm up the mel-bucket compile
    preprocess_utterance(store, queries[0], tg_path)
    t0 = time.time()
    for q in queries:
        preprocess_utterance(store, q, tg_path)
    dt = time.time() - t0
    print(json.dumps({
        "metric": "preprocessing_utterances_per_sec",
        "value": round(n_utts / dt, 2),
        "unit": "utt/s",
        "utt_seconds": dur_s,
        "audio_realtime_factor": round(n_utts * dur_s / dt, 1),
    }))

    # batched device dispatch (one call per wav bucket per device_batch)
    from fscl_tpu.dsp.preprocess import preprocess_utterances_batched
    items = [(q, tg_path) for q in queries]
    preprocess_utterances_batched(store, items[:2], device_batch=8)  # warm
    t0 = time.time()
    samples, ok = preprocess_utterances_batched(store, items,
                                                device_batch=8)
    dt = time.time() - t0
    assert len(ok) == n_utts
    print(json.dumps({
        "metric": "preprocessing_utterances_per_sec_batched",
        "value": round(n_utts / dt, 2),
        "unit": "utt/s",
        "utt_seconds": dur_s,
        "device_batch": 8,
        "audio_realtime_factor": round(n_utts * dur_s / dt, 1),
    }))

    # batched + ON-DEVICE pitch (yin_device): host pitch removed entirely
    preprocess_utterances_batched(store, items[:2], device_batch=8,
                                  pitch_method="yin_device")  # warm
    t0 = time.time()
    samples, ok = preprocess_utterances_batched(
        store, items, device_batch=8, pitch_method="yin_device")
    dt = time.time() - t0
    assert len(ok) == n_utts
    print(json.dumps({
        "metric": "preprocessing_utterances_per_sec_batched_device_pitch",
        "value": round(n_utts / dt, 2),
        "unit": "utt/s",
        "utt_seconds": dur_s,
        "device_batch": 8,
        "audio_realtime_factor": round(n_utts * dur_s / dt, 1),
    }))

    # batched + ON-DEVICE WORLD pitch (world_device): the parity-default
    # DIO algorithm on the TPU (dsp/world_device.py, VERDICT r3 #6)
    preprocess_utterances_batched(store, items[:2], device_batch=8,
                                  pitch_method="world_device")  # warm
    t0 = time.time()
    samples, ok = preprocess_utterances_batched(
        store, items, device_batch=8, pitch_method="world_device")
    dt = time.time() - t0
    assert len(ok) == n_utts
    print(json.dumps({
        "metric": "preprocessing_utterances_per_sec_batched_world_device",
        "value": round(n_utts / dt, 2),
        "unit": "utt/s",
        "utt_seconds": dur_s,
        "device_batch": 8,
        "audio_realtime_factor": round(n_utts * dur_s / dt, 1),
    }))


if __name__ == "__main__":
    main()
