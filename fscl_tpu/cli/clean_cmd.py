"""`fscl_tpu clean` — data validation / filtering (clean.py:13-140).

Checkers: utterance length 1-15 s, feature-file existence, NaN features,
unknown-token (`spn`) filtering. Writes data_info-clean.json.
"""
from __future__ import annotations

import json
import os

import numpy as np


def run(args):
    from fscl_tpu.data.feature_store import FeatureStore

    store = FeatureStore(args.data_dir)
    queries = store.load_metadata()
    kept, reasons = [], {"length": 0, "existence": 0, "nan": 0, "spn": 0}
    for q in queries:
        try:
            if not (store.mel.exists(q) and store.mfa_duration.exists(q)
                    and store.phoneme.exists(q)):
                reasons["existence"] += 1
                continue
            wav = store.wav_trim_22050.read_from_query(q)
            dur_s = len(wav) / 22050.0
            if not (1.0 <= dur_s <= 15.0):
                reasons["length"] += 1
                continue
            bad_nan = False
            for feat in (store.mel, store.pitch, store.energy,
                         store.mfa_duration_avg_pitch,
                         store.mfa_duration_avg_energy):
                if np.isnan(np.asarray(feat.read_from_query(q))).any():
                    bad_nan = True
                    break
            if bad_nan:
                reasons["nan"] += 1
                continue
            if "spn" in store.phoneme.read_from_query(q).split():
                reasons["spn"] += 1
                continue
            kept.append(q)
        except Exception:
            reasons["existence"] += 1
    out = args.output or os.path.join(args.data_dir, "data_info-clean.json")
    with open(out, "w", encoding="utf-8") as f:
        json.dump(kept, f, indent=2)
    print(f"[clean] kept {len(kept)}/{len(queries)}; filtered: {reasons}")
    print(f"[clean] wrote {out}")
