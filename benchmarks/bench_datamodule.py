"""Datamodule-fed training throughput: prefetch=0 (blocking) vs prefetch=2.

Round-1 recorded 101 ms/step with per-step blocking on a 48-utt synthetic
corpus (BASELINE.md) and attributed the delta vs the 59 ms repeated-batch
step to tunnel round-trip, with the claim that the prefetcher hides it —
unmeasured. This measures it (VERDICT r1 weak #2): same corpus recipe,
full-size model, batch 16, both prefetch settings in ONE process.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PHONES = ["HH", "AY1", "W", "ER1", "L", "D", "AH0", "N"]


def synth_textgrid(phones, seg_dur=0.12, lead=0.05):
    xmax = lead + len(phones) * seg_dur + 0.05
    intervals = [(0.0, lead, "")]
    t = lead
    for p in phones:
        intervals.append((t, t + seg_dur, p))
        t += seg_dur
    intervals.append((t, xmax, ""))
    body = "".join(
        f"        intervals [{i+1}]:\n"
        f"            xmin = {a}\n            xmax = {b}\n"
        f"            text = \"{p}\"\n"
        for i, (a, b, p) in enumerate(intervals))
    return (
        'File type = "ooTextFile"\nObject class = "TextGrid"\n\n'
        f"xmin = 0\nxmax = {xmax}\ntiers? <exists>\nsize = 1\nitem []:\n"
        "    item [1]:\n        class = \"IntervalTier\"\n"
        "        name = \"phones\"\n"
        f"        xmin = 0\n        xmax = {xmax}\n"
        f"        intervals: size = {len(intervals)}\n" + body)


def build_corpus(root, n_utts=48, seed=0):
    from fscl_tpu.data.feature_store import FeatureStore, write_queries_to_txt
    from fscl_tpu.dsp.audio_io import save_wav
    from fscl_tpu.dsp.preprocess import (
        compute_stats, prepare_initial_features, preprocess_utterance,
    )

    store = FeatureStore(os.path.join(root, "features"))
    rng = np.random.default_rng(seed)
    sr = 22050
    queries, samples = [], []
    for i in range(n_utts):
        n_ph = int(rng.integers(6, 20))
        phones = [PHONES[int(j)] for j in rng.integers(0, len(PHONES), n_ph)]
        dur = 0.05 + n_ph * 0.12 + 0.05
        t = np.arange(int(sr * dur)) / sr
        wav = (0.4 * np.sin(2 * np.pi * (120 + 3 * i) * t)
               + 0.05 * rng.normal(size=len(t))).astype(np.float32)
        wav_path = os.path.join(root, f"u{i}.wav")
        save_wav(wav_path, wav, sr)
        tg = os.path.join(root, f"u{i}.TextGrid")
        with open(tg, "w") as f:
            f.write(synth_textgrid(phones))
        q = {"spk": "spk0", "basename": f"u{i}"}
        prepare_initial_features(store, q, wav_path, "dummy")
        s = preprocess_utterance(store, q, tg)
        assert s is not None
        samples.append(s)
        queries.append(q)
    compute_stats(samples, store)
    store.save_speakers(["spk0"])
    store.flush()
    txt = os.path.join(root, "train.txt")
    write_queries_to_txt(store, queries, txt)
    return store, txt


def main(n_steps=150):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")
    import dataclasses

    from fscl_tpu.core.config import (
        DataConfig, ModelConfig, OptimConfig, SpeakerConfig, TrainConfig,
    )
    from fscl_tpu.data.datamodules import FastSpeech2DataModule
    from fscl_tpu.systems.baseline import BaselineSystem
    from fscl_tpu.train.trainer import Trainer

    with tempfile.TemporaryDirectory() as root:
        store, txt = build_corpus(root)
        dc = DataConfig(name="bench", lang_id=0, symbol_id="en",
                        data_dir=os.path.join(root, "features"),
                        subsets=(("train", txt),))
        cfg = ModelConfig(speaker=SpeakerConfig(n_speakers=4),
                          max_seq_len=1000)
        system = BaselineSystem(cfg, OptimConfig(batch_size=16),
                                (("en", 361),))
        # NOTE: within-process repeat measurements through the axon tunnel
        # degrade ~2x (order artifact, BASELINE.md); pass a single prefetch
        # value on argv to measure one config per process.
        which = ([int(sys.argv[1])] if len(sys.argv) > 1 else [0, 2])
        results = []
        state = None
        for prefetch in which:
            tc = TrainConfig(optim=OptimConfig(batch_size=16),
                             total_step=10 ** 9, log_step=10 ** 9,
                             prefetch=prefetch)
            dm = FastSpeech2DataModule([dc], cfg, tc)
            dm.setup()
            gen = dm.train_batches()
            if state is None:
                state = system.init_state(jax.random.PRNGKey(0), next(gen))
            trainer = Trainer(system, tc)
            # warm-up/compile pass (all buckets)
            st = trainer.fit(state, gen, max_steps=int(state.step) + 30)
            t0 = time.time()
            st = trainer.fit(st, gen, max_steps=int(st.step) + n_steps)
            jax.block_until_ready(st.params)
            dt = time.time() - t0
            results.append({
                "prefetch": prefetch,
                "steps_per_sec": round(n_steps / dt, 2),
                "ms_per_step": round(dt / n_steps * 1000, 1),
            })
            print(json.dumps(results[-1]), flush=True)
        return results


if __name__ == "__main__":
    main()
