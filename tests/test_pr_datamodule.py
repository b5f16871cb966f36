"""Episodic PR datamodule test."""
import numpy as np

from fscl_tpu.core.config import DataConfig, ModelConfig, OptimConfig, TrainConfig


def test_pr_episodic_datamodule(tmp_path):
    from fscl_tpu.data.datamodules import PREpisodicDataModule
    from fscl_tpu.data.feature_store import FeatureStore, write_queries_to_txt

    store = FeatureStore(str(tmp_path / "features"))
    rng = np.random.default_rng(0)
    queries = []
    phones = ["HH", "AY1", "K", "S", "T"]
    for i in range(8):
        q = {"spk": "s0", "basename": f"u{i}"}
        n = int(rng.integers(2, 5))
        phns = [phones[int(j)] for j in rng.integers(0, len(phones), n)]
        store.phoneme.save(" ".join(phns), q)
        store.text.save("x", q)
        store.wav_trim_16000.save(
            rng.normal(size=int(rng.integers(4000, 8001))).astype(np.float32), q)
        seg = []
        t = 0.0
        for _ in phns:
            seg.append([t, t + 0.1])
            t += 0.1
        store.mfa_segment.save(seg, q)
        queries.append(q)
    store.save_speakers(["s0"])
    store.flush()
    split = str(tmp_path / "train.txt")
    write_queries_to_txt(store, queries, split)

    dc = DataConfig(name="prtest", lang_id=0, symbol_id="en",
                    data_dir=store.root, subsets=(("train", split),),
                    text_cleaners=("basic_cleaners",))
    dm = PREpisodicDataModule([dc], ModelConfig(), TrainConfig(),
                              shots=4, queries=2)
    dm.setup()
    episode = next(dm.train_batches())
    assert episode.sup.wavs.shape[0] == 4
    assert episode.qry.wavs.shape[0] == 2
    assert episode.sup.symbol_id == "en"
    assert (episode.sup.avg_frames.sum(axis=1) > 0).all()
