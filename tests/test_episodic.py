"""Episodic engine tests: coverage split, deterministic replay, collate."""
import numpy as np

from fscl_tpu.data.episodic import (
    EpisodicSampler, ReIdMapper, collate_episode, get_or_create_tasks,
    split_sup_qry,
)


def _mk(phonemes):
    return {"phonemes": np.asarray(phonemes)}


def test_split_sup_qry_coverage():
    # sample 0 is the only one containing phoneme 9 -> forced into support
    samples = [
        _mk([9, 2]), _mk([2, 3]), _mk([3, 2]), _mk([2, 3, 4]), _mk([4, 3]),
    ]
    sup, qry = split_sup_qry(samples, shots=3, queries=2)
    assert 0 in sup
    assert len(sup) == 3 and len(qry) == 2
    # query phonemes covered by support
    sup_phns = set()
    for i in sup:
        sup_phns |= set(int(p) for p in samples[i]["phonemes"])
    for i in qry:
        assert set(int(p) for p in samples[i]["phonemes"]) <= sup_phns


def test_split_fallback_redistribution():
    # every sample unique phoneme -> all forced; fallback splits positionally
    samples = [_mk([i]) for i in range(4)]
    sup, qry = split_sup_qry(samples, shots=2, queries=2)
    assert len(sup) == 2 and len(qry) == 2


def test_sampler_deterministic_replay(tmp_path):
    labels = ["en"] * 20 + ["ko"] * 20
    s1 = EpisodicSampler(labels, shots=4, queries=2, seed=43)
    path = str(tmp_path / "val_descriptions.json")
    tasks1 = get_or_create_tasks(s1, 3, path)
    # second sampler with different seed still replays persisted tasks
    s2 = EpisodicSampler(labels, shots=4, queries=2, seed=7)
    tasks2 = get_or_create_tasks(s2, 3, path)
    assert tasks1 == tasks2
    assert len(tasks1) == 6  # 2 labels x 3 tasks
    for t in tasks1:
        assert len(t) == 6


def test_collate_episode_shapes():
    rng = np.random.default_rng(0)
    samples = []
    for i in range(6):
        L = rng.integers(4, 9)
        dur = rng.integers(1, 4, L)
        samples.append({
            "id": f"u{i}", "speaker": 0, "text": "",
            "phonemes": rng.integers(1, 10, L),
            "mel": rng.normal(size=(int(dur.sum()), 80)).astype(np.float32),
            "pitch": rng.normal(size=L).astype(np.float32),
            "energy": rng.normal(size=L).astype(np.float32),
            "duration": dur,
            "lang_id": 0, "symbol_id": "en", "n_symbols": 10,
            "raw_feat": rng.normal(size=rng.integers(8000, 16001)).astype(np.float32),
            "avg_frames": dur,
        })
    ep = collate_episode(samples, shots=4, queries=2)
    assert ep.sup.wavs.shape[0] == 4
    assert ep.qry.texts.shape[0] == 2
    assert ep.sup.n_symbols == 10
    assert ep.sup.wavs.shape[1] % 16000 == 0  # bucketed


def test_reid_mapper():
    m = ReIdMapper((("en", 100), ("ko", 50)))
    assert m.n_symbols == 150
    np.testing.assert_array_equal(
        m(np.array([1, 2]), "ko"), np.array([101, 102]))
