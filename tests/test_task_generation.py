"""Few-shot task generation: coverage guarantee + shot extension sharing one
query set + loadable config bundles."""
import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def labeled_corpus(tmp_path_factory):
    from fscl_tpu.data.feature_store import FeatureStore, write_queries_to_txt
    root = tmp_path_factory.mktemp("taskgen")
    store = FeatureStore(str(root / "features"))
    rng = np.random.default_rng(0)
    phones = ["A", "B", "C", "D", "E", "F"]
    queries = []
    for i in range(40):
        q = {"spk": "s0", "basename": f"u{i}"}
        n = int(rng.integers(2, 5))
        phns = [phones[int(j)] for j in rng.integers(0, len(phones), n)]
        store.phoneme.save(" ".join(phns), q)
        store.text.save(f"utt {i}", q)
        queries.append(q)
    store.save_speakers(["s0"])
    store.save_metadata(queries)
    store.flush()
    src = str(root / "val.txt")
    write_queries_to_txt(store, queries, src)
    return store, src, str(root / "few-shot")


def test_generate_tasks_with_coverage(labeled_corpus):
    from fscl_tpu.data.feature_store import read_queries_from_txt
    from fscl_tpu.eval.task_generation import TaskGenerator, collect_phonemes

    store, src, out_dir = labeled_corpus
    gen = TaskGenerator("mini", store, lang_id=8, symbol_id="ko", seed=666)
    gen.generate(src, out_dir, shots=[4, 8], n_qry=4, n_tasks=2)

    for n_shot in (4, 8):
        for i in range(2):
            task_dir = os.path.join(out_dir, f"{n_shot}-shot", f"task-{i}")
            train = read_queries_from_txt(os.path.join(task_dir, "train.txt"))
            val = read_queries_from_txt(os.path.join(task_dir, "val.txt"))
            assert len(train) == n_shot and len(val) == 4
            # coverage: support phonemes ⊇ query phonemes
            sup_phns = collect_phonemes(store, train)
            qry_phns = collect_phonemes(store, val)
            assert qry_phns <= sup_phns
            with open(os.path.join(task_dir, "config.yaml")) as f:
                cfg = yaml.safe_load(f)
            assert cfg["lang_id"] == 8 and cfg["symbol_id"] == "ko"

    # extended tasks share the SAME query set as the base (4-shot) task
    v4 = read_queries_from_txt(os.path.join(out_dir, "4-shot/task-0/val.txt"))
    v8 = read_queries_from_txt(os.path.join(out_dir, "8-shot/task-0/val.txt"))
    assert [q["basename"] for q in v4] == [q["basename"] for q in v8]
    # and the 8-shot support extends the 4-shot support
    t4 = {q["basename"] for q in read_queries_from_txt(
        os.path.join(out_dir, "4-shot/task-0/train.txt"))}
    t8 = {q["basename"] for q in read_queries_from_txt(
        os.path.join(out_dir, "8-shot/task-0/train.txt"))}
    assert t4 <= t8


def test_collect_phoneme_set(labeled_corpus, tmp_path):
    from fscl_tpu.eval.task_generation import collect_phoneme_set
    store, _, _ = labeled_corpus
    out = str(tmp_path / "phoneset.txt")
    phns = collect_phoneme_set([store], out)
    assert set(phns) <= {"A", "B", "C", "D", "E", "F"}
    assert os.path.isfile(out)
