"""ExperimentTracker — the reference's Comet role, offline (main.py:117-137)."""
import json
import os

import numpy as np

from fscl_tpu.obs.tracking import ExperimentTracker, read_metrics


def test_tracker_scalars_and_resume(tmp_path):
    t = ExperimentTracker(str(tmp_path), name="fscl",
                          params={"lr": 1e-3, "system": "fscl"})
    key = t.exp_key
    t.on_log(100, {"Total Loss": 3.5})
    t.on_validation(100, {"Total Loss": 4.0})
    t.close()

    # resume with the SAME exp_key (reference main.py:91-96)
    t2 = ExperimentTracker(str(tmp_path), name="fscl", exp_key=key)
    t2.on_log(200, {"Total Loss": 3.0})
    t2.close()

    rows = read_metrics(t2.dir)
    assert {r["name"] for r in rows} == {"Train/Total Loss",
                                         "Val/Total Loss"}
    assert [r["step"] for r in rows] == [100, 100, 200]
    meta = json.load(open(os.path.join(t2.dir, "meta.json")))
    assert meta["exp_key"] == key and meta["resumed"] == 1
    assert meta["params"]["lr"] == 1e-3


def test_tracker_assets(tmp_path):
    t = ExperimentTracker(str(tmp_path), name="x")
    p_txt = t.log_text("transcript", "HH AH0 L OW1", step=5)
    assert open(p_txt).read() == "HH AH0 L OW1"
    wav = np.zeros(2205, np.float32)
    p_wav = t.log_audio("sample", wav, step=5)
    assert os.path.isfile(p_wav)
    t.close()


def test_tracker_sink_receives_metrics(tmp_path):
    calls = []

    class Sink:
        def log_metrics(self, metrics, step):
            calls.append((metrics, step))

    t = ExperimentTracker(str(tmp_path), sink=Sink())
    t.on_log(7, {"Loss": 1.0})
    assert calls == [({"Train/Loss": 1.0}, 7)]
    t.close()
