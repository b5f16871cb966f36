"""CLI surface tests (subprocess, like a user would run them)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "PYTHONPATH": REPO,
       "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}


def run_cli(*args, timeout=120):
    return subprocess.run(
        [sys.executable, "-m", "fscl_tpu.cli", *args],
        capture_output=True, text=True, timeout=timeout, env=ENV, cwd=REPO)


def test_cli_help():
    r = run_cli("--help")
    assert r.returncode == 0
    for cmd in ("preprocess", "train", "tune", "synth", "evaluate", "clean"):
        assert cmd in r.stdout


def test_cli_evaluate(tmp_path):
    seg = [[0.0, 0.1], [0.1, 0.3]]
    infos = [
        {"gt": "A B", "pred": "A B", "gt_segment": seg, "pred_segment": seg},
        {"gt": "A B", "pred": "A C", "gt_segment": seg, "pred_segment": seg},
    ]
    with open(tmp_path / "task-0.json", "w") as f:
        json.dump(infos, f)
    r = run_cli("evaluate", str(tmp_path))
    assert r.returncode == 0, r.stderr[-500:]
    assert "PER:" in r.stdout and "FER:" in r.stdout
    assert "25.00%" in r.stdout     # 1 of 2 utts with 1/2 tokens wrong


def test_cli_clean(tmp_path):
    from fscl_tpu.data.feature_store import FeatureStore
    store = FeatureStore(str(tmp_path))
    rng = np.random.default_rng(0)
    ok_q = {"spk": "s", "basename": "good"}
    bad_q = {"spk": "s", "basename": "short"}
    store.save_metadata([ok_q, bad_q])
    for q, dur_s in ((ok_q, 2.0), (bad_q, 0.3)):
        wav = rng.normal(size=int(22050 * dur_s)).astype(np.float32)
        store.wav_trim_22050.save(wav, q)
        store.mel.save(rng.normal(size=(50, 80)).astype(np.float32), q)
        store.pitch.save(rng.normal(size=50).astype(np.float32), q)
        store.energy.save(rng.normal(size=50).astype(np.float32), q)
        store.mfa_duration.save(np.array([25, 25]), q)
        store.mfa_duration_avg_pitch.save(np.zeros(2, np.float32), q)
        store.mfa_duration_avg_energy.save(np.zeros(2, np.float32), q)
        store.phoneme.save("HH AY1", q)
    store.flush()
    r = run_cli("clean", str(tmp_path))
    assert r.returncode == 0, r.stderr[-500:]
    assert "kept 1/2" in r.stdout
    with open(tmp_path / "data_info-clean.json") as f:
        kept = json.load(f)
    assert kept == [ok_q]


def test_cli_evaluate_pl_filter(tmp_path, capsys):
    """`fscl_tpu evaluate --pl_filter` sweeps the lp-matrix thresholds on a
    feature store (compare_unit.evaluate_pl_filter CLI surface)."""
    import json as _json

    import numpy as np

    from fscl_tpu.cli.__main__ import main
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.data.ssl_units import generate_ssl_units

    store = FeatureStore(str(tmp_path / "features"))
    q = {"spk": "s", "basename": "u1"}
    store.save_metadata([q])
    store.phoneme.save("a b c", q)
    store.mfa_segment.save([[0.0, 0.2], [0.2, 0.4], [0.4, 0.6]], q)
    lp = np.full((30, 5), -8.0, np.float32)
    lp[:10, 1] = 0.0
    lp[10:20, 2] = 0.0
    lp[20:, 3] = 0.0
    generate_ssl_units(store, "units", lambda _q: lp)
    store.flush()
    umap = tmp_path / "unify.json"
    umap.write_text(_json.dumps({
        "ref2unify": {"a": "u1", "b": "u2", "c": "u3"},
        "pred2unify": {str(i): f"u{i}" for i in range(5)}}))
    rc = main(["evaluate", store.root, "--pl_filter", "--unit_name",
               "units", "--unify_map", str(umap),
               "--thresholds", "0.5,0.99"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "total frames: 30" in out
    assert "Threshold 0.5" in out and "Threshold 0.99" in out
    # perfectly matching fixture: 100% activation and accuracy at 0.5
    assert "Activated: 30/30 = 100.00%" in out
    assert "Accuracy: 30/30 = 100.00%" in out
