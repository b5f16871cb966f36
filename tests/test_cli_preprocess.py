"""CLI preprocess end-to-end over a fake LJSpeech-layout corpus:
parse_raw -> preprocess (TextGrids) -> create_dataset."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"}

TG = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.0
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 3
        intervals [1]:
            xmin = 0
            xmax = 0.1
            text = ""
        intervals [2]:
            xmin = 0.1
            xmax = 0.5
            text = "HH"
        intervals [3]:
            xmin = 0.5
            xmax = 1.0
            text = "AY1"
"""


@pytest.mark.slow
def test_cli_preprocess_ljspeech_layout(tmp_path):
    from fscl_tpu.dsp.audio_io import save_wav

    corpus = tmp_path / "LJSpeech"
    (corpus / "wavs").mkdir(parents=True)
    sr = 22050
    rng = np.random.default_rng(0)
    lines = []
    tg_dir = tmp_path / "tg" / "LJSpeech"
    tg_dir.mkdir(parents=True)
    for i in range(3):
        name = f"LJ001-{i:04d}"
        t = np.arange(int(sr * 1.2)) / sr
        wav = (0.4 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
        save_wav(str(corpus / "wavs" / f"{name}.wav"), wav, sr)
        lines.append(f"{name}|Some text {i}|Some text {i}")
        with open(tg_dir / f"{name}.TextGrid", "w") as f:
            f.write(TG)
    (corpus / "metadata.csv").write_text("\n".join(lines) + "\n")

    out = tmp_path / "features"
    r = subprocess.run(
        [sys.executable, "-m", "fscl_tpu.cli", "preprocess",
         str(corpus), str(out), "--parser", "LJSpeech",
         "--parse_raw", "--preprocess",
         "--textgrid_dir", str(tmp_path / "tg"),
         "--create_dataset", "--n_workers", "1"],
        capture_output=True, text=True, timeout=600, env=ENV, cwd=REPO)
    assert r.returncode == 0, r.stderr[-800:]
    assert "[parse_raw] 3 utterances" in r.stdout
    assert "3/3 ok" in r.stdout
    assert os.path.isfile(out / "stats.json")
    assert os.path.isfile(out / "splits" / "train.txt")
    # feature store readable by the dataset layer
    from fscl_tpu.core.config import DataConfig, ModelConfig
    from fscl_tpu.data.datasets import FastSpeech2Dataset
    from fscl_tpu.data.feature_store import FeatureStore
    store = FeatureStore(str(out))
    ds = FastSpeech2Dataset(
        str(out / "splits" / "train.txt"), store,
        DataConfig(name="lj", lang_id=0, symbol_id="en",
                   text_cleaners=("basic_cleaners",)),
        ModelConfig())
    sample = ds[0]
    assert sample["mel"].shape[1] == 80
    assert len(sample["phonemes"]) == 2


@pytest.mark.slow
def test_cli_prepare_mfa_stage(tmp_path):
    """--prepare_mfa stages per-speaker wav+txt pairs for the external
    `mfa align` CLI and prints the exact next command
    (Parsers/css10.py:82-111 prepare_mfa + mfa)."""
    from fscl_tpu.dsp.audio_io import save_wav

    corpus = tmp_path / "LJSpeech"
    (corpus / "wavs").mkdir(parents=True)
    sr = 22050
    lines = []
    for i in range(2):
        name = f"LJ002-{i:04d}"
        t = np.arange(int(sr * 0.8)) / sr
        wav = (0.3 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)
        save_wav(str(corpus / "wavs" / f"{name}.wav"), wav, sr)
        lines.append(f"{name}|Raw {i}|Normalized text {i}")
    (corpus / "metadata.csv").write_text("\n".join(lines) + "\n")

    out = tmp_path / "features"
    mfa_dir = tmp_path / "mfa_data"
    r = subprocess.run(
        [sys.executable, "-m", "fscl_tpu.cli", "preprocess",
         str(corpus), str(out), "--parser", "LJSpeech",
         "--parse_raw", "--prepare_mfa", str(mfa_dir), "--n_workers", "1"],
        capture_output=True, text=True, timeout=600, env=ENV, cwd=REPO)
    assert r.returncode == 0, r.stderr[-800:]
    assert "staged 2 wav+txt pairs" in r.stdout
    assert "mfa align" in r.stdout
    wavs = list((mfa_dir / "LJSpeech").glob("*.wav"))
    txts = list((mfa_dir / "LJSpeech").glob("*.txt"))
    assert len(wavs) == 2 and len(txts) == 2
    text = (mfa_dir / "LJSpeech" / "LJ002-0000.txt").read_text()
    assert "Normalized text 0" in text


@pytest.mark.slow
def test_cli_make_units_then_unit_dataset(tmp_path):
    """make-units populates ssl_units/<name> (+attrs) usable by t2u
    datasets (reference: DPDP unit discovery -> SSLUnitParser features)."""
    from fscl_tpu.dsp.audio_io import save_wav

    corpus = tmp_path / "LJSpeech"
    (corpus / "wavs").mkdir(parents=True)
    sr = 22050
    lines = []
    tg_dir = tmp_path / "tg" / "LJSpeech"
    tg_dir.mkdir(parents=True)
    for i in range(3):
        name = f"LJ003-{i:04d}"
        t = np.arange(int(sr * 1.2)) / sr
        wav = (0.4 * np.sin(2 * np.pi * (170 + 30 * i) * t)).astype(np.float32)
        save_wav(str(corpus / "wavs" / f"{name}.wav"), wav, sr)
        lines.append(f"{name}|Text {i}|Text {i}")
        with open(tg_dir / f"{name}.TextGrid", "w") as f:
            f.write(TG)
    (corpus / "metadata.csv").write_text("\n".join(lines) + "\n")

    out = tmp_path / "features"
    r = subprocess.run(
        [sys.executable, "-m", "fscl_tpu.cli", "preprocess",
         str(corpus), str(out), "--parser", "LJSpeech",
         "--parse_raw", "--preprocess",
         "--textgrid_dir", str(tmp_path / "tg"),
         "--create_dataset", "--n_workers", "1"],
        capture_output=True, text=True, timeout=600, env=ENV, cwd=REPO)
    assert r.returncode == 0, r.stderr[-800:]

    r2 = subprocess.run(
        [sys.executable, "-m", "fscl_tpu.cli", "make-units", str(out),
         "--unit_name", "test-units", "--n_units", "4"],
        capture_output=True, text=True, timeout=600, env=ENV, cwd=REPO)
    assert r2.returncode == 0, r2.stderr[-800:]
    assert "3 utterances -> ssl_units/test-units" in r2.stdout

    from fscl_tpu.data.feature_store import FeatureStore
    us = FeatureStore(str(out)).get_ssl_unit_store("test-units")
    assert us.load_attrs()["n_units"] == 4
    q = {"spk": "LJSpeech", "basename": "LJ003-0000"}
    units = us.phoneme.read_from_query(q)
    dur = us.duration.read_from_query(q)
    assert len(units.split()) == len(dur)
    assert all(0 <= int(u) < 4 for u in units.split())
