"""CLI contract: train then synth as a user would (subprocess).

Locks the end-user entry points: `fscl_tpu train --system baseline` on a
tiny on-disk corpus, then `fscl_tpu synth` from the produced checkpoint
(reference flow: main.py train stage -> inference; SURVEY §3).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "PYTHONPATH": REPO,
       "JAX_PLATFORMS": "cpu",
       "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}

PHONES = ["HH", "AY1", "W", "ER1", "L", "D"]


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


@pytest.fixture(scope="module")
def cli_corpus(tmp_path_factory):
    # CPU-forced in-process (conftest already pins cpu) corpus build
    from fscl_tpu.core.config import DataConfig  # noqa: F401
    from fscl_tpu.data.feature_store import (
        FeatureStore, write_queries_to_txt,
    )
    from fscl_tpu.dsp.audio_io import save_wav
    from fscl_tpu.dsp.preprocess import (
        compute_stats, prepare_initial_features, preprocess_utterance,
    )

    root = tmp_path_factory.mktemp("cli_corpus")
    store = FeatureStore(str(root / "features"))
    rng = np.random.default_rng(0)
    sr = 22050
    queries, samples = [], []
    for i in range(3):
        phones = [PHONES[int(j)] for j in rng.integers(0, len(PHONES), 5)]
        dur = 0.05 + 5 * 0.12 + 0.05
        t = np.arange(int(sr * dur)) / sr
        wav = (0.4 * np.sin(2 * np.pi * (150 + 20 * i) * t)
               + 0.05 * rng.normal(size=len(t))).astype(np.float32)
        wav_path = str(root / f"u{i}.wav")
        save_wav(wav_path, wav, sr)
        tg = str(root / f"u{i}.TextGrid")
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
    os.makedirs(root / "splits", exist_ok=True)
    write_queries_to_txt(store, queries, str(root / "splits" / "train.txt"))
    with open(root / "data.yaml", "w") as f:
        f.write(
            "name: cli-mini\nlang_id: 0\nsymbol_id: en\n"
            f"data_dir: {store.root}\n"
            "text_cleaners: [basic_cleaners]\n"
            "subsets:\n  train: splits/train.txt\n")
    with open(root / "model.yaml", "w") as f:
        f.write(
            "transformer:\n  encoder_layer: 1\n  decoder_layer: 1\n"
            "  encoder_hidden: 32\n  decoder_hidden: 32\n"
            "  conv_filter_size: 32\n  encoder_head: 2\n  decoder_head: 2\n"
            "max_seq_len: 64\n")
    return root


def run_cli(*args, timeout=420):
    return subprocess.run(
        [sys.executable, "-m", "fscl_tpu.cli", *args],
        capture_output=True, text=True, timeout=timeout, env=ENV, cwd=REPO)


@pytest.mark.slow
def test_cli_tune_scan_adapt(cli_corpus, tmp_path):
    """`fscl_tpu tune --scan_adapt`: embedding transplant from a (random
    init) FSCL system, then the whole few-shot adaptation as ONE on-chip
    lax.scan, with the per-ft-step loss curve CSV (reference --tune path,
    SURVEY §3.3 + meta saver CSVs)."""
    with open(cli_corpus / "tune_model.yaml", "w") as f:
        f.write(
            "transformer:\n  encoder_layer: 1\n  decoder_layer: 1\n"
            "  encoder_hidden: 32\n  decoder_hidden: 32\n"
            "  conv_filter_size: 32\n  encoder_head: 2\n  decoder_head: 2\n"
            "max_seq_len: 64\n"
            "upstream:\n  name: tiny\n  dim: 16\n  n_layers: 2\n"
            "codebook:\n  size: 8\n  nhead: 2\n")
    exp = str(tmp_path / "tune_exp")
    r = run_cli("tune", "--data_config", str(cli_corpus / "data.yaml"),
                "--model_config", str(cli_corpus / "tune_model.yaml"),
                "--exp_dir", exp, "--adaptation_steps", "4",
                "--scan_adapt", "--scan_lr", "1e-4")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "scan adaptation loss" in r.stdout
    csv_path = os.path.join(exp, "csv", "en", "adaptation.csv")
    assert os.path.isfile(csv_path)
    with open(csv_path) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "ft_step,Total Loss" and len(lines) == 5
    assert os.path.isdir(os.path.join(exp, "ckpt"))


@pytest.mark.slow
def test_cli_train_then_synth(cli_corpus, tmp_path):
    exp = str(tmp_path / "exp")
    r = run_cli("train", "--system", "baseline",
                "--data_config", str(cli_corpus / "data.yaml"),
                "--model_config", str(cli_corpus / "model.yaml"),
                "--exp_dir", exp, "--total_step", "1")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "done at step 1" in r.stdout
    assert "Total Loss" in r.stdout       # final-step loss line

    out_wav = str(tmp_path / "out.wav")
    r2 = run_cli("synth", "--ckpt_dir", os.path.join(exp, "ckpt"),
                 "--data_config", str(cli_corpus / "data.yaml"),
                 "--model_config", str(cli_corpus / "model.yaml"),
                 "--text", "{HH AY1 W ER1 L D}", "--output", out_wav)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert os.path.isfile(out_wav) and os.path.getsize(out_wav) > 100

    # streaming serving: chunked vocoding through a HiFiGAN checkpoint
    import pickle

    import jax
    import jax.numpy as jnp
    from fscl_tpu.models.hifigan import HiFiGANGenerator
    # from_checkpoint builds the default V1 module, so the pickle must
    # hold V1-shaped params
    gen = HiFiGANGenerator()
    voc_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 80)))
    voc_path = str(tmp_path / "voc.pkl")
    with open(voc_path, "wb") as f:
        pickle.dump(voc_vars, f)
    stream_wav = str(tmp_path / "stream.wav")
    r2s = run_cli("synth", "--ckpt_dir", os.path.join(exp, "ckpt"),
                  "--data_config", str(cli_corpus / "data.yaml"),
                  "--model_config", str(cli_corpus / "model.yaml"),
                  "--text", "{HH AY1 W ER1 L D}", "--output", stream_wav,
                  "--vocoder_ckpt", voc_path, "--stream", "--chunk", "16")
    assert r2s.returncode == 0, r2s.stderr[-2000:]
    assert "s of audio ready in" in r2s.stdout
    assert "chunks)" in r2s.stdout
    assert os.path.isfile(stream_wav) and os.path.getsize(stream_wav) > 100

    # batch serving: --text_file over bucketed synthesis, dir of NNNN.wav
    tf = str(tmp_path / "lines.txt")
    with open(tf, "w") as f:
        f.write("{HH AY1}\n\n{W ER1 L D}\n{L D HH}\n")
    out_dir = str(tmp_path / "batch_out")
    r3 = run_cli("synth", "--ckpt_dir", os.path.join(exp, "ckpt"),
                 "--data_config", str(cli_corpus / "data.yaml"),
                 "--model_config", str(cli_corpus / "model.yaml"),
                 "--text_file", tf, "--batch_size", "2",
                 "--output", out_dir)
    assert r3.returncode == 0, r3.stderr[-2000:]
    wavs = sorted(os.listdir(out_dir))
    assert wavs == ["0000.wav", "0001.wav", "0002.wav"]
    assert all(os.path.getsize(os.path.join(out_dir, w)) > 100
               for w in wavs)


@pytest.mark.slow
def test_cli_rehearse_full_chain(tmp_path):
    """One-command full-experiment rehearsal (VERDICT r2 #1): corpus ->
    meta-train -> tasks -> transplant -> adapt -> synthesis -> eval in a
    single CLI invocation; rehearsal.json carries every phase + metrics."""
    import json
    exp = tmp_path / "rehearsal"
    r = run_cli("rehearse", "--exp_dir", str(exp),
                "--episodes", "6", "--adapt_steps", "15",
                "--corpus_utts", "10", timeout=560)
    assert r.returncode == 0, r.stdout + r.stderr
    report = json.loads((exp / "rehearsal.json").read_text())
    for phase in ("corpus", "meta-train", "tasks", "transplant", "adapt",
                  "synthesis", "eval"):
        assert phase in report["phase_seconds"], report["phase_seconds"]
    assert report["meta_last_loss"] < report["meta_first_loss"]
    assert report["adapt_last_loss"] < report["adapt_first_loss"]
    assert report["synth_frames"] > 0
    assert 0.0 <= report["duration_fer"] <= 1.0
    assert "per" not in report   # vacuous over identical phoneme strings
    # the generated task dir is a real few-shot task bundle
    task_dir = exp / "few_shot_tasks" / "4-shot" / "task-0"
    assert (task_dir / "train.txt").is_file()
    assert (task_dir / "config.yaml").is_file()


@pytest.mark.slow
def test_cli_rehearse_t2u_flow(tmp_path):
    """`rehearse --flow t2u`: the text-to-unit family end-to-end — unit
    discovery -> u2s training -> fscl-t2u meta-training -> embedding
    transplant -> E2E-chain fine-tuning -> autoregressive unit generation
    -> chained u2s synthesis -> unit PER + MCD eval."""
    import json
    exp = tmp_path / "rehearsal_t2u"
    r = run_cli("rehearse", "--flow", "t2u", "--exp_dir", str(exp),
                "--episodes", "4", "--u2s_steps", "15", "--tune_steps", "6",
                "--corpus_utts", "10", timeout=560)
    assert r.returncode == 0, r.stdout + r.stderr
    report = json.loads((exp / "rehearsal.json").read_text())
    for phase in ("corpus", "units", "u2s-train", "meta-train", "tasks",
                  "transplant", "tune", "synthesis", "eval"):
        assert phase in report["phase_seconds"], report["phase_seconds"]
    assert report["u2s_last_loss"] < report["u2s_first_loss"]
    assert report["synth_frames"] > 0
    assert report["unit_per"] >= 0.0
    assert np.isfinite(report["mcd_u2s_teacher_forced"])
    assert np.isfinite(report["mcd_chained"])
    # the unit stores were written for every corpus (incl. the target)
    assert (exp / "corpus_target" / "features" / "ssl_units"
            / "units-rehearse").is_dir()


@pytest.mark.slow
def test_cli_rehearse_pr_flow(tmp_path):
    """`rehearse --flow pr`: the phoneme-recognition family end-to-end —
    episodic protonet training -> task generation -> zero-shot DPDP
    transcription -> PER/FER over the dumped task jsons."""
    import json
    exp = tmp_path / "rehearsal_pr"
    r = run_cli("rehearse", "--flow", "pr", "--exp_dir", str(exp),
                "--episodes", "5", "--corpus_utts", "10", timeout=560)
    assert r.returncode == 0, r.stdout + r.stderr
    report = json.loads((exp / "rehearsal.json").read_text())
    for phase in ("corpus", "pr-train", "tasks", "eval"):
        assert phase in report["phase_seconds"], report["phase_seconds"]
    assert report["pr_last_loss"] < report["pr_first_loss"]
    assert report["n_eval_utts"] > 0
    assert report["per"] >= 0.0
    assert 0.0 <= report["fer"] <= 1.0
    # per-task transcription jsons are the reference's task-json layout
    results = list((exp / "pr_results").glob("task-*.json"))
    assert results
    infos = json.loads(results[0].read_text())
    assert {"gt", "pred", "gt_segment", "pred_segment"} <= set(infos[0])


@pytest.mark.slow
def test_cli_train_fscl_upstream_parallel(cli_corpus, tmp_path):
    """`train --system fscl-orig --upstream_parallel pp --n_model 2`: the
    frozen upstream runs as a 2-stage pipeline over the model mesh axis
    (attach_parallel_upstream wired through the CLI)."""
    with open(cli_corpus / "pp_model.yaml", "w") as f:
        f.write(
            "transformer:\n  encoder_layer: 1\n  decoder_layer: 1\n"
            "  encoder_hidden: 32\n  decoder_hidden: 32\n"
            "  conv_filter_size: 32\n  encoder_head: 2\n  decoder_head: 2\n"
            "max_seq_len: 64\n"
            # n_layers counts the conv output: 3 -> 2 transformer layers,
            # divisible by the 2 pipeline stages
            "upstream:\n  name: tiny\n  dim: 16\n  n_layers: 3\n"
            "codebook:\n  size: 8\n  nhead: 2\n")
    exp = str(tmp_path / "exp_pp")
    env = {**ENV, "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    r = subprocess.run(
        [sys.executable, "-m", "fscl_tpu.cli", "train",
         "--system", "fscl-orig",
         "--data_config", str(cli_corpus / "data.yaml"),
         "--model_config", str(cli_corpus / "pp_model.yaml"),
         "--exp_dir", exp, "--total_step", "1",
         "--upstream_parallel", "pp", "--n_model", "2"],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[parallel] frozen upstream pp over 2 model-axis devices" \
        in r.stdout
    assert "done at step 1" in r.stdout


@pytest.mark.slow
def test_cli_train_interrupt_resume(cli_corpus, tmp_path):
    """`fscl_tpu train ... --resume` (reference main.py:91-110): a second
    invocation picks up the saved step counter and runs only the
    remaining steps to total_step."""
    exp = str(tmp_path / "exp_resume")
    r = run_cli("train", "--system", "baseline",
                "--data_config", str(cli_corpus / "data.yaml"),
                "--model_config", str(cli_corpus / "model.yaml"),
                "--exp_dir", exp, "--total_step", "2")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "done at step 2" in r.stdout
    r2 = run_cli("train", "--system", "baseline",
                 "--data_config", str(cli_corpus / "data.yaml"),
                 "--model_config", str(cli_corpus / "model.yaml"),
                 "--exp_dir", exp, "--total_step", "4", "--resume")
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "done at step 4" in r2.stdout
    assert os.path.isdir(os.path.join(exp, "ckpt", "step_00000004"))
