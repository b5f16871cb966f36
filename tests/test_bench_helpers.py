"""The headline bench must time a realistic synthesis workload.

Round 3 found the synthesis metric was crediting an untrained duration
predictor's ~0 frames/phoneme (95 predicted frames per 8x128 batch while
the T=512 bucket computes 4096): bench.py:pin_realistic_durations pins the
duration head's output bias to log(5) frames/phoneme on BOTH the TPU bench
and the CPU reference harness (measure_reference_cpu.py --dur_bias). This
pins the surgery's effect so a model refactor can't silently regress the
benchmark back to near-empty buckets.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_pin_realistic_durations_fills_bucket():
    from bench import pin_realistic_durations
    from fscl_tpu.core.config import ModelConfig, OptimConfig, SpeakerConfig
    from fscl_tpu.data.batch import Batch
    from fscl_tpu.systems.baseline import BaselineSystem
    import jax.numpy as jnp

    B, L, T = 4, 64, 256
    cfg = ModelConfig(speaker=SpeakerConfig(n_speakers=8), max_seq_len=1000)
    system = BaselineSystem(cfg, OptimConfig(), (("en", 361),))
    rng = np.random.default_rng(0)
    texts = rng.integers(1, 361, (B, L)).astype(np.int32)
    dur = rng.integers(1, 6, (B, L)).astype(np.int32)
    batch = Batch((np.arange(B) % 8).astype(np.int32), texts,
                  np.full((B,), L, np.int32),
                  rng.normal(size=(B, T, 80)).astype(np.float32),
                  np.minimum(dur.sum(1), T).astype(np.int32),
                  rng.normal(size=(B, L)).astype(np.float32),
                  rng.normal(size=(B, L)).astype(np.float32),
                  dur, np.zeros((B,), np.int32))
    state = system.init_state(jax.random.PRNGKey(0), batch)

    def mel_len_sum(params):
        out = system.synthesize(
            params, state.batch_stats, jnp.asarray(texts),
            jnp.asarray(np.full((B,), L, np.int32)), T,
            jnp.asarray(batch.speaker_args), jnp.asarray(batch.lang_ids))
        return int(np.asarray(out.mel_len).sum())

    before = mel_len_sum(state.params)
    after = mel_len_sum(pin_realistic_durations(state.params))
    # untrained: near-empty buckets; pinned: a real workload. The exact
    # fill is init-noise sensitive (exp of a random head), so assert the
    # qualitative contract: >=40% utilization and a large jump.
    assert before < 0.25 * B * T, before
    assert after >= 0.4 * B * T, after
    assert after >= 4 * max(before, 1), (before, after)


def test_all_metrics_matches_emit_calls():
    """VERDICT r4 weak #2 regression guard: the wedged path's error rows
    must cover exactly the metrics main() emits — a metric added to one
    side but not the other silently vanishes from (or pollutes) BENCH
    records."""
    import re

    import bench

    src = open(bench.__file__).read()
    main_src = src[src.index("def main("):]
    emitted = set(re.findall(
        r'_emit_subprocess_metric\(\s*\n?\s*"([a-z0-9_]+)"', main_src))
    emitted |= {"fastspeech2_synthesis_mel_frames_per_sec_per_chip"}
    assert emitted == {m for m, _ in bench.ALL_METRICS}, (
        emitted.symmetric_difference({m for m, _ in bench.ALL_METRICS}))


def test_probe_transport_retries_then_succeeds(monkeypatch):
    """The probe must survive cold attempts: warm-up readback untimed,
    retry with backoff, and report per-attempt diagnostics (VERDICT r4
    weak #1 — a 5 s margin over the documented ~175 s cold start nulled
    BENCH_r04)."""
    import subprocess
    import types

    import bench

    calls = {"n": 0}

    def fake_run(cmd, capture_output, text, timeout):
        calls["n"] += 1
        if calls["n"] == 1:
            raise subprocess.TimeoutExpired(cmd, timeout)
        return types.SimpleNamespace(
            stdout="COMPILE 12.0\nWARMUP 170.0\nRTT 0.004\n", stderr="")

    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(subprocess, "run", fake_run)
    rtt, diag = bench._probe_transport(budget=420, attempts=3)
    assert rtt == 0.004
    assert calls["n"] == 2
    assert diag["attempts"][0]["outcome"] == "timeout"
    a1 = diag["attempts"][1]
    assert a1["outcome"] == "ok" and a1["warmup_readback_s"] == 170.0


def test_probe_transport_all_fail_reports_diagnostics(monkeypatch):
    import subprocess

    import bench

    def fake_run(cmd, capture_output, text, timeout):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(subprocess, "run", fake_run)
    rtt, diag = bench._probe_transport(budget=1, attempts=3)
    assert rtt is None
    assert [a["outcome"] for a in diag["attempts"]] == ["timeout"] * 3


def test_emit_all_error_rows_covers_every_metric(capsys):
    import json

    import bench

    bench._emit_all_error_rows("down", {"attempts": []})
    rows = [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines()]
    assert {r["metric"] for r in rows} == {m for m, _ in bench.ALL_METRICS}
    assert all(r["value"] is None and r["error"] == "down"
               and "transport_probe" in r for r in rows)
