"""Round-3 measurement battery (VERDICT r2 #2/#3/#10 + rehearsal row).

Runs every configuration in a FRESH subprocess (the only trustworthy
protocol on the tunneled chip), gates on a transport-health probe first,
and writes one json with all results. Usage:

    python benchmarks/measure_round3.py [--skip-rehearsal] [--out PATH]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = """
import time, sys
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); f = jax.jit(lambda a: a@a)
y = f(x); y.block_until_ready()
# The tunnel's first device->host readback in a fresh process can take
# minutes (lazy transfer-channel setup); do one untimed warm-up readback
# so the timed probe measures the steady-state RTT.
t0 = time.time(); _ = float(jnp.sum(y)); warm_s = time.time() - t0
rtts = []
for _ in range(3):
    t0 = time.time(); v = float(jnp.sum(y)); rtts.append(time.time()-t0)
import json
print(json.dumps({{"rtt_ms": sorted(rtts)[1]*1000,
                   "first_readback_s": round(warm_s, 1)}}))
""".format(repo=REPO)

SYNTH = """
import sys, time, json
sys.path.insert(0, {repo!r})
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")
import jax.numpy as jnp
from fscl_tpu.core.config import ModelConfig, OptimConfig, SpeakerConfig
from fscl_tpu.data.batch import Batch
from fscl_tpu.systems.baseline import BaselineSystem
B, L, T = 8, 128, 512
cfg = ModelConfig(speaker=SpeakerConfig(n_speakers=64), max_seq_len=1000)
system = BaselineSystem(cfg, OptimConfig(), (("en", 361),))
rng = np.random.default_rng(0)
texts = rng.integers(1, 361, (B, L)).astype(np.int32)
dur = rng.integers(1, 6, (B, L)).astype(np.int32)
batch = Batch((np.arange(B) % 64).astype(np.int32), texts,
              np.full((B,), L, np.int32),
              rng.normal(size=(B, T, 80)).astype(np.float32),
              np.minimum(dur.sum(1), T).astype(np.int32),
              rng.normal(size=(B, L)).astype(np.float32),
              rng.normal(size=(B, L)).astype(np.float32),
              dur, np.zeros((B,), np.int32))
state = system.init_state(jax.random.PRNGKey(0), batch)
params, bs = state.params, state.batch_stats
@jax.jit
def synth(t, s, sp, lg):
    out = system.synthesize(params, bs, t, s, T, sp, lg)
    return out.postnet_mel, out.mel_len
args = (jnp.asarray(texts), jnp.asarray(np.full((B,), L, np.int32)),
        jnp.asarray(batch.speaker_args), jnp.asarray(batch.lang_ids))
mel, mel_len = synth(*args); jax.block_until_ready(mel)
iters = 50
t0 = time.time()
for _ in range(iters):
    mel, mel_len = synth(*args)
jax.block_until_ready(mel)
dt = time.time() - t0
frames = int(np.asarray(mel_len).sum()) * iters
print(json.dumps({{"mel_frames_per_sec": frames / dt}}))
""".format(repo=REPO)


def run_child(code_or_args, timeout=2400, as_code=True):
    cmd = ([sys.executable, "-c", code_or_args] if as_code
           else [sys.executable] + code_or_args)
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout, cwd=REPO)
        recs = []
        for l in proc.stdout.strip().splitlines():
            if l.startswith("{"):
                try:
                    recs.append(json.loads(l))
                except json.JSONDecodeError:
                    pass   # multi-line/pretty JSON handled below
        if not recs:
            # pretty-printed JSON (e.g. bench_adapt_stability's summary):
            # parse from the first '{' to the end of stdout
            text = proc.stdout
            start = text.find("{")
            if start >= 0:
                try:
                    recs.append(json.loads(text[start:]))
                except json.JSONDecodeError:
                    pass
        return {"ok": bool(recs), "records": recs,
                "wall_s": round(time.time() - t0, 1),
                "stderr_tail": proc.stderr[-400:] if not recs else ""}
    except subprocess.TimeoutExpired:
        return {"ok": False, "records": [], "wall_s": timeout,
                "stderr_tail": "TIMEOUT"}


def main():
    skip_rehearsal = "--skip-rehearsal" in sys.argv
    out_path = "/tmp/measure_r3.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    results = {"started": time.strftime("%Y-%m-%d %H:%M:%S")}

    probe = run_child(PROBE, timeout=900)
    results["tunnel_probe"] = probe
    rtt = (probe["records"][0]["rtt_ms"] if probe["ok"] else float("inf"))
    print(f"tunnel rtt: {rtt:.1f} ms", flush=True)
    if rtt > 100:
        results["aborted"] = f"tunnel degraded (rtt {rtt:.0f} ms)"
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps(results["aborted"]))
        return 1

    # VERDICT #3: synthesis x3, fresh subprocess each
    synth_runs = []
    for i in range(3):
        r = run_child(SYNTH, timeout=2400)
        synth_runs.append(r)
        print(f"synth run {i}: {r['records']}", flush=True)
    results["synthesis_x3"] = synth_runs

    # VERDICT #2: f32 vs bf16 full-size training, one process each
    for dtype in ("float32", "bfloat16"):
        r = run_child(["benchmarks/bench_train_precision.py", dtype],
                      timeout=2400, as_code=False)
        results[f"train_{dtype}"] = r
        print(f"train {dtype}: {r['records']}", flush=True)

    # VERDICT #10: adaptation stability (3 repeats x {1,4} tasks)
    r = run_child(["benchmarks/bench_adapt_stability.py", "3"],
                  timeout=5400, as_code=False)
    results["adapt_stability"] = r
    print(f"adapt stability: {r['records']}", flush=True)

    # VERDICT #1: full-preset rehearsal (reference-scale, few hundred
    # episodes + the full 20k-step adaptation budget)
    if not skip_rehearsal:
        cmd = [sys.executable, "-m", "fscl_tpu.cli", "rehearse",
               "--preset", "full", "--episodes", "300",
               "--adapt_steps", "20000", "--corpus_utts", "12",
               "--exp_dir", "/tmp/rehearsal_full"]
        t0 = time.time()
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=7200, cwd=REPO)
            rep_path = "/tmp/rehearsal_full/rehearsal.json"
            rep = (json.load(open(rep_path))
                   if os.path.exists(rep_path) else None)
            results["rehearsal_full"] = {
                "ok": proc.returncode == 0 and rep is not None,
                "wall_s": round(time.time() - t0, 1),
                "report": rep,
                "stderr_tail": proc.stderr[-400:] if proc.returncode else "",
            }
        except subprocess.TimeoutExpired:
            results["rehearsal_full"] = {"ok": False, "wall_s": 7200,
                                         "stderr_tail": "TIMEOUT"}
        print(f"rehearsal: {results['rehearsal_full'].get('ok')}",
              flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"results -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
