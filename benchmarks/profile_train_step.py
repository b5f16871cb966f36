"""Profile the full-size bf16 train step on the TPU: top HLO ops by self-time.

VERDICT r3 #4 deliverable. Captures a jax.profiler trace of 10 full-size
train steps (same shapes as benchmarks/bench_train_precision.py), then
parses the Perfetto JSON the TPU runtime writes (vm.trace.json.gz) into a
per-HLO-category table with achieved TFLOP/s. The tensorboard_plugin_profile
converters are broken in this image (protobuf descriptor mismatch), so the
trace JSON is parsed directly — device ops carry `hlo_category`,
`model_flops`, `tf_op` and `source` args.

Usage:  python benchmarks/profile_train_step.py [trace_dir]
With an existing trace_dir it only re-parses (no chip needed).
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_STEPS = 10


def capture(log_dir: str) -> None:
    import dataclasses
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")
    from fscl_tpu.core.config import ModelConfig, OptimConfig, SpeakerConfig
    from fscl_tpu.data.batch import Batch
    from fscl_tpu.systems.baseline import BaselineSystem

    B, L, T = 16, 128, 512
    cfg = dataclasses.replace(
        ModelConfig(speaker=SpeakerConfig(n_speakers=64), max_seq_len=1000),
        compute_dtype="bfloat16")
    system = BaselineSystem(cfg, OptimConfig(batch_size=B), (("en", 361),))
    rng = np.random.default_rng(0)
    dur = rng.integers(1, 5, (B, L)).astype(np.int32)
    batch = Batch(
        (np.arange(B) % 64).astype(np.int32),
        rng.integers(1, 361, (B, L)).astype(np.int32),
        np.full((B,), L, np.int32),
        rng.normal(size=(B, T, 80)).astype(np.float32),
        np.minimum(dur.sum(1), T).astype(np.int32),
        rng.normal(size=(B, L)).astype(np.float32),
        rng.normal(size=(B, L)).astype(np.float32),
        dur, np.zeros((B,), np.int32))
    state = system.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(system.train_step, donate_argnums=(0,))
    batch = jax.device_put(batch)
    key = jax.device_put(jax.random.PRNGKey(1))
    state, m = step(state, batch, key)          # compile outside the trace
    jax.block_until_ready(m["Total Loss"])
    print("compiled; tracing...", flush=True)
    jax.profiler.start_trace(log_dir)
    for _ in range(N_STEPS):
        state, m = step(state, batch, key)
    jax.block_until_ready(m["Total Loss"])
    jax.profiler.stop_trace()
    print("trace done", flush=True)


def report(log_dir: str) -> dict:
    paths = sorted(glob.glob(log_dir + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        raise SystemExit(f"no trace json under {log_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    dev_pids = {e["pid"] for e in tr["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")}
    cat_us = collections.defaultdict(float)
    cat_flops = collections.defaultdict(float)
    op_us = collections.defaultdict(float)
    op_args: dict = {}
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        a = e.get("args", {})
        cat = a.get("hlo_category")
        if cat is None:          # jit_train_step umbrella / step markers
            continue
        cat_us[cat] += e["dur"]
        if a.get("model_flops"):
            cat_flops[cat] += float(a["model_flops"])
        op_us[e["name"]] += e["dur"]
        op_args.setdefault(e["name"], a)

    total_us = sum(cat_us.values())
    print(f"\ndevice self-time {total_us / N_STEPS / 1e3:.2f} ms/step, "
          f"{sum(cat_flops.values()) / N_STEPS / (total_us / N_STEPS * 1e-6) / 1e12:.1f}"
          " TFLOP/s achieved")
    print(f"{'category':28s} {'us/step':>9s} {'share':>6s} {'TFLOP/s':>8s}")
    table = []
    for c, us in sorted(cat_us.items(), key=lambda kv: -kv[1]):
        tf = (cat_flops[c] / N_STEPS) / (us / N_STEPS * 1e-6) / 1e12 if us else 0.0
        print(f"{c:28s} {us / N_STEPS:9.1f} {us / total_us * 100:5.1f}% {tf:8.1f}")
        table.append({"category": c, "us_per_step": round(us / N_STEPS, 1),
                      "share": round(us / total_us, 4),
                      "tflops": round(tf, 1)})
    print("\ntop-10 ops by self-time:")
    top = []
    for name, us in sorted(op_us.items(), key=lambda kv: -kv[1])[:10]:
        a = op_args[name]
        tf_op = str(a.get("tf_op", ""))[-70:]
        print(f"  {us / N_STEPS:8.1f} us/step  {name[:28]:28s} "
              f"{a.get('hlo_category', ''):20s} {tf_op}")
        top.append({"op": name, "us_per_step": round(us / N_STEPS, 1),
                    "category": a.get("hlo_category", ""), "tf_op": tf_op})
    # The loop-fusion bucket op-by-op (VERDICT r4 weak #3: categories are
    # not an argument — each remaining elementwise op must be either cut
    # or shown at its bandwidth bound). Emits every arg the runtime
    # attaches (bytes accessed when present) so BASELINE.md can carry a
    # per-op bytes/bandwidth table.
    print("\ntop-15 loop-fusion ops by self-time:")
    lf = []
    lf_ops = [(n, us) for n, us in op_us.items()
              if op_args[n].get("hlo_category") == "loop fusion"]
    for name, us in sorted(lf_ops, key=lambda kv: -kv[1])[:15]:
        a = op_args[name]
        rec = {"op": name, "us_per_step": round(us / N_STEPS, 1),
               "tf_op": str(a.get("tf_op", ""))[-90:]}
        for k in ("bytes_accessed", "memory_bandwidth",
                  "bytes accessed", "source"):
            if a.get(k):
                rec[k.replace(" ", "_")] = a[k]
        print(f"  {rec['us_per_step']:8.1f} us/step  {name[:28]:28s} "
              f"{rec['tf_op'][-60:]}")
        lf.append(rec)
    lf_total = sum(us for _, us in lf_ops)
    lf_n = len(lf_ops)
    print(f"loop-fusion total: {lf_total / N_STEPS:.1f} us/step over "
          f"{lf_n} distinct fusions; top-15 cover "
          f"{sum(r['us_per_step'] for r in lf)} us/step")

    while_us = sum(us for n, us in op_us.items() if "while" in n)
    print(f"\nserial while-loop family: {while_us / N_STEPS:.1f} us/step")
    return {"ms_per_step_device": round(total_us / N_STEPS / 1e3, 3),
            "categories": table, "top_ops": top,
            "top_loop_fusion": lf,
            "loop_fusion_total_us_per_step": round(lf_total / N_STEPS, 1),
            "loop_fusion_n_ops": lf_n,
            "while_us_per_step": round(while_us / N_STEPS, 1)}


def main():
    log_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_trace_r5"
    out_path = (sys.argv[2] if len(sys.argv) > 2 else
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "profile_train_r5.json"))
    if not glob.glob(log_dir + "/**/*.trace.json.gz", recursive=True):
        capture(log_dir)
    out = report(log_dir)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
