"""`fscl_tpu evaluate` — PER/FER over task-output json dirs
(evaluation/fs_error_rate.py __main__ equivalent); `--pl_filter` runs the
pseudo-label confidence threshold sweep over a feature store's
ssl_units/<name> lp matrices (compare_unit.py evaluate_pl_filter)."""
from __future__ import annotations

import glob
import json

import numpy as np


def run(args):
    from fscl_tpu.eval.metrics import fer_over_infos, per_over_infos

    if getattr(args, "pl_filter", False):
        from fscl_tpu.data.feature_store import FeatureStore
        from fscl_tpu.eval.drivers import evaluate_pl_filter

        assert args.unit_name, "--pl_filter needs --unit_name"
        ref2unify = pred2unify = None
        if args.unify_map:
            with open(args.unify_map, encoding="utf-8") as f:
                maps = json.load(f)
            ref2unify = maps.get("ref2unify")
            pred2unify = maps.get("pred2unify")
        result = evaluate_pl_filter(
            FeatureStore(args.dir), args.unit_name, ref2unify, pred2unify,
            thresholds=[float(t) for t in args.thresholds.split(",")],
            matrix=args.matrix)
        print(f"[{args.unit_name}] total frames: {result['n_frames']}, "
              f"skipped: {result['n_skipped']}")
        for row in result["sweep"]:
            print(f"Threshold {row['threshold']}:")
            print(f"Activated: {row['activated']}/{result['n_frames']} = "
                  f"{row['activated_rate'] * 100:.2f}%")
            print(f"Accuracy: {row['matched']}/{result['n_frames']} = "
                  f"{row['accuracy'] * 100:.2f}%")
            print("")
        return 0

    files = sorted(glob.glob(f"{args.dir}/*.json"))
    assert files, f"no task jsons under {args.dir}"
    pers, fers = [], []
    for path in files:
        with open(path, encoding="utf-8") as f:
            infos = json.load(f)
        if args.metric in ("per", "both"):
            pers.append(per_over_infos(infos))
        if args.metric in ("fer", "both"):
            fers.append(fer_over_infos(infos))
    if pers:
        print(f"[{args.dir}] PER: {np.mean(pers) * 100:.2f}%, "
              f"std {np.std(pers) * 100:.2f}%.")
    if fers:
        print(f"[{args.dir}] FER: {np.mean(fers) * 100:.2f}%, "
              f"std {np.std(fers) * 100:.2f}%.")
