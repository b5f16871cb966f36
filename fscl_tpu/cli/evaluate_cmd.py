"""`fscl_tpu evaluate` — PER/FER over task-output json dirs
(evaluation/fs_error_rate.py __main__ equivalent)."""
from __future__ import annotations

import glob
import json

import numpy as np


def run(args):
    from fscl_tpu.eval.metrics import fer_over_infos, per_over_infos

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
