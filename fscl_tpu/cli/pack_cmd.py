"""`fscl_tpu pack` — write packed training shards for a data config's
splits (data/shards.py). The supervised datamodule auto-prefers
`<split>.shard` over per-utterance feature reads."""
from __future__ import annotations

import os


def run(args):
    from fscl_tpu.core.config import (
        ModelConfig, model_config_from_yaml, read_data_config,
    )
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.data.shards import (
        pack_fscl_split_from_store, pack_split_from_store,
    )

    dc = read_data_config(args.data_config)
    model_cfg = (model_config_from_yaml(args.model_config)
                 if args.model_config else ModelConfig())
    store = FeatureStore(dc.data_dir)
    # normalization MUST match the training datamodule, which uses the
    # GLOBAL stats (Define.ALLSTATS["global"] semantics) — per-corpus
    # stats.json is only an explicit opt-in
    from fscl_tpu.core.stats import DEFAULT_STATS, GlobalStats
    stats = DEFAULT_STATS
    if getattr(args, "stats", None):
        stats = GlobalStats.from_json(args.stats)
    for split in args.splits.split(","):
        src = dc.subset_path(split)
        if not src or not os.path.isfile(src):
            print(f"[pack] split {split}: no txt, skipped")
            continue
        if getattr(args, "fscl", False):
            out = src + ".fscl.shard"
            n_bytes = pack_fscl_split_from_store(
                src, store, dc, model_cfg, out, stats=stats,
                upstream=model_cfg.upstream.name)
        else:
            out = src + ".shard"
            n_bytes = pack_split_from_store(
                src, store, dc, model_cfg, out, stats=stats)
        print(f"[pack] {split}: {out} ({n_bytes / 1e6:.1f} MB)")
    return 0
