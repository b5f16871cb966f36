"""`fscl_tpu make-units` — pseudo-unit discovery over a feature store.

Populates `ssl_units/<unit_name>` (segments, unit strings, durations,
duration-avg pitch/energy, attrs) by k-means over frame features + DPDP
segmentation — the offline stage the reference runs through its evaluation
drivers (evaluation/protonet.py DPDP decode + Parsers SSLUnitParser) before
t2u training.

Sources:
- mel (default): k-means over the stored mel frames (the reference's
  UPSTREAM="mel" path) — no model needed.
- hubert: frozen SSL forward per utterance (models/hubert.py), k-means
  over a chosen layer's hidden states.
"""
from __future__ import annotations

import os


def run(args):
    import numpy as np

    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.data.ssl_units import generate_ssl_units, kmeans_unit_labeler

    store = FeatureStore(args.features_dir)
    queries = store.load_metadata()
    if args.limit:
        queries = queries[: args.limit]

    if args.source == "mel":
        fp = 256 / 22050

        def extract(q):
            mel = np.asarray(store.mel.read_from_query(q))
            if mel.shape[0] < mel.shape[-1]:
                mel = mel
            return mel
    else:
        from fscl_tpu.data.ssl_units import batched_ssl_extractor

        fp = 0.02
        params = None
        if getattr(args, "upstream_ckpt", None):
            from fscl_tpu.models.hubert import (convert_torch_checkpoint,
                                                make_upstream)
            import torch
            from fscl_tpu.core.config import UpstreamConfig
            up_cfg = UpstreamConfig.from_name(args.source)
            params = convert_torch_checkpoint(
                torch.load(args.upstream_ckpt, map_location="cpu"),
                layer_norm_first=make_upstream(args.source,
                                               up_cfg).layer_norm_first)
        # bucketed + batched + jitted forwards, one SSL layer's hidden
        # states precomputed for every query (fixes the old per-utterance
        # path, which recompiled per wav length and reduced the hidden
        # tensor over the wrong axis)
        extract = batched_ssl_extractor(
            store, queries, source=args.source,
            layer=getattr(args, "layer", -1) or -1, params=params)

    logits_fn = kmeans_unit_labeler(
        extract, queries, n_units=args.n_units, seed=args.seed)
    n = generate_ssl_units(store, args.unit_name, logits_fn,
                           queries=queries, fp=fp)
    print(f"[make-units] {n} utterances -> ssl_units/{args.unit_name} "
          f"({args.n_units} units, source={args.source})")
