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
        import jax
        import jax.numpy as jnp

        from fscl_tpu.models.hubert import make_upstream
        from fscl_tpu.ops.masking import length_mask

        fp = 0.02
        upstream = make_upstream(args.source)
        params = None

        def extract(q):
            nonlocal params
            wav = np.asarray(
                store.wav_trim_16000.read_from_query(q)).astype(np.float32)
            wavs = jnp.asarray(wav[None])
            valid = length_mask(jnp.asarray([len(wav)]), len(wav))
            if params is None:
                params = upstream.init(jax.random.PRNGKey(0), wavs, valid)
            hidden, _ = upstream.apply(params, wavs, valid)
            # hidden: (layers, B, T, D) or (B, T, D); take last layer
            h = np.asarray(hidden)
            while h.ndim > 2:
                h = h[-1] if h.shape[0] != 1 else h[0]
            return h

    logits_fn = kmeans_unit_labeler(
        extract, queries, n_units=args.n_units, seed=args.seed)
    n = generate_ssl_units(store, args.unit_name, logits_fn,
                           queries=queries, fp=fp)
    print(f"[make-units] {n} utterances -> ssl_units/{args.unit_name} "
          f"({args.n_units} units, source={args.source})")
