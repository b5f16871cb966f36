"""`fscl_tpu preprocess` — staged corpus pipeline (preprocess.py:23-103)."""
from __future__ import annotations

import os


def run(args):
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.data.parsers import parse_corpus

    store = FeatureStore(args.output_dir)
    limit = 128 if args.debug else None

    if args.parse_raw:
        queries = parse_corpus(args.parser, args.corpus_dir, store,
                               n_workers=args.n_workers, limit=limit)
        print(f"[parse_raw] {len(queries)} utterances")

    if getattr(args, "prepare_mfa", None):
        from fscl_tpu.data.scripts import mfa_align_command, prepare_mfa_corpus
        n = prepare_mfa_corpus(store, args.prepare_mfa)
        print(f"[prepare_mfa] staged {n} wav+txt pairs in {args.prepare_mfa}")
        print("[prepare_mfa] next: " + mfa_align_command(
            args.prepare_mfa, "<lexicon.txt>", "<acoustic_model.zip>",
            os.path.join(args.output_dir, "TextGrid")))

    if args.preprocess:
        assert args.textgrid_dir, "--preprocess requires --textgrid_dir"
        from fscl_tpu.dsp.preprocess import compute_stats, preprocess_utterance
        queries = store.load_metadata()
        if limit:
            queries = queries[:limit]
        stats_samples, ok_queries = [], []
        for q in queries:
            tg = os.path.join(args.textgrid_dir, q["spk"],
                              q["basename"] + ".TextGrid")
            if not os.path.isfile(tg):
                tg = os.path.join(args.textgrid_dir, q["basename"] + ".TextGrid")
            if not os.path.isfile(tg):
                print(f"[preprocess] no TextGrid for {q}")
                continue
            try:
                s = preprocess_utterance(store, q, tg)
            except Exception as e:  # ignore_errors=True semantics
                print(f"[preprocess] failed {q}: {e}")
                continue
            if s is not None:
                stats_samples.append(s)
                ok_queries.append(q)
        store.flush()
        stats = compute_stats(stats_samples, store)
        print(f"[preprocess] {len(ok_queries)}/{len(queries)} ok, "
              f"stats: {stats}")

    if args.create_dataset:
        from fscl_tpu.dsp.preprocess import (
            split_monospeaker_dataset, split_multispeaker_dataset)
        queries = [q for q in store.load_metadata()
                   if store.mfa_duration.exists(q)]
        speakers = store.load_speakers()
        out = os.path.join(args.output_dir, "splits")
        if len(speakers) > 1:
            split_multispeaker_dataset(store, queries, out)
        else:
            split_monospeaker_dataset(
                store, queries, out,
                val_size=min(400, max(1, len(queries) // 10)),
                test_size=min(400, max(1, len(queries) // 10)))
        print(f"[create_dataset] splits under {out}")
