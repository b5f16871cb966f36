"""`fscl_tpu preprocess` — staged corpus pipeline (preprocess.py:23-103)."""
from __future__ import annotations

import os


def run(args):
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.data.parsers import parse_corpus

    pre_cfg = None
    if getattr(args, "preprocess_config", None):
        from fscl_tpu.core.config import read_preprocess_config
        pre_cfg = read_preprocess_config(args.preprocess_config)
        args.corpus_dir = args.corpus_dir or pre_cfg.corpus_path
        args.output_dir = args.output_dir or pre_cfg.preprocessed_path
        args.parser = args.parser or pre_cfg.parser
    assert args.corpus_dir and args.output_dir, (
        "corpus_dir/output_dir required (positionally or via "
        "--preprocess_config)")
    args.parser = args.parser or "LJSpeech"

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
        from fscl_tpu.dsp.preprocess import (
            compute_stats, preprocess_utterances_batched)
        queries = store.load_metadata()
        if limit:
            queries = queries[:limit]
        items = []
        for q in queries:
            tg = os.path.join(args.textgrid_dir, q["spk"],
                              q["basename"] + ".TextGrid")
            if not os.path.isfile(tg):
                tg = os.path.join(args.textgrid_dir, q["basename"] + ".TextGrid")
            if not os.path.isfile(tg):
                print(f"[preprocess] no TextGrid for {q}")
                continue
            items.append((q, tg))
        kw = {}
        if pre_cfg is not None:
            kw = dict(audio=pre_cfg.audio, pitch_method=pre_cfg.pitch_method)
        if getattr(args, "pitch_method", None):   # CLI overrides the YAML
            kw["pitch_method"] = args.pitch_method
        # grouped device dispatch: one batched mel/STFT call per
        # wav-length bucket instead of two calls per utterance
        stats_samples, ok_queries = preprocess_utterances_batched(
            store, items, **kw)
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
        vs = (pre_cfg.val_size if pre_cfg is not None and pre_cfg.val_size
              else 400)
        if len(speakers) > 1:
            split_multispeaker_dataset(store, queries, out)
        else:
            split_monospeaker_dataset(
                store, queries, out,
                val_size=min(vs, max(1, len(queries) // 10)),
                test_size=min(vs, max(1, len(queries) // 10)))
        print(f"[create_dataset] splits under {out}")
