"""`fscl_tpu rehearse` — the WHOLE flagship experiment as one command.

Chains the reference's end-to-end few-shot cross-lingual flow
(main.py:262-360 train + --tune paths and
scripts/few_shot_task_generation.py:24-156) with per-phase wall-clock
timing:

  1. corpus        synthetic mini-corpora (2 meta-train "languages" + 1
                   held-out target), fully preprocessed through the real
                   pipeline — or user corpora via --data_config/--target
  2. meta-train    `fscl-orig` episodes (frozen SSL upstream -> phoneme
                   queries -> codebook -> FastSpeech2), one jitted step
  3. tasks         coverage-constrained K-shot task generation on the
                   target split (eval/task_generation.py)
  4. transplant    tune_init: generated table copied into the baseline's
                   MultilingualEmbedding (the embedding transplant)
  5. adapt         chunked on-chip lax.scan adaptation for --adapt_steps
  6. synthesis     bucketed no-target synthesis of the task's query texts
  7. eval          teacher-forced MCD vs ground-truth mels + frame-level
                   duration FER (predicted vs MFA segments, the in-repo
                   PER/FER harness over {gt, pred, *_segment} infos)

Writes rehearsal.json (per-phase seconds + metrics) into --exp_dir and
prints a summary table. This is the proof that the framework's pieces
compose: one invocation covers preprocess -> meta-train -> transfer ->
serving -> eval on any backend (tiny preset for CPU smoke, full preset
for the reference-scale chip run).
"""
from __future__ import annotations

import json
import os
import time


class _Phases:
    def __init__(self):
        self.times = {}
        self.order = []

    def __call__(self, name):
        phases = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.monotonic()
                print(f"[rehearse] {name}...", flush=True)
                return self

            def __exit__(self, *exc):
                dt = time.monotonic() - self.t0
                phases.times[name] = dt
                phases.order.append(name)
                print(f"[rehearse] {name} done in {dt:.1f}s", flush=True)

        return _Ctx()


def _var_kw(model_cfg) -> dict:
    v = model_cfg.variance
    return {"pitch_feature": v.pitch_feature,
            "energy_feature": v.energy_feature}


def _preset_cfg(preset: str):
    import dataclasses

    from fscl_tpu.core.config import (
        CodebookConfig, ModelConfig, SpeakerConfig, TransformerConfig,
        UpstreamConfig,
    )

    if preset == "tiny":
        return ModelConfig(
            transformer=TransformerConfig(
                encoder_layer=1, decoder_layer=1, encoder_hidden=32,
                decoder_hidden=32, conv_filter_size=64, encoder_head=2,
                decoder_head=2, encoder_dropout=0.0, decoder_dropout=0.0),
            codebook=CodebookConfig(size=8, num_heads=2, dim=32),
            upstream=UpstreamConfig(name="tiny", dim=16, n_layers=2),
            max_seq_len=128, speaker=SpeakerConfig(n_speakers=4))
    # full: reference scale — enc4/dec6 256d FastSpeech2, hubert-large
    # scanned upstream in bf16 (the measured fast configuration,
    # BASELINE.md round-2 FSCL section)
    return dataclasses.replace(
        ModelConfig(speaker=SpeakerConfig(n_speakers=8), max_seq_len=1000),
        upstream=UpstreamConfig(scan_layers=True, compute_dtype="bfloat16"))


def run(args):
    import numpy as np

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")

    from fscl_tpu.core.config import TrainConfig, OptimConfig, read_data_config
    from fscl_tpu.data.batch import collate_batch
    from fscl_tpu.data.datasets import FSCLDataset, FastSpeech2Dataset
    from fscl_tpu.data.episodic import EpisodicSampler
    from fscl_tpu.data.feature_store import (
        FeatureStore, read_queries_from_txt,
    )
    from fscl_tpu.data.scripts import make_synthetic_corpus
    from fscl_tpu.eval.metrics import fer_over_infos, mel_cepstral_distortion
    from fscl_tpu.eval.task_generation import TaskGenerator
    from fscl_tpu.frontend import LANG_ID2SYMBOLS
    from fscl_tpu.systems.baseline import BaselineSystem
    from fscl_tpu.systems.fscl import Episode, TransEmbSystem
    from fscl_tpu.systems.tune import adapt_on_chip_resident, tune_init

    if args.data_config and not args.target:
        raise SystemExit(
            "rehearse: --data_config (meta-train corpora) requires "
            "--target (held-out target-language data config)")
    if args.episodes < 1:
        raise SystemExit("rehearse: --episodes must be >= 1")
    os.makedirs(args.exp_dir, exist_ok=True)
    phases = _Phases()
    model_cfg = _preset_cfg(args.preset)
    optim = OptimConfig(lr=args.lr, warmup_step=50, anneal_steps=())
    report = {"preset": args.preset, "episodes": args.episodes,
              "adapt_steps": args.adapt_steps, "shots": args.shots}

    # ---- 1. corpus --------------------------------------------------------
    with phases("corpus"):
        if args.data_config:
            meta_cfgs = [read_data_config(p) for p in args.data_config]
            target_cfg = read_data_config(args.target)
        else:
            n = args.corpus_utts
            paths = [
                make_synthetic_corpus(
                    os.path.join(args.exp_dir, f"corpus_l{i}"),
                    name=f"meta-l{i}", n_utts=n, seed=i + 1,
                    f0_base=120.0 + 40.0 * i, lang_id=i)
                for i in range(2)]
            target_path = make_synthetic_corpus(
                os.path.join(args.exp_dir, "corpus_target"),
                name="target", n_utts=n, seed=7, f0_base=200.0, lang_id=2)
            meta_cfgs = [read_data_config(p) for p in paths]
            target_cfg = read_data_config(target_path)

    n_symbols = max(len(LANG_ID2SYMBOLS[dc.symbol_id])
                    for dc in meta_cfgs + [target_cfg])

    # ---- 2. meta-train ----------------------------------------------------
    fscl = TransEmbSystem(model_cfg, optim, n_symbols)
    with phases("meta-train"):
        # pack an FSCL shard per meta corpus: episode assembly becomes
        # native single-file reads (wavs dominate the host side)
        from fscl_tpu.data.feature_store import read_queries_from_txt
        from fscl_tpu.data.shards import (
            PackedShard, pack_fscl_split_from_store,
        )
        shards = []
        for dc in meta_cfgs:
            split = dc.subset_path("train")
            sp = split + ".fscl.shard"
            n_expected = len(read_queries_from_txt(split))
            sh = PackedShard(sp) if os.path.isfile(sp) else None
            if sh is None or len(sh) != n_expected:   # missing or stale
                pack_fscl_split_from_store(
                    split, FeatureStore(dc.data_dir), dc, model_cfg, sp,
                    upstream=model_cfg.upstream.name)
                sh = PackedShard(sp)
            shards.append(sh)
        labels = []
        for sh, dc in zip(shards, meta_cfgs):
            labels.extend([dc.lang_id] * len(sh))
        sampler = EpisodicSampler(labels, args.shots, args.queries, seed=43)
        starts = np.cumsum([0] + [len(sh) for sh in shards])

        def locate(i):
            c = int(np.searchsorted(starts, i, side="right") - 1)
            return c, int(i) - int(starts[c])

        def episode_at(idxs):
            located = [locate(int(i)) for i in idxs]
            corpora = {c for c, _ in located}
            if len(corpora) == 1:
                c = corpora.pop()
                return shards[c].collate_episode(
                    [j for _, j in located], args.shots, args.queries,
                    pitch_feature=model_cfg.variance.pitch_feature,
                    energy_feature=model_cfg.variance.energy_feature,
                    # bf16 upstream: ship support wavs as int16 PCM (4x
                    # less upload; dequantized on device, lossless at
                    # bf16 precision)
                    wav_dtype=("int16" if model_cfg.upstream.compute_dtype
                               == "bfloat16" else "float32"))
            # two corpora sharing a lang_id: the sampler's label pool
            # spans shards — assemble sample dicts per shard and use the
            # generic episode collate
            from fscl_tpu.data.episodic import collate_episode
            samples = [shards[c].sample(j) for c, j in located]
            return collate_episode(
                samples, args.shots, args.queries,
                var_kw=_var_kw(model_cfg))

        it = sampler.infinite()
        ep0 = episode_at(next(it))
        _t = time.monotonic()
        state = fscl.init_state(jax.random.PRNGKey(43), ep0)
        jax.block_until_ready(state.params)
        print(f"[rehearse]   init_state {time.monotonic() - _t:.1f}s",
              flush=True)
        _t = time.monotonic()
        step = jax.jit(fscl.train_step, donate_argnums=0)

        # background-thread episode assembly + device_put so host prep and
        # upload overlap device compute (train.trainer.prefetch_batches —
        # the same pipelining the supervised Trainer applies)
        def _episodes():
            yield ep0
            for _ in range(args.episodes - 1):
                yield episode_at(next(it))

        from fscl_tpu.train.trainer import prefetch_batches
        first = last = None
        base_key = jax.device_put(jax.random.PRNGKey(0))
        for i, ep in enumerate(prefetch_batches(
                _episodes(), size=4, place=jax.device_put)):
            state, metrics = step(state, ep, base_key)
            if i == 0:
                first = float(metrics["Total Loss"])
                print(f"[rehearse]   first episode (compile) "
                      f"{time.monotonic() - _t:.1f}s", flush=True)
                _t = time.monotonic()
        last = float(metrics["Total Loss"])
        print(f"[rehearse]   {args.episodes - 1} episodes "
              f"{time.monotonic() - _t:.1f}s", flush=True)
        report["meta_first_loss"] = first
        report["meta_last_loss"] = last

    report["episodes_per_s"] = args.episodes / phases.times["meta-train"]

    # ---- 3. task generation ----------------------------------------------
    with phases("tasks"):
        target_store = FeatureStore(target_cfg.data_dir)
        gen = TaskGenerator("target", target_store, target_cfg.lang_id,
                            target_cfg.symbol_id)
        task_root = os.path.join(args.exp_dir, "few_shot_tasks")
        gen.generate(target_cfg.subset_path("train"), task_root,
                     shots=[args.shots], n_qry=args.queries, n_tasks=1,
                     )
        task_dir = os.path.join(task_root, f"{args.shots}-shot", "task-0")
        task_cfg = read_data_config(os.path.join(task_dir, "config.yaml"))
        # task config subsets resolve relative to the task dir
        sup_queries = read_queries_from_txt(os.path.join(task_dir, "train.txt"))
        qry_queries = read_queries_from_txt(os.path.join(task_dir, "val.txt"))

    # ---- 4. transplant ----------------------------------------------------
    baseline = BaselineSystem(model_cfg, optim,
                              ((target_cfg.symbol_id, n_symbols),))
    with phases("transplant"):
        from fscl_tpu.data.episodic import collate_sup_info
        task_fscl_ds = FSCLDataset(
            os.path.join(task_dir, "train.txt"), target_store, task_cfg,
            model_cfg, upstream=model_cfg.upstream.name)
        sup_batches = [collate_sup_info(
            [task_fscl_ds[i] for i in range(
                s, min(s + 4, len(task_fscl_ds)))])
            for s in range(0, len(task_fscl_ds), 4)]
        task_ds = FastSpeech2Dataset(
            os.path.join(task_dir, "train.txt"), target_store, task_cfg,
            model_cfg)
        _, example = collate_batch(
            [task_ds[i] for i in range(len(task_ds))], **_var_kw(model_cfg))
        b_state = baseline.init_state(jax.random.PRNGKey(1), example)
        # the meta-train loop donated its state each step, which deleted
        # the buffers self.upstream_params pointed at — rebind to the live
        # frozen collection from the final state
        if state.frozen is not None and "upstream" in state.frozen:
            fscl.upstream_params = state.frozen["upstream"]
        new_params = tune_init(fscl, state.params, baseline,
                               b_state.params, sup_batches,
                               target_cfg.symbol_id)
        b_state = b_state.replace(params=new_params)

    # ---- 5. adapt ---------------------------------------------------------
    with phases("adapt"):
        # pack the task's train split: the 20k-step chunked scan is host-
        # batch-generation-bound (BASELINE.md round 2); the packed shard's
        # single-call native reads remove most of that
        from fscl_tpu.data.shards import PackedShard, pack_split_from_store
        shard_path = os.path.join(task_dir, "train.txt.shard")
        pack_split_from_store(
            os.path.join(task_dir, "train.txt"), target_store, task_cfg,
            model_cfg, shard_path)
        shard = PackedShard(shard_path)

        # device-resident adaptation: the few-shot support split is
        # uploaded ONCE and the 20k-step scan gathers each step's batch on
        # device (tune.adapt_on_chip_resident) — the streamed chunked scan
        # spent 386 of the rehearsal's 637 s re-uploading host batches
        # (BASELINE.md round 3)
        n = len(shard)
        support_all = shard.collate(np.arange(n), **_var_kw(model_cfg))[1]
        adapted, losses = adapt_on_chip_resident(
            baseline, b_state.params, b_state.batch_stats, support_all,
            args.adapt_steps, batch_size=min(args.shots, n),
            lr=args.adapt_lr)
        report["adapt_first_loss"] = float(np.asarray(losses)[0])
        report["adapt_last_loss"] = float(np.asarray(losses)[-1])
    report["adapt_steps_per_s"] = args.adapt_steps / phases.times["adapt"]

    # ---- 6. synthesis -----------------------------------------------------
    qry_ds = FastSpeech2Dataset(
        os.path.join(task_dir, "val.txt"), target_store, task_cfg, model_cfg)
    with phases("synthesis"):
        _, qry_batch = collate_batch(
            [qry_ds[i] for i in range(len(qry_ds))], **_var_kw(model_cfg))
        out = baseline.synthesize_bucketed(
            adapted, b_state.batch_stats, qry_batch.texts,
            qry_batch.src_lens, qry_batch.speaker_args, qry_batch.lang_ids)
        synth_mels = np.asarray(out.postnet_mel)
        synth_mel_lens = np.asarray(out.mel_len)
        frames = int(synth_mel_lens.sum())
        report["synth_frames"] = frames
    report["synth_frames_per_s"] = frames / phases.times["synthesis"]

    if args.write_wavs:
        # mel -> audio via Griffin-Lim (no external vocoder checkpoint
        # needed; audio_out/vocoder.py fallback). Its own phase: the
        # iterative host-side loop must not pollute the synthesis
        # throughput number above.
        with phases("vocode"):
            from fscl_tpu.audio_out.vocoder import griffin_lim
            from fscl_tpu.dsp.audio_io import save_wav
            wav_dir = os.path.join(args.exp_dir, "wavs")
            os.makedirs(wav_dir, exist_ok=True)
            for i in range(len(synth_mels)):
                n = max(int(synth_mel_lens[i]), 1)
                wav = np.asarray(griffin_lim(synth_mels[i][:n]))
                save_wav(os.path.join(wav_dir, f"{i:04d}.wav"), wav, 22050)
            report["wav_dir"] = wav_dir

    # ---- 7. eval ----------------------------------------------------------
    with phases("eval"):
        # teacher-forced MCD vs ground-truth mels (the BASELINE.md quality
        # metric): same targets, same durations. Jitted: the eager forward
        # dispatches per-op over the tunnel (~57 s full-size); one compiled
        # program is seconds.
        tf = jax.jit(
            lambda p, bs, b: baseline.forward(p, bs, b, None, False)[0]
        )(adapted, b_state.batch_stats, qry_batch)
        tf_mel = np.asarray(tf.postnet_mel)
        mcds = [mel_cepstral_distortion(
            tf_mel[i][: int(qry_batch.mel_lens[i])],
            np.asarray(qry_batch.mels[i][: int(qry_batch.mel_lens[i])]))
            for i in range(len(qry_ds))]
        report["mcd_teacher_forced"] = float(np.mean(mcds))

        # duration quality as frame-level FER/PER through the real eval
        # harness: gt = MFA segments, pred = PREDICTED-duration segments.
        # The teacher-forced forward's duration_rounded IS the ground
        # truth (d_targets path, nn/variance_adaptor.py) — the model's own
        # prediction lives in log_duration_prediction: round(exp(x) - 1).
        pred_durs = np.maximum(
            np.round(np.exp(np.asarray(tf.log_duration_prediction)) - 1.0),
            0.0)
        fp = 256 / 22050
        infos = []
        for i, q in enumerate(qry_queries[: len(qry_ds)]):
            phns = target_store.phoneme.read_from_query(q).strip()
            gt_seg = target_store.mfa_segment.read_from_query(q)
            L = int(qry_batch.src_lens[i])
            pred_dur = pred_durs[i][:L].astype(np.float64)
            t, pred_seg = 0.0, []
            for d in pred_dur:
                pred_seg.append([t, t + float(d) * fp])
                t += float(d) * fp
            # gt and pred share the phoneme string on purpose: this isolates
            # DURATION quality (frame-level FER of predicted vs MFA
            # segments); a PER over identical strings would be vacuous
            infos.append({"gt": phns, "pred": phns,
                          "gt_segment": gt_seg, "pred_segment": pred_seg})
        report["duration_fer"] = fer_over_infos(infos)

    report["phase_seconds"] = {k: phases.times[k] for k in phases.order}
    report["total_seconds"] = sum(phases.times.values())
    out_path = os.path.join(args.exp_dir, "rehearsal.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)

    print("\n=== rehearsal summary ===")
    for k in phases.order:
        print(f"  {k:<12} {phases.times[k]:8.1f}s")
    print(f"  {'TOTAL':<12} {report['total_seconds']:8.1f}s")
    print(f"  meta loss {report['meta_first_loss']:.3f} -> "
          f"{report['meta_last_loss']:.3f} "
          f"({report['episodes_per_s']:.2f} eps/s)")
    print(f"  adapt loss {report['adapt_first_loss']:.3f} -> "
          f"{report['adapt_last_loss']:.3f} "
          f"({report['adapt_steps_per_s']:.1f} steps/s)")
    print(f"  synthesis {report['synth_frames_per_s']:.0f} mel-frames/s")
    print(f"  MCD(tf) {report['mcd_teacher_forced']:.3f}  "
          f"duration-FER {report['duration_fer']:.3f}")
    print(f"  report: {out_path}")
    return 0
