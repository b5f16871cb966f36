"""`fscl_tpu rehearse` — a WHOLE experiment family as one command.

Three flows (`--flow`), each chaining a reference experiment end-to-end
with per-phase wall-clock timing into rehearsal.json:

- `fscl` (default): the flagship few-shot cross-lingual TTS flow
  (main.py:262-360 train + --tune paths and
  scripts/few_shot_task_generation.py:24-156) — phases below.
- `t2u`: the text-to-unit family (lightning/systems/t2u/*): pseudo-unit
  discovery (kmeans over mel frames, `make-units` path) -> u2s
  FastSpeech2 training on unit-aligned targets -> fscl-t2u meta-training
  (episodic) -> t2u_tune_init embedding transplant -> E2E-chained
  fine-tuning through the frozen u2s -> autoregressive unit generation ->
  chained u2s synthesis -> unit PER + chained-MCD eval.
- `pr`: the phoneme-recognition family (lightning/systems/
  phoneme_recognition/*): episodic protonet training on the meta corpora
  -> coverage-constrained task generation -> zero-shot protonet
  transcription over the tasks (eval/protonet_eval.py, DPDP decoding) ->
  PER/FER over the dumped task jsons.

The fscl flow's phases:

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


def _corpora(args, phases):
    """Phase 1 shared by every flow: user corpora via --data_config/--target
    or fully-preprocessed synthetic mini-corpora (2 meta-train "languages"
    + 1 held-out target)."""
    import os

    from fscl_tpu.core.config import read_data_config
    from fscl_tpu.data.scripts import make_synthetic_corpus

    with phases("corpus"):
        if args.data_config:
            meta_cfgs = [read_data_config(p) for p in args.data_config]
            target_cfg = read_data_config(args.target)
        else:
            n = args.corpus_utts
            cache = getattr(args, "corpus_cache", None) or None
            paths = [
                make_synthetic_corpus(
                    os.path.join(args.exp_dir, f"corpus_l{i}"),
                    name=f"meta-l{i}", n_utts=n, seed=i + 1,
                    f0_base=120.0 + 40.0 * i, lang_id=i, cache_dir=cache)
                for i in range(2)]
            target_path = make_synthetic_corpus(
                os.path.join(args.exp_dir, "corpus_target"),
                name="target", n_utts=n, seed=7, f0_base=200.0, lang_id=2,
                cache_dir=cache)
            meta_cfgs = [read_data_config(p) for p in paths]
            target_cfg = read_data_config(target_path)
    return meta_cfgs, target_cfg


def _gate(report, name, ok, detail, enforced=True, bar=None):
    """Record a quality gate (VERDICT r3 #8: rehearsals must FAIL when
    adaptation stops improving synthesis quality, not just log numbers).
    `enforced=False` records the outcome without failing the run — used
    for smoke-preset runs whose handful of adaptation steps cannot
    meaningfully move a quality metric. `bar` records the numeric
    regression bar the gate enforces (VERDICT r4 weak #6: gates must
    assert margin, not just direction)."""
    rec = {"ok": bool(ok), "detail": detail, "enforced": bool(enforced)}
    if bar is not None:
        rec["bar"] = bar
    report.setdefault("gates", {})[name] = rec


def _finish(args, phases, report, lines):
    """Write rehearsal.json and print the per-flow summary table; exit
    nonzero when an enforced quality gate failed (the report is written
    FIRST so the artifact records the failure)."""
    report["phase_seconds"] = {k: phases.times[k] for k in phases.order}
    report["total_seconds"] = sum(phases.times.values())
    out_path = os.path.join(args.exp_dir, "rehearsal.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)

    print(f"\n=== rehearsal summary ({args.flow}) ===")
    for k in phases.order:
        print(f"  {k:<12} {phases.times[k]:8.1f}s")
    print(f"  {'TOTAL':<12} {report['total_seconds']:8.1f}s")
    for line in lines:
        print(f"  {line}")
    for name, g in report.get("gates", {}).items():
        status = "ok" if g["ok"] else (
            "FAIL" if g["enforced"] else "fail (advisory)")
        print(f"  gate {name}: {status} — {g['detail']}")
    print(f"  report: {out_path}")
    failed = [n for n, g in report.get("gates", {}).items()
              if g["enforced"] and not g["ok"]]
    if failed:
        print(f"  QUALITY GATES FAILED: {', '.join(failed)}")
        return 1
    return 0


def run(args):
    if args.episodes < 1:
        raise SystemExit("rehearse: --episodes must be >= 1")
    if args.data_config and not args.target:
        raise SystemExit(
            "rehearse: --data_config (meta-train corpora) requires "
            "--target (held-out target-language data config)")
    if args.flow == "t2u":
        if args.u2s_steps < 1 or args.tune_steps < 1:
            raise SystemExit(
                "rehearse: --u2s_steps and --tune_steps must be >= 1")
        return run_t2u(args)
    if args.flow == "pr":
        return run_pr(args)
    return run_fscl(args)


def _tasks(args, phases, target_cfg):
    """Coverage-constrained K-shot task generation on the target split
    (shared by every flow). Returns (target_store, task_root, task_dir,
    task_cfg)."""
    from fscl_tpu.core.config import read_data_config
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.eval.task_generation import TaskGenerator

    with phases("tasks"):
        target_store = FeatureStore(target_cfg.data_dir)
        gen = TaskGenerator("target", target_store, target_cfg.lang_id,
                            target_cfg.symbol_id)
        task_root = os.path.join(args.exp_dir, "few_shot_tasks")
        gen.generate(target_cfg.subset_path("train"), task_root,
                     shots=[args.shots], n_qry=args.queries, n_tasks=1)
        task_dir = os.path.join(task_root, f"{args.shots}-shot", "task-0")
        task_cfg = read_data_config(os.path.join(task_dir, "config.yaml"))
    return target_store, task_root, task_dir, task_cfg


def run_fscl(args):
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
    from fscl_tpu.eval.metrics import fer_over_infos, mel_cepstral_distortion
    from fscl_tpu.frontend import LANG_ID2SYMBOLS
    from fscl_tpu.systems.baseline import BaselineSystem
    from fscl_tpu.systems.fscl import Episode, TransEmbSystem
    from fscl_tpu.systems.tune import adapt_on_chip_resident, tune_init

    os.makedirs(args.exp_dir, exist_ok=True)
    phases = _Phases()
    model_cfg = _preset_cfg(args.preset)
    optim = OptimConfig(lr=args.lr, warmup_step=50, anneal_steps=())
    report = {"flow": "fscl", "preset": args.preset,
              "episodes": args.episodes,
              "adapt_steps": args.adapt_steps, "shots": args.shots}

    # ---- 1. corpus --------------------------------------------------------
    meta_cfgs, target_cfg = _corpora(args, phases)

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
                var_kw=_var_kw(model_cfg),
                wav_dtype=("int16" if model_cfg.upstream.compute_dtype
                           == "bfloat16" else "float32"))

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
    target_store, _, task_dir, task_cfg = _tasks(args, phases, target_cfg)
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

    # pre-adaptation quality reference (VERDICT r3 #8): teacher-forced MCD
    # with the TRANSPLANT-ONLY params on the held-out query split — the
    # post-adaptation MCD must beat this or the rehearsal fails
    qry_ds = FastSpeech2Dataset(
        os.path.join(task_dir, "val.txt"), target_store, task_cfg, model_cfg)
    _, qry_batch = collate_batch(
        [qry_ds[i] for i in range(len(qry_ds))], **_var_kw(model_cfg))
    tf_fn = jax.jit(
        lambda p, bs, b: baseline.forward(p, bs, b, None, False)[0])

    def _tf_mcd(params):
        tf = tf_fn(params, b_state.batch_stats, qry_batch)
        tf_mel = np.asarray(tf.postnet_mel)
        return tf, float(np.mean([mel_cepstral_distortion(
            tf_mel[i][: int(qry_batch.mel_lens[i])],
            np.asarray(qry_batch.mels[i][: int(qry_batch.mel_lens[i])]))
            for i in range(len(qry_ds))]))

    with phases("eval-pre"):
        _, mcd_pre = _tf_mcd(b_state.params)
        report["mcd_teacher_forced_transplant_only"] = mcd_pre

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
    with phases("synthesis"):
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
        # metric): same targets, same durations; the program compiled for
        # the pre-adaptation reference is reused.
        tf, mcd_post = _tf_mcd(adapted)
        tf_mel = np.asarray(tf.postnet_mel)
        report["mcd_teacher_forced"] = mcd_post
        # The ABSOLUTE value is not interpretable on a synthetic rehearsal
        # corpus (sine-mixture "speech" whose ground-truth mels are far
        # from any model manifold); the pre-vs-post DELTA under identical
        # accounting is the signal (VERDICT r3 weak #3).
        report["mcd_note"] = (
            "synthetic-corpus mels make absolute MCD uninterpretable; "
            "quality signal = transplant-only vs adapted delta")

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

    # quality gates: the rehearsal FAILS if adaptation stopped improving
    # synthesis quality (advisory below 100 steps — a smoke run's handful
    # of SGD steps cannot meaningfully move MCD)
    serious = args.adapt_steps >= 100
    _gate(report, "adapt_loss_improves",
          report["adapt_last_loss"] < report["adapt_first_loss"],
          f"{report['adapt_first_loss']:.3f} -> "
          f"{report['adapt_last_loss']:.3f}", enforced=serious)
    _gate(report, "mcd_improves_with_adaptation",
          mcd_post < mcd_pre,
          f"teacher-forced MCD transplant-only {mcd_pre:.3f} -> "
          f"adapted {mcd_post:.3f}", enforced=serious)
    # numeric regression bar from the measured round-3/4 full-preset
    # values (duration-FER 0.028; VERDICT r4 #7): direction-only gates
    # would pass a multiple-x regression
    _gate(report, "duration_fer_margin",
          report["duration_fer"] < 0.06,
          f"duration-FER {report['duration_fer']:.3f} (bar < 0.06, "
          f"measured r3 full preset 0.028)", enforced=serious,
          bar="duration_fer < 0.06")

    return _finish(args, phases, report, [
        f"meta loss {report['meta_first_loss']:.3f} -> "
        f"{report['meta_last_loss']:.3f} "
        f"({report['episodes_per_s']:.2f} eps/s)",
        f"adapt loss {report['adapt_first_loss']:.3f} -> "
        f"{report['adapt_last_loss']:.3f} "
        f"({report['adapt_steps_per_s']:.1f} steps/s)",
        f"synthesis {report['synth_frames_per_s']:.0f} mel-frames/s",
        f"MCD(tf) {report['mcd_teacher_forced']:.3f} "
        f"(transplant-only {mcd_pre:.3f})  "
        f"duration-FER {report['duration_fer']:.3f}",
    ])


def _t2u_cfg(preset: str, n_unit_symbols: int):
    """Per-preset TacoT2U config; `n_units` always covers the full unit
    symbol table (common symbols + units, frontend.register_unit_symbols)."""
    from fscl_tpu.models.tacotron2_t2u import T2UConfig

    if preset == "tiny":
        return T2UConfig(
            n_units=n_unit_symbols, d_unit=16, symbols_embedding_dim=16,
            encoder_embedding_dim=32, prenet_dim=16, attention_rnn_dim=32,
            decoder_rnn_dim=32, attention_dim=16,
            attention_location_n_filters=4,
            attention_location_kernel_size=7)
    return T2UConfig(n_units=n_unit_symbols)


def run_t2u(args):
    """The text-to-unit experiment family end-to-end (t2u systems,
    lightning/systems/t2u/*): unit discovery -> u2s -> fscl-t2u meta ->
    transplant -> E2E tune -> autoregressive units -> chained synthesis ->
    unit PER + MCD."""
    import dataclasses

    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")

    from fscl_tpu.core.config import OptimConfig, TrainConfig, read_data_config
    from fscl_tpu.data.feature_store import (
        FeatureStore, read_queries_from_txt,
    )
    from fscl_tpu.data.mix_datamodules import (
        T2U2SDataModule, T2UEpisodicDataModule, _collate_t2u,
    )
    from fscl_tpu.data.ssl_units import generate_ssl_units, kmeans_unit_labeler
    from fscl_tpu.eval.metrics import mel_cepstral_distortion, per_over_infos
    from fscl_tpu.frontend import (
        LANG_ID2SYMBOLS, n_symbols as n_sym_of, register_unit_symbols,
    )
    from fscl_tpu.systems.baseline import BaselineSystem
    from fscl_tpu.systems.t2u import TransEmbT2USystem
    from fscl_tpu.systems.t2u_tune import E2ETuneSystem, t2u_tune_init

    os.makedirs(args.exp_dir, exist_ok=True)
    phases = _Phases()
    model_cfg = _preset_cfg(args.preset)
    optim = OptimConfig(lr=args.lr, warmup_step=50, anneal_steps=())
    unit_name = "units-rehearse"
    report = {"flow": "t2u", "preset": args.preset,
              "episodes": args.episodes, "n_units": args.n_units,
              "u2s_steps": args.u2s_steps, "tune_steps": args.tune_steps,
              "shots": args.shots}

    # ---- 1. corpus ---------------------------------------------------------
    meta_cfgs, target_cfg = _corpora(args, phases)

    # ---- 2. units: kmeans pseudo-unit discovery per corpus ----------------
    # (cli/make_units_cmd.py mel-source path: kmeans over mel frames ->
    # DPDP segmentation -> ssl_units/<unit_name> store with unit-aligned
    # duration/pitch/energy; scripts/t2u unit prep in the reference)
    with phases("units"):
        register_unit_symbols(unit_name, args.n_units)
        fp = 256 / 22050
        for dc in meta_cfgs + [target_cfg]:
            store = FeatureStore(dc.data_dir)
            # every split's utterances need units (synthetic corpora carry
            # no data_info.json metadata, only split txts)
            if os.path.isfile(store.metadata_path):
                queries = store.load_metadata()
            else:
                queries = []
                for split in ("train", "val", "test"):
                    p = dc.subset_path(split)
                    if p and os.path.isfile(p):
                        queries.extend(read_queries_from_txt(p))

            def extract(q, store=store):
                return np.asarray(store.mel.read_from_query(q))

            logits_fn = kmeans_unit_labeler(
                extract, queries, n_units=args.n_units, seed=0)
            generate_ssl_units(store, unit_name, logits_fn, queries=queries,
                               fp=fp, save_matrices=False)
        meta_cfgs = [dataclasses.replace(dc, unit_name=unit_name)
                     for dc in meta_cfgs]
        target_cfg = dataclasses.replace(target_cfg, unit_name=unit_name)
    n_unit_symbols = n_sym_of(unit_name)
    t2u_cfg = _t2u_cfg(args.preset, n_unit_symbols)
    train_cfg = TrainConfig(
        optim=dataclasses.replace(optim, batch_size=4), seed=43)

    # ---- 3. u2s-train: FastSpeech2 over the unit symbol set ---------------
    with phases("u2s-train"):
        dm = T2U2SDataModule(meta_cfgs, model_cfg, train_cfg,
                             exp_dir=args.exp_dir)
        dm.setup()
        batches = dm.train_batches()
        b0 = next(batches)
        u2s = BaselineSystem(model_cfg, optim,
                             ((unit_name, n_unit_symbols),))
        u2s_state = u2s.init_state(jax.random.PRNGKey(11), b0.u2s)
        u2s_step = jax.jit(u2s.train_step, donate_argnums=0)
        key = jax.device_put(jax.random.PRNGKey(12))
        for i in range(args.u2s_steps):
            b = b0 if i == 0 else next(batches)
            u2s_state, m = u2s_step(u2s_state, b.u2s, key)
            if i == 0:
                report["u2s_first_loss"] = float(m["Total Loss"])
        report["u2s_last_loss"] = float(m["Total Loss"])

    # ---- 4. meta-train: episodic fscl-t2u ----------------------------------
    n_symbols = max(n_sym_of(dc.symbol_id)
                    for dc in meta_cfgs + [target_cfg])
    fscl = TransEmbT2USystem(model_cfg, optim, n_symbols, t2u_cfg)
    with phases("meta-train"):
        # pack an FSCL shard per meta corpus: the episodic loader serves
        # the wav-heavy support side with native single-call reads
        from fscl_tpu.data.shards import (
            PackedShard, pack_fscl_split_from_store,
        )
        for dc in meta_cfgs:
            split = dc.subset_path("train")
            sp = split + ".fscl.shard"
            n_expected = len(read_queries_from_txt(split))
            if not (os.path.isfile(sp) and
                    len(PackedShard(sp)) == n_expected):
                pack_fscl_split_from_store(
                    split, FeatureStore(dc.data_dir), dc, model_cfg, sp,
                    upstream=model_cfg.upstream.name)
        edm = T2UEpisodicDataModule(
            meta_cfgs, model_cfg, train_cfg, shots=args.shots,
            queries=args.queries, upstream=model_cfg.upstream.name)
        edm.setup()
        eps = edm.train_batches()
        ep0 = next(eps)
        state = fscl.init_state(jax.random.PRNGKey(21), ep0)
        step = jax.jit(fscl.train_step, donate_argnums=0)
        key = jax.device_put(jax.random.PRNGKey(22))
        for i in range(args.episodes):
            ep = ep0 if i == 0 else next(eps)
            state, m = step(state, ep, key)
            if i == 0:
                report["meta_first_loss"] = float(m["Total Loss"])
        report["meta_last_loss"] = float(m["Total Loss"])
    report["episodes_per_s"] = args.episodes / phases.times["meta-train"]

    # ---- 5. tasks ----------------------------------------------------------
    target_store, _, task_dir, task_cfg = _tasks(args, phases, target_cfg)
    task_cfg = dataclasses.replace(task_cfg, unit_name=unit_name)

    # ---- 6. transplant + E2E tune ------------------------------------------
    t2u_sys = E2ETuneSystem(
        model_cfg, optim, ((target_cfg.symbol_id, n_symbols),), t2u_cfg,
        u2s, u2s_state.params, u2s_state.batch_stats,
        u2s_symbol_id=unit_name)
    with phases("transplant"):
        from fscl_tpu.data.datasets import FSCLDataset
        from fscl_tpu.data.episodic import collate_sup_info
        task_fscl_ds = FSCLDataset(
            os.path.join(task_dir, "train.txt"), target_store, task_cfg,
            model_cfg, upstream=model_cfg.upstream.name)
        sup_batches = [collate_sup_info(
            [task_fscl_ds[i]
             for i in range(s, min(s + 4, len(task_fscl_ds)))])
            for s in range(0, len(task_fscl_ds), 4)]
        tune_dm = T2U2SDataModule([task_cfg], model_cfg, train_cfg,
                                  exp_dir=args.exp_dir)
        tune_dm.setup()
        tune_batches = tune_dm.train_batches()
        tb0 = next(tune_batches)
        t_state = t2u_sys.init_state(jax.random.PRNGKey(31), tb0)
        # the meta loop donated its state; rebind the live frozen upstream
        if state.frozen is not None and "upstream" in state.frozen:
            fscl.upstream_params = state.frozen["upstream"]
        new_params = t2u_tune_init(fscl, state.params, t2u_sys,
                                   t_state.params, sup_batches,
                                   target_cfg.symbol_id)
        t_state = t_state.replace(params=new_params)

    # pre-tune quality reference (VERDICT r3 #8): teacher-forced unit
    # accuracy with the TRANSPLANT-ONLY embedding on the first tune batch
    eval_fn = jax.jit(t2u_sys.eval_step)
    with phases("eval-pre"):
        m_pre = eval_fn(t_state, tb0, jax.random.PRNGKey(30))
        report["tune_unit_acc_transplant_only"] = float(m_pre["Acc"])

    with phases("tune"):
        tstep = jax.jit(t2u_sys.train_step, donate_argnums=0)
        key = jax.device_put(jax.random.PRNGKey(32))
        for i in range(args.tune_steps):
            b = tb0 if i == 0 else next(tune_batches)
            t_state, m = tstep(t_state, b, key)
            if i == 0:
                report["tune_first_loss"] = float(m["Total Loss"])
        report["tune_last_loss"] = float(m["Total Loss"])
        report["tune_unit_acc"] = float(m["Acc"])
    report["tune_steps_per_s"] = args.tune_steps / phases.times["tune"]
    # post-tune accuracy on the SAME batch the pre-tune reference used
    m_post = eval_fn(t_state, tb0, jax.random.PRNGKey(30))
    report["tune_unit_acc_post"] = float(m_post["Acc"])
    serious = args.tune_steps >= 100
    _gate(report, "tune_loss_improves",
          report["tune_last_loss"] < report["tune_first_loss"],
          f"{report['tune_first_loss']:.3f} -> "
          f"{report['tune_last_loss']:.3f}", enforced=serious)
    _gate(report, "unit_acc_improves_with_tune",
          report["tune_unit_acc_post"]
          > report["tune_unit_acc_transplant_only"],
          f"teacher-forced unit acc transplant-only "
          f"{report['tune_unit_acc_transplant_only']:.3f} -> tuned "
          f"{report['tune_unit_acc_post']:.3f}", enforced=serious)
    # numeric regression bar from the measured round-4 full preset
    # (tuned unit acc 0.92; VERDICT r4 #7)
    _gate(report, "tuned_unit_acc_margin",
          report["tune_unit_acc_post"] > 0.8,
          f"tuned unit acc {report['tune_unit_acc_post']:.3f} "
          f"(bar > 0.8, measured r4 full preset 0.92)",
          enforced=serious, bar="tune_unit_acc_post > 0.8")

    # the tune loop donated its state each step, deleting the buffers
    # u2s_state pointed at (the frozen u2s now travels in TrainState.frozen
    # as a traced argument) — rebind to the live frozen collection
    u2s_params = t_state.frozen["u2s"]
    u2s_bs = t_state.frozen.get("u2s_batch_stats", u2s_state.batch_stats)

    # ---- 7. chained synthesis: text -> units -> mel ------------------------
    from fscl_tpu.data.datasets import UnitDataset
    qry_ds = UnitDataset(os.path.join(task_dir, "val.txt"), target_store,
                         task_cfg)
    qry_samples = [qry_ds[i] for i in range(len(qry_ds))]
    with phases("synthesis"):
        t2u_b = _collate_t2u(qry_samples)
        emb = t2u_sys.embedding_model.apply(
            {"params": t_state.params["embedding"]},
            jnp.asarray(t2u_b.texts))
        def _infer(p, bs, e, sl, r):
            mv = {"params": p["model"]}
            if bs is not None:
                mv["batch_stats"] = bs["model"]
            return t2u_sys.model.apply(mv, e, sl, r, method="infer")

        _, preds, n_steps, _ = jax.jit(_infer)(
            t_state.params, t_state.batch_stats, emb,
            jnp.asarray(t2u_b.src_lens), jax.random.PRNGKey(33))
        preds = np.asarray(preds)
        n_steps = np.maximum(np.asarray(n_steps), 1)
        out = u2s.synthesize_bucketed(
            u2s_params, u2s_bs,
            preds.astype(np.int32), n_steps.astype(np.int32),
            np.zeros(len(preds), np.int32), np.zeros(len(preds), np.int32))
        chained_mels = np.asarray(out.postnet_mel)
        chained_lens = np.asarray(out.mel_len)
        report["synth_frames"] = int(chained_lens.sum())
    report["synth_frames_per_s"] = (
        report["synth_frames"] / phases.times["synthesis"])

    if args.write_wavs:
        # render the CHAINED (text -> units -> mel) outputs to audio via
        # Griffin-Lim, mirroring the fscl flow's vocode phase
        with phases("vocode"):
            from fscl_tpu.audio_out.vocoder import griffin_lim
            from fscl_tpu.dsp.audio_io import save_wav
            wav_dir = os.path.join(args.exp_dir, "wavs")
            os.makedirs(wav_dir, exist_ok=True)
            for i in range(len(chained_mels)):
                n = max(int(chained_lens[i]), 1)
                wav = np.asarray(griffin_lim(chained_mels[i][:n]))
                save_wav(os.path.join(wav_dir, f"{i:04d}.wav"), wav, 22050)
            report["wav_dir"] = wav_dir

    # ---- 8. eval: unit PER + chained / teacher-forced MCD ------------------
    with phases("eval"):
        unit_store = target_store.get_ssl_unit_store(unit_name)
        syms = LANG_ID2SYMBOLS[unit_name]
        val_queries = read_queries_from_txt(
            os.path.join(task_dir, "val.txt"))
        infos = []
        for i, q in enumerate(val_queries[: len(qry_samples)]):
            gt = unit_store.phoneme.read_from_query(q).strip()
            toks = [syms[int(u)] for u in preds[i][: int(n_steps[i])]
                    if 0 < int(u) < len(syms)]
            infos.append({"gt": gt, "pred": " ".join(toks)})
        report["unit_per"] = per_over_infos(infos)

        # teacher-forced u2s MCD on ground-truth units (u2s quality) +
        # chained MCD vs ground-truth mels (whole-chain quality)
        u2s_val_samples = [tune_dm._u2s_sample(task_cfg, s)
                           for s in qry_samples]
        from fscl_tpu.data.batch import collate_batch
        _, u2s_val = collate_batch(u2s_val_samples, **_var_kw(model_cfg))
        tf = jax.jit(
            lambda p, bs, b: u2s.forward(p, bs, b, None, False)[0]
        )(u2s_params, u2s_bs, u2s_val)
        tf_mel = np.asarray(tf.postnet_mel)
        mcds_tf, mcds_chain = [], []
        for i in range(len(qry_samples)):
            L = int(u2s_val.mel_lens[i])
            gt_mel = np.asarray(u2s_val.mels[i][:L])
            mcds_tf.append(mel_cepstral_distortion(tf_mel[i][:L], gt_mel))
            mcds_chain.append(mel_cepstral_distortion(
                chained_mels[i][: int(chained_lens[i])], gt_mel))
        report["mcd_u2s_teacher_forced"] = float(np.mean(mcds_tf))
        report["mcd_chained"] = float(np.mean(mcds_chain))

    return _finish(args, phases, report, [
        f"u2s loss {report['u2s_first_loss']:.3f} -> "
        f"{report['u2s_last_loss']:.3f}",
        f"meta loss {report['meta_first_loss']:.3f} -> "
        f"{report['meta_last_loss']:.3f} "
        f"({report['episodes_per_s']:.2f} eps/s)",
        f"tune loss {report['tune_first_loss']:.3f} -> "
        f"{report['tune_last_loss']:.3f} "
        f"(unit acc {report['tune_unit_acc']:.3f})",
        f"unit PER {report['unit_per']:.3f}",
        f"MCD(u2s tf) {report['mcd_u2s_teacher_forced']:.3f}  "
        f"MCD(chained) {report['mcd_chained']:.3f}",
    ])


def run_pr(args):
    """The phoneme-recognition family end-to-end (pr systems,
    lightning/systems/phoneme_recognition/*): episodic protonet training ->
    task generation -> zero-shot transcription -> PER/FER."""
    import numpy as np

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")

    from fscl_tpu.core.config import OptimConfig, TrainConfig
    from fscl_tpu.data.datamodules import PREpisodicDataModule
    from fscl_tpu.eval.metrics import fer_over_infos, per_over_infos
    from fscl_tpu.eval.protonet_eval import run_protonet_eval
    from fscl_tpu.frontend import n_symbols as n_sym_of
    from fscl_tpu.systems.pr import SSLProtoNetSystem

    os.makedirs(args.exp_dir, exist_ok=True)
    phases = _Phases()
    model_cfg = _preset_cfg(args.preset)
    optim = OptimConfig(lr=args.lr, warmup_step=50, anneal_steps=())
    report = {"flow": "pr", "preset": args.preset,
              "episodes": args.episodes, "shots": args.shots}

    # ---- 1. corpus ---------------------------------------------------------
    meta_cfgs, target_cfg = _corpora(args, phases)

    # ---- 2. episodic protonet training -------------------------------------
    id2symbols = tuple(sorted(
        {(dc.symbol_id, n_sym_of(dc.symbol_id))
         for dc in meta_cfgs + [target_cfg]}))
    system = SSLProtoNetSystem(model_cfg, optim, id2symbols)
    with phases("pr-train"):
        # pack an FSCL shard per corpus: PR episodes carry raw wavs on
        # BOTH sides, so episode assembly is host-prep-bound exactly like
        # FSCL meta-training; the datamodule auto-prefers the shard
        from fscl_tpu.data.feature_store import (
            FeatureStore, read_queries_from_txt,
        )
        from fscl_tpu.data.shards import (
            PackedShard, pack_fscl_split_from_store,
        )
        for dc in meta_cfgs:
            split = dc.subset_path("train")
            sp = split + ".fscl.shard"
            n_expected = len(read_queries_from_txt(split))
            if not (os.path.isfile(sp) and
                    len(PackedShard(sp)) == n_expected):
                pack_fscl_split_from_store(
                    split, FeatureStore(dc.data_dir), dc, model_cfg, sp,
                    upstream=model_cfg.upstream.name)
        train_cfg = TrainConfig(optim=optim, seed=43)
        dm = PREpisodicDataModule(meta_cfgs, model_cfg, train_cfg,
                                  shots=args.shots, queries=args.queries)
        dm.setup()
        eps = dm.train_batches()
        ep0 = next(eps)
        state = system.init_state(jax.random.PRNGKey(41), ep0)
        step = jax.jit(system.train_step, donate_argnums=0)
        key = jax.device_put(jax.random.PRNGKey(42))
        for i in range(args.episodes):
            ep = ep0 if i == 0 else next(eps)
            state, m = step(state, ep, key)
            if i == 0:
                report["pr_first_loss"] = float(m["Total Loss"])
        report["pr_last_loss"] = float(m["Total Loss"])
        report["pr_train_acc"] = float(m["Acc"])
    report["episodes_per_s"] = args.episodes / phases.times["pr-train"]

    # ---- 3. tasks -----------------------------------------------------------
    _, task_root, _, _ = _tasks(args, phases, target_cfg)

    # ---- 4. eval: zero-shot protonet transcription over the tasks ----------
    with phases("eval"):
        # the training loop donated its state; rebind the live upstream
        if state.frozen is not None and "upstream" in state.frozen:
            system.upstream_params = state.frozen["upstream"]
        out_dir = os.path.join(args.exp_dir, "pr_results")
        paths = run_protonet_eval(
            system, state.params,
            os.path.join(task_root, f"{args.shots}-shot"), out_dir)
        infos = []
        for p in paths:
            with open(p) as f:
                infos.extend(json.load(f))
        report["per"] = per_over_infos(infos)
        report["fer"] = fer_over_infos(infos)
        report["n_eval_utts"] = len(infos)

    # quality gates: protonet training must reduce the episodic loss, and
    # zero-shot transcription must beat chance frame accuracy (a protonet
    # that ignores its support set scores ~1/n_ways; FER ~0.95+)
    serious = args.episodes >= 100
    _gate(report, "pr_loss_improves",
          report["pr_last_loss"] < report["pr_first_loss"],
          f"{report['pr_first_loss']:.3f} -> {report['pr_last_loss']:.3f}",
          enforced=serious)
    _gate(report, "fer_beats_chance", report["fer"] < 0.9,
          f"zero-shot FER {report['fer']:.3f} (chance ~0.95+)",
          enforced=serious)
    # numeric regression bar from the measured round-4 full preset
    # (zero-shot FER 0.25; VERDICT r4 #7 — the chance-level 0.9 bar
    # would pass a 3.6x regression)
    _gate(report, "fer_margin", report["fer"] < 0.5,
          f"zero-shot FER {report['fer']:.3f} (bar < 0.5, measured r4 "
          f"full preset 0.25)", enforced=serious, bar="fer < 0.5")

    return _finish(args, phases, report, [
        f"pr loss {report['pr_first_loss']:.3f} -> "
        f"{report['pr_last_loss']:.3f} "
        f"(train acc {report['pr_train_acc']:.3f}, "
        f"{report['episodes_per_s']:.2f} eps/s)",
        f"zero-shot PER {report['per']:.3f}  FER {report['fer']:.3f} "
        f"over {report['n_eval_utts']} utts",
    ])
