"""`fscl_tpu synth` — text -> mel -> wav (BaselineSystem.inference +
vocoder path, language/FastSpeech2.py:112-141 / utils/log.py:15-53)."""
from __future__ import annotations

import os


def run(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fscl_tpu.core.checkpoint import CheckpointManager
    from fscl_tpu.core.config import (
        ModelConfig, OptimConfig, model_config_from_yaml, read_data_config,
    )
    from fscl_tpu.dsp.audio_io import save_wav
    from fscl_tpu.frontend import LANG_ID2SYMBOLS, text_to_sequence
    from fscl_tpu.systems.baseline import BaselineSystem

    dc = read_data_config(args.data_config)
    model_cfg = (model_config_from_yaml(args.model_config)
                 if getattr(args, "model_config", None) else ModelConfig())
    id2symbols = ((dc.symbol_id, len(LANG_ID2SYMBOLS[dc.symbol_id])),)
    system = BaselineSystem(model_cfg, OptimConfig(), id2symbols)

    if getattr(args, "text_file", None):
        return _run_batch(args, dc, model_cfg, system)
    assert args.text, "pass --text or --text_file"

    sr = model_cfg.audio.sampling_rate   # 22050 default (AudioConfig)
    seq = text_to_sequence(args.text, dc.text_cleaners, dc.symbol_id)
    L = len(seq)
    texts = jnp.asarray(np.asarray(seq, np.int32)[None])
    src_lens = jnp.asarray([L])
    T = min(model_cfg.max_seq_len, max(64, L * 12))

    # speaker identity: table id, or d-vector from reference audio
    # (speaker_encoder.py:115-136 — the dvec path embeds spk_ref_mel_slices)
    if model_cfg.speaker.uses_dvec:
        assert getattr(args, "ref_wav", None), (
            "this model uses a d-vector speaker encoder: pass "
            "--ref_wav <audio of the target speaker>")
        from fscl_tpu.data.batch import DvecRefs
        from fscl_tpu.dsp.audio_io import load_wav
        from fscl_tpu.dsp.preprocess import dvec_mel_slices
        slices = dvec_mel_slices(load_wav(args.ref_wav, sr=16000))
        n_ref = model_cfg.speaker.n_ref_slices
        sl = np.zeros((1, n_ref) + slices.shape[1:], np.float32)
        mask = np.zeros((1, n_ref), np.float32)
        k = min(len(slices), n_ref)
        sl[0, :k] = slices[:k]
        mask[0, :k] = 1.0
        speaker_args = DvecRefs(jnp.asarray(sl), jnp.asarray(mask))
    else:
        speaker_args = jnp.asarray([args.speaker])

    # init then restore
    from fscl_tpu.data.batch import Batch
    dummy = Batch(
        speaker_args=speaker_args, texts=np.asarray(seq, np.int32)[None],
        src_lens=np.asarray([L], np.int32),
        mels=np.zeros((1, T, 80), np.float32), mel_lens=np.asarray([T], np.int32),
        pitches=np.zeros((1, L), np.float32), energies=np.zeros((1, L), np.float32),
        durations=np.ones((1, L), np.int32), lang_ids=np.asarray([dc.lang_id], np.int32))
    state = system.init_state(jax.random.PRNGKey(0), dummy)
    mgr = CheckpointManager(args.ckpt_dir)
    state = mgr.restore_into(state)

    out = system.synthesize(
        state.params, state.batch_stats, texts, src_lens, T,
        speaker_args, jnp.asarray([dc.lang_id]),
        symbol_id=dc.symbol_id)
    n = int(out.mel_len[0])

    if getattr(args, "stream", False):
        assert args.vocoder_ckpt, "--stream needs --vocoder_ckpt"
        assert model_cfg.vocoder.model.lower() != "melgan", (
            "--stream supports the HiFiGAN vocoder (the halo derivation "
            "reads HiFiGAN config fields)")
        import time

        from fscl_tpu.audio_out.streaming import chunked_vocode, generator_hop
        from fscl_tpu.audio_out.vocoder import Vocoder
        voc = Vocoder.from_checkpoint(args.vocoder_ckpt,
                                      kind=model_cfg.vocoder.model)
        hop = generator_hop(voc.model) or 256
        chunk = max(1, args.chunk)
        # vocode only the chunks covering the predicted mel_len, not the
        # whole static T bucket
        n_cover = min(T, -(-n // chunk) * chunk)
        t0 = time.time()
        pieces = []
        for _, chunk_wav in chunked_vocode(voc.model, voc.variables,
                                           out.postnet_mel[:, :n_cover],
                                           chunk=chunk):
            if not pieces:
                print(f"[synth] first {chunk_wav.shape[1] / sr:.2f} s of "
                      f"audio ready in {(time.time() - t0) * 1e3:.1f} ms")
            pieces.append(chunk_wav[0])
        wav = np.concatenate(pieces)[: n * hop]
        save_wav(args.output, wav, sr)
        print(f"[synth] {n} mel frames ({len(pieces)} chunks) -> "
              f"{args.output}")
        return

    mel = np.asarray(out.postnet_mel)[0, :n]
    if args.vocoder_ckpt:
        from fscl_tpu.audio_out.vocoder import Vocoder
        # vocoder.model from the model YAML picks the architecture
        # ("HifiGAN" | "MelGAN"; reference utils/tool.py get_vocoder)
        voc = Vocoder.from_checkpoint(args.vocoder_ckpt,
                                      kind=model_cfg.vocoder.model)
        wav = voc.infer(mel)
    else:
        from fscl_tpu.audio_out.vocoder import griffin_lim
        wav = griffin_lim(mel)
    save_wav(args.output, wav, sr)
    print(f"[synth] {n} mel frames -> {args.output}")


def _run_batch(args, dc, model_cfg, system):
    """--text_file serving path: one line per utterance, chunked into
    fixed-size batches over the two-pass bucketed synthesis
    (`synthesize_bucketed` — each (L, T) bucket pair compiles once), so a
    whole file rides the measured ~40k mel-frames/s serving throughput
    instead of one compile per sentence. `--output` is a directory;
    utterances land as 0000.wav, 0001.wav, ..."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fscl_tpu.core.checkpoint import CheckpointManager
    from fscl_tpu.data.batch import Batch
    from fscl_tpu.dsp.audio_io import save_wav
    from fscl_tpu.frontend import text_to_sequence

    with open(args.text_file, encoding="utf-8") as f:
        lines = [l.strip() for l in f if l.strip()]
    assert lines, f"no non-empty lines in {args.text_file}"
    seqs = [text_to_sequence(l, dc.text_cleaners, dc.symbol_id)
            for l in lines]

    chunk = max(1, int(getattr(args, "batch_size", 8)))
    l_buckets = (16, 32, 64, 128, 256)
    os.makedirs(args.output, exist_ok=True)

    # init once at the largest L bucket, then restore
    L0 = next((b for b in l_buckets if max(map(len, seqs)) <= b),
              l_buckets[-1])
    dummy = Batch(
        speaker_args=np.asarray([args.speaker], np.int32),
        texts=np.zeros((1, L0), np.int32), src_lens=np.asarray([L0], np.int32),
        mels=np.zeros((1, 64, 80), np.float32),
        mel_lens=np.asarray([64], np.int32),
        pitches=np.zeros((1, L0), np.float32),
        energies=np.zeros((1, L0), np.float32),
        durations=np.ones((1, L0), np.int32),
        lang_ids=np.asarray([dc.lang_id], np.int32))
    state = system.init_state(jax.random.PRNGKey(0), dummy)
    state = CheckpointManager(args.ckpt_dir).restore_into(state)

    voc = None
    if args.vocoder_ckpt:
        from fscl_tpu.audio_out.vocoder import Vocoder
        voc = Vocoder.from_checkpoint(args.vocoder_ckpt,
                                      kind=model_cfg.vocoder.model)

    n_done = 0
    for start in range(0, len(seqs), chunk):
        group = seqs[start:start + chunk]
        B = len(group)
        maxl = max(map(len, group))
        L = next((b for b in l_buckets if maxl <= b), l_buckets[-1])
        texts = np.zeros((B, L), np.int32)
        for i, s in enumerate(group):
            texts[i, :min(len(s), L)] = s[:L]
        src_lens = np.asarray([min(len(s), L) for s in group], np.int32)
        out = system.synthesize_bucketed(
            state.params, state.batch_stats, jnp.asarray(texts),
            jnp.asarray(src_lens),
            jnp.full((B,), args.speaker, jnp.int32),
            jnp.full((B,), dc.lang_id, jnp.int32),
            symbol_id=dc.symbol_id)
        mels = np.asarray(out.postnet_mel)
        mel_lens = np.asarray(out.mel_len)
        for i in range(B):
            mel = mels[i, :max(int(mel_lens[i]), 1)]
            if voc is not None:
                wav = voc.infer(mel)
            else:
                from fscl_tpu.audio_out.vocoder import griffin_lim
                wav = griffin_lim(mel)
            save_wav(os.path.join(args.output, f"{n_done:04d}.wav"),
                     wav, model_cfg.audio.sampling_rate)
            n_done += 1
    print(f"[synth] {n_done} utterances -> {args.output}/")
