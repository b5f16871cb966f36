"""`fscl_tpu synth` — text -> mel -> wav (BaselineSystem.inference +
vocoder path, language/FastSpeech2.py:112-141 / utils/log.py:15-53)."""
from __future__ import annotations

import os


def run(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fscl_tpu.core.checkpoint import CheckpointManager
    from fscl_tpu.core.config import ModelConfig, OptimConfig, read_data_config
    from fscl_tpu.dsp.audio_io import save_wav
    from fscl_tpu.frontend import LANG_ID2SYMBOLS, text_to_sequence
    from fscl_tpu.systems.baseline import BaselineSystem

    dc = read_data_config(args.data_config)
    model_cfg = ModelConfig()
    id2symbols = ((dc.symbol_id, len(LANG_ID2SYMBOLS[dc.symbol_id])),)
    system = BaselineSystem(model_cfg, OptimConfig(), id2symbols)

    seq = text_to_sequence(args.text, dc.text_cleaners, dc.symbol_id)
    L = len(seq)
    texts = jnp.asarray(np.asarray(seq, np.int32)[None])
    src_lens = jnp.asarray([L])
    T = min(model_cfg.max_seq_len, max(64, L * 12))

    # init then restore
    from fscl_tpu.data.batch import Batch
    dummy = Batch(
        speaker_args=np.zeros(1, np.int32), texts=np.asarray(seq, np.int32)[None],
        src_lens=np.asarray([L], np.int32),
        mels=np.zeros((1, T, 80), np.float32), mel_lens=np.asarray([T], np.int32),
        pitches=np.zeros((1, L), np.float32), energies=np.zeros((1, L), np.float32),
        durations=np.ones((1, L), np.int32), lang_ids=np.asarray([dc.lang_id], np.int32))
    state = system.init_state(jax.random.PRNGKey(0), dummy)
    mgr = CheckpointManager(args.ckpt_dir)
    state = mgr.restore_into(state)

    out = system.synthesize(
        state.params, state.batch_stats, texts, src_lens, T,
        jnp.asarray([args.speaker]), jnp.asarray([dc.lang_id]),
        symbol_id=dc.symbol_id)
    n = int(out.mel_len[0])
    mel = np.asarray(out.postnet_mel)[0, :n]

    if args.vocoder_ckpt:
        from fscl_tpu.audio_out.vocoder import Vocoder
        voc = Vocoder.from_checkpoint(args.vocoder_ckpt)
        wav = voc.infer(mel)
    else:
        from fscl_tpu.audio_out.vocoder import griffin_lim
        wav = griffin_lim(mel)
    save_wav(args.output, wav, 22050)
    print(f"[synth] {n} mel frames -> {args.output}")
