"""FSCL saver: codebook-attention + SSL layer-weight artifacts.

Re-provides lightning/callbacks/language/fscl_saver.py (300 LoC): at
validation time, plot the episode's codebook attention per head (via
CodebookAnalyzer) and the learned softmax SSL layer weights
(TransEmbOrig.py layer-weight logging).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from fscl_tpu.obs.codebook_analysis import CodebookAnalyzer
from fscl_tpu.obs.figures import plot_layer_weights
from fscl_tpu.obs.loggers import Callback


class FSCLSaver(Callback):
    def __init__(self, result_dir: str, system, symbols: Sequence[str] = (),
                 synth_step: int = 1000):
        self.result_dir = result_dir
        self.system = system            # TransEmbSystem (or subclass)
        self.symbols = list(symbols)
        self.synth_step = synth_step
        self.analyzer = CodebookAnalyzer(result_dir)
        os.makedirs(result_dir, exist_ok=True)

    def on_validation_sample(self, step: int, state, episode):
        if step % self.synth_step != 0:
            return
        import jax.numpy as jnp

        sup = episode.sup
        ssl_hidden, _ = self.system.extract_ssl(
            jnp.asarray(sup.wavs), jnp.asarray(sup.wav_lens))
        table, attn = self.system.build_embedding_table(
            state.params, ssl_hidden, sup, need_weights=True)
        if attn is not None:
            attn = np.asarray(attn)[0]           # (n_heads, n_symbols, size)
            symbols = (self.symbols if self.symbols
                       else [str(i) for i in range(attn.shape[1])])
            infos = self.analyzer.heads_to_infos(attn, symbols,
                                                 prefix=f"step{step}-head")
            self.analyzer.plot_matching(infos, step=step)

        # learned SSL layer weights (softmax of weight_raw)
        cb_params = state.params.get("codebook", {})
        if "weight_raw" in cb_params:
            w = np.asarray(cb_params["weight_raw"]).reshape(-1)
            w = np.exp(w - w.max())
            w = w / w.sum()
            plot_layer_weights(
                w, title=f"SSL layer weights @ step {step}",
                path=os.path.join(self.result_dir,
                                  f"step{step}-layer-weights.png"))
