"""T2U alignment saver: validation-time attention plots.

Re-provides the reference T2U saver's alignment figures (the reference
plots decoder location-sensitive attention per validation sample alongside
unit accuracy; callbacks/t2u savers + tacot2u alignments output,
tacot2u_model.py decode path). One teacher-forced forward on the first
validation batch, first sample's (T_units, L_text) alignment saved as a
heatmap.
"""
from __future__ import annotations

import os

import numpy as np

from fscl_tpu.obs.figures import plot_attention
from fscl_tpu.obs.loggers import Callback


class T2UAlignmentSaver(Callback):
    def __init__(self, result_dir: str, system, synth_step: int = 1000):
        self.result_dir = result_dir
        self.system = system
        self.synth_step = synth_step
        os.makedirs(result_dir, exist_ok=True)

    def on_validation_sample(self, step: int, state, batch):
        if step % self.synth_step != 0:
            return
        import jax

        _, aligns, _ = self.system.forward(
            state.params, state.batch_stats, batch,
            jax.random.PRNGKey(0), train=False)
        a = np.asarray(aligns)[0]                  # (T_units, L_text)
        tu = int(np.asarray(batch.unit_lens)[0])
        ls = int(np.asarray(batch.src_lens)[0])
        path = os.path.join(self.result_dir, f"step{step}_alignment.png")
        plot_attention(a[: max(tu, 1), : max(ls, 1)],
                       title=f"T2U alignment @ step {step}", path=path)
