"""Data-parallel serving: batch-sharded synthesis over a device mesh.

The reference serves synthesis single-GPU (evaluation drivers run the model
per task). Here batched no-target synthesis shards the request batch over
the mesh's `data` axis with replicated params — XLA moves no activations
across chips, so serving throughput scales linearly with chips over ICI.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

from fscl_tpu.parallel.mesh import batch_sharding, replicated


def make_parallel_synth(system, mesh: Mesh, max_mel_len: int,
                        symbol_id: Optional[str] = None):
    """jit a batch-sharded synthesize(texts, src_lens, speaker_args,
    lang_ids) -> (postnet_mel, mel_len). Batch size must divide the mesh's
    data axis; pad the request batch to a multiple (serving collate already
    buckets)."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    def synth(params, batch_stats, texts, src_lens, speaker_args, lang_ids):
        out = system.synthesize(params, batch_stats, texts, src_lens,
                                max_mel_len, speaker_args, lang_ids,
                                symbol_id=symbol_id)
        return out.postnet_mel, out.mel_len

    return jax.jit(
        synth,
        in_shardings=(rep, rep, bsh, bsh, bsh, bsh),
        out_shardings=(bsh, bsh),
    )
