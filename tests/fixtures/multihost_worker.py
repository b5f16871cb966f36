"""Multihost simulation worker (tests/test_multihost_sim.py): one of N
local processes forming a jax.distributed runtime over local TCP, each with
its own virtual CPU devices — exercising parallel/multihost.py beyond
process_count=1 without multi-host hardware (docs/multihost.md recipe).

Runs one DP train step over the GLOBAL mesh with per-process local batches
assembled by host_local_batch, and prints `MHOK process=i/N
devices=local/global loss=...`; every process must print the SAME loss
(same replicated params, same global batch, psum'd grads).

argv: coordinator num_processes process_id repo_root
"""
import sys

repo = sys.argv[4]
sys.path.insert(0, repo)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from fscl_tpu.parallel.multihost import host_local_batch, maybe_initialize

coordinator, num_processes, process_id = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
assert maybe_initialize(coordinator, num_processes, process_id) is True
assert jax.process_count() == num_processes
assert jax.process_index() == process_id

from fscl_tpu.core.config import (
    ModelConfig, OptimConfig, SpeakerConfig, TransformerConfig,
)
from fscl_tpu.data.batch import Batch
from fscl_tpu.parallel.mesh import make_mesh, replicate
from fscl_tpu.systems.baseline import BaselineSystem
from fscl_tpu.train.trainer import make_parallel_train_step

n_global = len(jax.devices())
n_local = len(jax.local_devices())
mesh = make_mesh(n_data=n_global)

cfg = ModelConfig(
    transformer=TransformerConfig(
        encoder_layer=1, decoder_layer=1, encoder_hidden=32,
        decoder_hidden=32, conv_filter_size=64),
    max_seq_len=64, speaker=SpeakerConfig(n_speakers=4))
system = BaselineSystem(cfg, OptimConfig(batch_size=n_global), (("en", 30),))


def local_batch(seed, B):
    rng = np.random.default_rng(seed)
    L, T = 8, 24
    dur = rng.integers(1, 3, (B, L)).astype(np.int32)
    return Batch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, 30, (B, L)).astype(np.int32),
        src_lens=np.full((B,), L, np.int32),
        mels=rng.normal(size=(B, T, 80)).astype(np.float32),
        mel_lens=np.minimum(dur.sum(1), T).astype(np.int32),
        pitches=rng.normal(size=(B, L)).astype(np.float32),
        energies=rng.normal(size=(B, L)).astype(np.float32),
        durations=dur, lang_ids=np.zeros(B, np.int32))


# init from the SAME seed on every process (replicated params), then one
# DP step on per-process DISJOINT data assembled into a global array
state = system.init_state(jax.random.PRNGKey(0), local_batch(0, n_global))
state = replicate(state, mesh)
step = make_parallel_train_step(system, mesh)
my_batch = local_batch(100 + process_id, n_local)   # disjoint per process
placed = host_local_batch(my_batch, mesh)
state, metrics = step(state, placed, jax.random.PRNGKey(1))
loss = float(metrics["Total Loss"])
print(f"MHOK process={process_id}/{num_processes} "
      f"devices={n_local}/{n_global} loss={loss:.6f}", flush=True)
