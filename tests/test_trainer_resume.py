"""Trainer-level resume semantics (VERDICT r3 weak #4 / next #7).

The reference resumes via Lightning's `resume_from_checkpoint`
(/root/reference/main.py:91-110): step counter, optimizer moments and LR
schedule continue. Here: `CheckpointManager.restore_into(..., full=True)`
(the `fscl_tpu train --resume` path) must reproduce the UNINTERRUPTED
optimization trajectory exactly — same batches + same base key after an
interrupt/restore give bit-identical params. Warm-start (`full=False`,
the --pretrain_ckpt path) must keep step 0 and fresh moments.

Data-stream position is NOT checkpointed (matching Lightning; documented
in docs/ARCHITECTURE.md §5) — that is why these tests feed explicit batch
lists rather than a sampler.
"""
import jax
import jax.numpy as jnp
import numpy as np

from fscl_tpu.core.checkpoint import CheckpointManager
from fscl_tpu.core.config import ModelConfig, OptimConfig, SpeakerConfig, TransformerConfig
from fscl_tpu.data.batch import Batch
from fscl_tpu.systems.baseline import BaselineSystem


def _tiny_system():
    cfg = ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_hidden=32,
            decoder_hidden=32, conv_filter_size=64),
        speaker=SpeakerConfig(n_speakers=4), max_seq_len=64)
    optim = OptimConfig(lr=1e-3, warmup_step=4, anneal_steps=(5,),
                        anneal_rate=0.3)
    return BaselineSystem(cfg, optim, (("en", 40),))


def _mk_batch(seed, B=2, L=8, T=32):
    r = np.random.default_rng(seed)
    dur = np.full((B, L), T // L, np.int32)
    return Batch(
        speaker_args=np.zeros(B, np.int32),
        texts=r.integers(1, 40, (B, L)).astype(np.int32),
        src_lens=np.full((B,), L, np.int32),
        mels=r.normal(size=(B, T, 80)).astype(np.float32),
        mel_lens=dur.sum(1).astype(np.int32),
        pitches=r.normal(size=(B, L)).astype(np.float32),
        energies=r.normal(size=(B, L)).astype(np.float32),
        durations=dur, lang_ids=np.zeros(B, np.int32))


def _run_steps(system, state, step_fn, key, seeds):
    for s in seeds:
        state, _ = step_fn(state, _mk_batch(s), key)
    return state


def test_full_restore_continues_trajectory_exactly(tmp_path):
    system = _tiny_system()
    step_fn = jax.jit(system.train_step)
    key = jax.random.PRNGKey(7)   # base key; train_step folds in state.step

    state = system.init_state(jax.random.PRNGKey(0), _mk_batch(0))
    state = _run_steps(system, state, step_fn, key, range(3))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(int(state.step), state)
    final_a = _run_steps(system, state, step_fn, key, range(3, 6))

    # fresh process simulation: NEW init (different rng -> different
    # params), then full restore and the same post-interrupt batches
    fresh = system.init_state(jax.random.PRNGKey(99), _mk_batch(0))
    resumed = mgr.restore_into(fresh, full=True)
    assert int(resumed.step) == 3
    # optimizer moments restored, not fresh zeros
    mu_leaves = [x for x in jax.tree_util.tree_leaves(resumed.opt_state)
                 if hasattr(x, "shape") and np.asarray(x).size > 1]
    assert any(np.abs(np.asarray(x)).max() > 0 for x in mu_leaves)
    final_b = _run_steps(system, resumed, step_fn, key, range(3, 6))

    assert int(final_a.step) == int(final_b.step) == 6
    for a, b in zip(jax.tree_util.tree_leaves(final_a.params),
                    jax.tree_util.tree_leaves(final_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(final_a.opt_state),
                    jax.tree_util.tree_leaves(final_b.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_lr_schedule(tmp_path):
    """The LR schedule is a pure function of the restored step counter:
    after resume the trainer reports the step-N learning rate, not the
    warmup-restart rate."""
    from fscl_tpu.train.optim import lr_schedule

    system = _tiny_system()
    sched = lr_schedule(system.optim_cfg)
    state = system.init_state(jax.random.PRNGKey(0), _mk_batch(0))
    step_fn = jax.jit(system.train_step)
    state = _run_steps(system, state, step_fn, jax.random.PRNGKey(7),
                       range(6))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(int(state.step), state)
    fresh = system.init_state(jax.random.PRNGKey(1), _mk_batch(0))
    resumed = mgr.restore_into(fresh, full=True)
    # step 6 is past warmup(4) and the anneal at 5: lr must reflect both
    assert float(sched(resumed.step)) == float(sched(jnp.asarray(6)))
    assert float(sched(resumed.step)) != float(sched(jnp.asarray(0)))


def test_warm_start_keeps_fresh_step_and_moments(tmp_path):
    system = _tiny_system()
    state = system.init_state(jax.random.PRNGKey(0), _mk_batch(0))
    step_fn = jax.jit(system.train_step)
    trained = _run_steps(system, state, step_fn, jax.random.PRNGKey(7),
                         range(4))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(int(trained.step), trained)

    fresh = system.init_state(jax.random.PRNGKey(1), _mk_batch(0))
    warm = mgr.restore_into(fresh)        # default: params only
    assert int(warm.step) == 0
    # params came from the checkpoint...
    for a, b in zip(jax.tree_util.tree_leaves(warm.params),
                    jax.tree_util.tree_leaves(trained.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...but the moments are the fresh init's (zeros), not the trained ones
    for a, b in zip(jax.tree_util.tree_leaves(warm.opt_state),
                    jax.tree_util.tree_leaves(fresh.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_restore_tolerates_structure_mismatch(tmp_path):
    """A checkpoint from a differently-shaped model keeps the fresh
    optimizer moments (shape-tolerant semantics extended to opt_state)
    instead of crashing or mixing incompatible moments; matching params
    still restore and the step still resumes."""
    system = _tiny_system()
    state = system.init_state(jax.random.PRNGKey(0), _mk_batch(0))
    step_fn = jax.jit(system.train_step)
    trained = _run_steps(system, state, step_fn, jax.random.PRNGKey(7),
                         range(2))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(int(trained.step), trained)

    cfg = ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_hidden=32,
            decoder_hidden=32, conv_filter_size=64),
        speaker=SpeakerConfig(n_speakers=6),   # bigger speaker table
        max_seq_len=64)
    other = BaselineSystem(cfg, system.optim_cfg, (("en", 40),))
    fresh = other.init_state(jax.random.PRNGKey(1), _mk_batch(0))
    resumed = mgr.restore_into(fresh, full=True)
    assert int(resumed.step) == 2        # step still resumes
    # opt_state leaf shapes disagree (speaker-table moments) -> fresh kept
    for a, b in zip(jax.tree_util.tree_leaves(resumed.opt_state),
                    jax.tree_util.tree_leaves(fresh.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
