"""steps_per_dispatch: k scanned steps == k single dispatches.

The multi-step fn (train/trainer.py:make_multi_train_step) wraps
`system.train_step` in a lax.scan over k stacked batches inside one jitted
program (TPU infeed amortization; the reference's Lightning loop has no
equivalent — it dispatches one CUDA step per Python iteration,
/root/reference/main.py:34-110). Because the scan body IS the single step
and the base RNG key is threaded unchanged (dropout seeds fold state.step
on device), the trajectory is step-for-step IDENTICAL MATH — but the scan
body compiles to different fusions than the standalone jit, so floats
carry compilation-variant noise (~1e-8 abs measured on CPU), which Adam's
normalized update amplifies on near-cancelling gradients (~3e-5 after 4
steps). Pinned at atol=5e-4 — see _assert_trees_close — including resume
misalignment (lead singles) and the tail.
"""
import jax
import numpy as np

from fscl_tpu.core.config import TrainConfig
from fscl_tpu.train.trainer import (Trainer, _group_stacked,
                                    make_multi_train_step, stack_batches)
from tests.test_trainer_resume import _mk_batch, _tiny_system


def _leaves(tree):
    return jax.tree_util.tree_leaves(tree)


def _assert_trees_close(a, b):
    # Same math, different compiled programs. Raw fusion noise is ~1e-8,
    # but Adam's normalized update m/sqrt(v) AMPLIFIES it on parameters
    # whose batch gradient nearly cancels (observed 3e-5 abs on biases
    # after 4 steps) — so the bound is absolute, at a scale real
    # mis-sequencing bugs (wrong batch order / RNG / skipped step) exceed
    # by >100x (those move params at the full ~lr*steps scale, >1e-2).
    for x, y in zip(_leaves(a), _leaves(b)):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64),
                                   rtol=0, atol=5e-4)


def test_multi_step_matches_singles():
    system = _tiny_system()
    key = jax.random.PRNGKey(7)
    batches = [_mk_batch(s) for s in range(4)]

    state_a = system.init_state(jax.random.PRNGKey(0), batches[0])
    single = jax.jit(system.train_step)
    for b in batches:
        state_a, metrics_a = single(state_a, b, key)

    state_b = system.init_state(jax.random.PRNGKey(0), batches[0])
    multi = make_multi_train_step(system, 4)
    state_b, metrics_b = multi(state_b, stack_batches(batches), key)

    assert int(state_a.step) == int(state_b.step) == 4
    _assert_trees_close(state_a.params, state_b.params)
    _assert_trees_close(state_a.opt_state, state_b.opt_state)
    # the multi fn reports the LAST step's metrics (log-boundary contract)
    np.testing.assert_allclose(float(metrics_a["Total Loss"]),
                               float(metrics_b["Total Loss"]), rtol=1e-3)


def test_trainer_fit_with_steps_per_dispatch_matches_k1():
    system = _tiny_system()
    batches = [_mk_batch(s) for s in range(10)]

    def run(k, total):
        cfg = TrainConfig(optim=system.optim_cfg, total_step=total,
                          log_step=10 ** 9, val_step=10 ** 9,
                          synth_step=10 ** 9, save_step=10 ** 9,
                          prefetch=0, steps_per_dispatch=k)
        trainer = Trainer(system, cfg)
        state = system.init_state(jax.random.PRNGKey(0), batches[0])
        return trainer.fit(state, iter(batches),
                           rng=jax.random.PRNGKey(7))

    # total=10 with k=4 exercises multi (2 groups) + tail singles (2)
    final_1 = run(1, 10)
    final_4 = run(4, 10)
    assert int(final_1.step) == int(final_4.step) == 10
    _assert_trees_close(final_1.params, final_4.params)


def test_trainer_fit_prefetch_and_resume_alignment():
    system = _tiny_system()
    batches = [_mk_batch(s) for s in range(9)]

    def run(k, start_state, feed, prefetch):
        cfg = TrainConfig(optim=system.optim_cfg, total_step=9,
                          log_step=10 ** 9, val_step=10 ** 9,
                          synth_step=10 ** 9, save_step=10 ** 9,
                          prefetch=prefetch, steps_per_dispatch=k)
        return Trainer(system, cfg).fit(start_state, iter(feed),
                                        rng=jax.random.PRNGKey(7))

    # baseline: 9 steps single-dispatch
    init = system.init_state(jax.random.PRNGKey(0), batches[0])
    ref = run(1, init, batches, prefetch=0)

    # resume at step 3 (not a multiple of k=4): lead singles must realign
    init = system.init_state(jax.random.PRNGKey(0), batches[0])
    mid = run(1, init, batches[:3], prefetch=0)
    assert int(mid.step) == 3
    out = run(4, mid, batches[3:], prefetch=2)   # prefetch path too
    assert int(out.step) == 9
    _assert_trees_close(ref.params, out.params)


def test_cadence_must_divide_k():
    system = _tiny_system()
    cfg = TrainConfig(optim=system.optim_cfg, total_step=8, log_step=3,
                      val_step=10 ** 9, synth_step=10 ** 9,
                      save_step=10 ** 9, prefetch=0, steps_per_dispatch=4)
    trainer = Trainer(system, cfg)
    state = system.init_state(jax.random.PRNGKey(0), _mk_batch(0))
    import pytest
    with pytest.raises(ValueError, match="log_step"):
        trainer.fit(state, iter([_mk_batch(0)]))


def test_group_stacked_shapes_and_tail():
    items = list(_group_stacked(iter(range(10)), k=4, limit=10, lead=2))
    tags = [(t, n) for t, n, _ in items]
    # 2 lead singles, 2 full groups, then 0 remaining (2+4+4=10)
    assert tags == [("single", 1), ("single", 1), ("multi", 4), ("multi", 4)]
    # dry source mid-group flushes singles bounded by the limit
    items = list(_group_stacked(iter(range(6)), k=4, limit=10, lead=0))
    tags = [(t, n) for t, n, _ in items]
    assert tags == [("multi", 4), ("single", 1), ("single", 1)]


def test_multi_step_on_virtual_mesh():
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:2])
    if devs.size < 2:
        import pytest
        pytest.skip("needs >=2 devices (virtual CPU mesh)")
    mesh = Mesh(devs, ("data",))
    system = _tiny_system()
    multi = make_multi_train_step(system, 2, mesh)
    batches = [_mk_batch(s) for s in range(2)]
    state = system.init_state(jax.random.PRNGKey(0), batches[0])
    state, metrics = multi(state, stack_batches(batches),
                           jax.random.PRNGKey(7))
    assert int(state.step) == 2 and np.isfinite(float(metrics["Total Loss"]))
