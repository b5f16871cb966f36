"""Optimizer/schedule tests: warmup+anneal semantics vs the reference's
LambdaLR lambdas (lightning/scheduler.py:21-60), grad accumulation."""
import jax.numpy as jnp
import numpy as np
import optax

from fscl_tpu.core.config import OptimConfig
from fscl_tpu.train.optim import lr_schedule, make_optimizer


def ref_sqrt_factor(step, warmup, anneal_steps, rate):
    current = step + 1
    if warmup > 0:
        factor = current / warmup if current <= warmup else (warmup / current) ** 0.5
    else:
        factor = 1.0
    for s in anneal_steps:
        if current > s:
            factor *= rate
    return factor


def test_sqrt_schedule_matches_reference_lambda():
    cfg = OptimConfig(lr=1e-3, warmup_step=4000,
                      anneal_steps=(30000, 40000, 50000), anneal_rate=0.3)
    sched = lr_schedule(cfg)
    for step in [0, 100, 3999, 4000, 10000, 30001, 45000, 60000]:
        want = 1e-3 * ref_sqrt_factor(step, 4000, (30000, 40000, 50000), 0.3)
        got = float(sched(jnp.asarray(step)))
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_const_schedule():
    cfg = OptimConfig(lr=1e-3, warmup_step=100, anneal_steps=(),
                      scheduler="const")
    sched = lr_schedule(cfg)
    assert float(sched(jnp.asarray(49))) < 1e-3
    np.testing.assert_allclose(float(sched(jnp.asarray(1000))), 1e-3,
                               rtol=1e-6)


def test_grad_accumulation():
    cfg = OptimConfig(lr=0.1, warmup_step=0, anneal_steps=(),
                      grad_acc_step=2, grad_clip_thresh=1e9)
    tx = make_optimizer(cfg)
    params = {"w": jnp.zeros(2)}
    state = tx.init(params)
    g = {"w": jnp.ones(2)}
    # first micro-step: no update applied yet
    updates, state = tx.update(g, state, params)
    p1 = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(p1["w"]), 0.0)
    # second micro-step: accumulated update applied
    updates, state = tx.update(g, state, params)
    p2 = optax.apply_updates(params, updates)
    assert abs(float(p2["w"][0])) > 0


def test_mask_freezes_params():
    cfg = OptimConfig(lr=0.1, warmup_step=0, anneal_steps=())
    mask = {"a": True, "b": False}
    tx = make_optimizer(cfg, trainable_mask=mask)
    params = {"a": jnp.zeros(2), "b": jnp.zeros(2)}
    state = tx.init(params)
    g = {"a": jnp.ones(2), "b": jnp.ones(2)}
    updates, state = tx.update(g, state, params)
    new = optax.apply_updates(params, updates)
    assert abs(float(new["a"][0])) > 0
    np.testing.assert_allclose(np.asarray(new["b"]), 0.0)
