"""MAML-style meta-adaptation with on-chip lax.scan inner loops.

Re-design of the reference's learn2learn MAML usage (TransEmbOrig2System,
TransEmbOrig.py:215-330; AdaptorSystem adaptation_lr/steps, adaptor.py:6-41)
as pure JAX: the inner loop is a `lax.scan` of SGD steps on the support
batch carried entirely on-device (the north-star's "MAML inner loops as
jax.lax.scan"), differentiated through for the outer (meta) update.

`inner_adapt` is generic: give it a loss(params, batch) and it returns
adapted params after K steps. `MAMLTransEmbSystem` ("fscl-orig2") applies it
to the FSCL episode: the generated embedding table + FastSpeech2 are adapted
on the support TTS batch, then the query loss (computed with adapted
params) drives the meta-gradient.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from fscl_tpu.core.registry import SYSTEMS
from fscl_tpu.data.batch import Batch
from fscl_tpu.nn.losses import fastspeech2_loss
from fscl_tpu.systems.fscl import Episode, TransEmbSystem


def inner_adapt(
    loss_fn: Callable[[Any], jnp.ndarray],
    params: Any,
    inner_lr: float,
    inner_steps: int,
    first_order: bool = False,
) -> Any:
    """K SGD steps on `params` via lax.scan; differentiable (2nd-order MAML)
    unless first_order=True (stop-gradient through the inner grads)."""
    if inner_steps <= 0:
        return params

    def step(p, _):
        g = jax.grad(loss_fn)(p)
        if first_order:
            g = jax.lax.stop_gradient(g)
        p = jax.tree_util.tree_map(lambda a, b: a - inner_lr * b, p, g)
        return p, None

    adapted, _ = jax.lax.scan(step, params, None, length=inner_steps)
    return adapted


@SYSTEMS.register("fscl-orig2", "maml", "meta")
class MAMLTransEmbSystem(TransEmbSystem):
    """FSCL episode with inner-loop adaptation on the support batch.

    Also answers to the reference's legacy "meta" algorithm key
    (config/algorithm/language/meta.yaml: class MAML) — its MAML meta-TTS
    system from the meta-TTS lineage.
    """

    def __init__(self, *args, adaptation_lr: float = 1e-3,
                 adaptation_steps: int = 2, first_order: bool = False,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.adaptation_lr = adaptation_lr
        self.adaptation_steps = adaptation_steps
        self.first_order = first_order

    def _episode_loss(self, params, batch_stats, table, batch: Batch, rng,
                      train: bool):
        """FastSpeech2 loss on `batch` with embeddings from `table`."""
        emb = jnp.take(table, batch.texts, axis=0)
        emb = jnp.where((batch.texts == 0)[..., None], 0.0, emb)
        model_vars = {"params": params["model"]}
        if batch_stats is not None:
            model_vars["batch_stats"] = batch_stats["model"]
        rngs = {"dropout": rng} if train and rng is not None else None
        out = self.model.apply(
            model_vars, emb, batch.src_lens, batch.mels.shape[1],
            speaker_args=batch.speaker_args, mel_lens=batch.mel_lens,
            p_targets=batch.pitches, e_targets=batch.energies,
            d_targets=batch.durations, lang_args=batch.lang_ids,
            average_spk_emb=True, deterministic=not train, rngs=rngs,
            mutable=["batch_stats"] if train else False)
        if train:
            out, _ = out   # BN running stats are not meta-learned; discard
        losses = fastspeech2_loss(
            out.mel, out.postnet_mel, out.pitch_prediction,
            out.energy_prediction, out.log_duration_prediction,
            batch.mels, batch.pitches, batch.energies, batch.durations,
            out.src_valid, out.mel_valid,
            self.model_cfg.variance.pitch_feature,
            self.model_cfg.variance.energy_feature)
        return losses

    def loss_and_metrics(self, params, batch_stats, episode: Episode, rng,
                         train, frozen=None):
        assert episode.sup_batch is not None, (
            "MAML system needs collate_episode(with_sup_batch=True)")
        sup, qry = episode.sup, episode.qry
        ssl_hidden, _ = self.extract_ssl(
            sup.wavs, sup.wav_lens,
            frozen.get("upstream") if frozen else None)
        table = self.build_embedding_table(params, ssl_hidden, sup)

        # inner loop: adapt (table, model params) on the support TTS batch
        inner_state = {"table": table, "model": params["model"]}

        def sup_loss(p):
            inner_params = {"model": p["model"], "codebook": params["codebook"]}
            losses = self._episode_loss(
                inner_params, batch_stats, p["table"], episode.sup_batch,
                None, False)
            return losses.total

        adapted = inner_adapt(sup_loss, inner_state, self.adaptation_lr,
                              self.adaptation_steps, self.first_order)

        # outer loss on the query batch through the adapted params
        outer_params = {"model": adapted["model"],
                        "codebook": params["codebook"]}
        losses = self._episode_loss(
            outer_params, batch_stats, adapted["table"], qry, rng, train)
        return losses.total, (losses.as_dict(), None)


def _tree_dot(a, b):
    return sum(jnp.vdot(x, y) for x, y in
               zip(jax.tree_util.tree_leaves(a),
                   jax.tree_util.tree_leaves(b)))


def _tree_axpy(alpha, x, y):
    return jax.tree_util.tree_map(lambda a, b: alpha * a + b, x, y)


def cg_solve(matvec: Callable[[Any], Any], b: Any, n_steps: int) -> Any:
    """Fixed-step conjugate gradients for (symmetric PD) matvec x = b, as a
    lax.scan (static step count -> one compiled program; the reference's
    iMAML `imaml.K` CG steps)."""
    x0 = jax.tree_util.tree_map(jnp.zeros_like, b)

    def step(carry, _):
        x, r, p, rs = carry
        Ap = matvec(p)
        alpha = rs / (_tree_dot(p, Ap) + 1e-12)
        x = _tree_axpy(alpha, p, x)
        r = _tree_axpy(-alpha, Ap, r)
        rs_new = _tree_dot(r, r)
        p = _tree_axpy(rs_new / (rs + 1e-12), p, r)
        return (x, r, p, rs_new), None

    r0 = b
    (x, _, _, _), _ = jax.lax.scan(
        step, (x0, r0, r0, _tree_dot(r0, r0)), None, length=n_steps)
    return x


@SYSTEMS.register("imaml")
class IMAMLTransEmbSystem(MAMLTransEmbSystem):
    """iMAML (implicit MAML): proximally-regularized inner loop + conjugate-
    gradient implicit meta-gradients (reference:
    config/algorithm/language/imaml.yaml `class: iMAML`, `imaml.K` CG steps,
    `imaml.reg_param` — the variant upstream prototyped in dev.yaml).

    Inner: p* ≈ argmin_p L_sup(p) + (λ/2)||p - θ||², K_inner SGD steps,
    NOT differentiated through (lax.stop_gradient).
    Outer: by the implicit function theorem dθ = (I + H/λ)^{-1} g_qry with
    H = ∇²L_sup(p*); solved with `cg_steps` fixed CG iterations using
    Hessian-vector products (reverse-over-reverse) — memory does not grow
    with inner steps, unlike 2nd-order MAML.
    The meta-gradient reaches θ = (generated table, model params) through a
    surrogate inner product, so the codebook that builds the table trains.
    """

    def __init__(self, *args, cg_steps: int = 5, reg_param: float = 1.0,
                 **kwargs):
        kwargs.setdefault("adaptation_steps", 5)
        super().__init__(*args, **kwargs)
        self.cg_steps = cg_steps
        self.reg_param = reg_param

    def loss_and_metrics(self, params, batch_stats, episode: Episode, rng,
                         train, frozen=None):
        assert episode.sup_batch is not None, (
            "iMAML system needs collate_episode(with_sup_batch=True)")
        sup, qry = episode.sup, episode.qry
        ssl_hidden, _ = self.extract_ssl(
            sup.wavs, sup.wav_lens,
            frozen.get("upstream") if frozen else None)
        table = self.build_embedding_table(params, ssl_hidden, sup)
        theta = {"table": table, "model": params["model"]}
        lam = self.reg_param

        def sup_loss(p):
            inner_params = {"model": p["model"],
                            "codebook": params["codebook"]}
            return self._episode_loss(
                inner_params, batch_stats, p["table"], episode.sup_batch,
                None, False).total

        anchor = jax.lax.stop_gradient(theta)

        def prox_loss(p):
            sq = sum(jnp.sum((a - b) ** 2) for a, b in
                     zip(jax.tree_util.tree_leaves(p),
                         jax.tree_util.tree_leaves(anchor)))
            return sup_loss(p) + 0.5 * lam * sq

        adapted = jax.lax.stop_gradient(inner_adapt(
            prox_loss, anchor, self.adaptation_lr, self.adaptation_steps,
            first_order=True))

        def qry_loss(p):
            outer_params = {"model": p["model"],
                            "codebook": params["codebook"]}
            return self._episode_loss(
                outer_params, batch_stats, p["table"], qry, rng,
                train).total

        q_val, g_qry = jax.value_and_grad(qry_loss)(adapted)

        # (I + H/λ) v = g_qry via CG with HVPs of the support loss at p*.
        # HVP as reverse-over-reverse (grad of <grad, v>): forward-mode jvp
        # cannot differentiate custom_vjp ops (the length-regulator's MXU
        # VJP, ops/length_regulator.py), reverse-over-reverse can.
        def matvec(v):
            hv = jax.grad(
                lambda p: _tree_dot(jax.grad(sup_loss)(p), v))(adapted)
            return jax.tree_util.tree_map(lambda a, b: a + b / lam, v, hv)

        v = jax.lax.stop_gradient(cg_solve(matvec, g_qry, self.cg_steps))

        # surrogate: grad wrt params == J_θ(params)^T v (implicit meta-grad)
        surrogate = _tree_dot(v, theta)
        meta_loss = surrogate - jax.lax.stop_gradient(surrogate) + \
            jax.lax.stop_gradient(q_val)

        losses = self._episode_loss(
            {"model": adapted["model"], "codebook": params["codebook"]},
            batch_stats, adapted["table"], qry, rng, False)
        metrics = losses.as_dict()
        metrics["Total Loss"] = q_val
        return meta_loss, (metrics, None)


def fast_adaptation_scan(
    loss_fn: Callable[[Any, Any], jnp.ndarray],
    params: Any,
    batches: Any,                # pytree with leading scan axis (n_steps, ...)
    lr: float = 1e-3,
):
    """Test-time fast adaptation entirely on-chip: scan SGD over a stacked
    batch sequence (the tune flows' adaptation loop without host round
    trips). Returns (adapted params, per-step losses)."""

    def step(p, batch):
        loss, g = jax.value_and_grad(loss_fn)(p, batch)
        p = jax.tree_util.tree_map(lambda a, b: a - lr * b, p, g)
        return p, loss

    return jax.lax.scan(step, params, batches)


def adam_carry(params: Any):
    """Fresh Adam scan carry (params, mu, nu, t) for `adam_scan_carry`."""
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return (params, zeros, zeros, jnp.float32(0.0))


def adam_scan_carry(
    loss_fn: Callable[[Any, Any], jnp.ndarray],
    carry: Any,                  # from adam_carry (or a previous chunk)
    batches: Any,                # pytree with leading scan axis (n_steps, ...)
    lr: float = 1e-3,
    betas=(0.9, 0.98),
    eps: float = 1e-9,
    clip: float = 1.0,
):
    """Adam adaptation scan with an EXPLICIT carry, so chunked long-budget
    runs (tune.adapt_on_chip_chunked) keep the moment estimates warm across
    chunks. Optimizer matches the reference tune flows: Adam
    beta=(0.9, 0.98), eps=1e-9, global-norm grad clip 1.0
    (lightning/optimizer.py:5-15, config/train/fscl.yaml). Returns
    (new carry, per-step losses)."""
    b1, b2 = betas

    def step(carry, batch):
        p, mu, nu, t = carry
        loss, g = jax.value_and_grad(loss_fn)(p, batch)
        gnorm = jnp.sqrt(sum(
            jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(g)))
        scale = jnp.minimum(1.0, clip / jnp.maximum(gnorm, 1e-12))
        g = jax.tree_util.tree_map(lambda x: x * scale, g)
        t = t + 1
        mu = jax.tree_util.tree_map(
            lambda m, x: b1 * m + (1.0 - b1) * x, mu, g)
        nu = jax.tree_util.tree_map(
            lambda v, x: b2 * v + (1.0 - b2) * jnp.square(x), nu, g)
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - b2 ** t
        p = jax.tree_util.tree_map(
            lambda a, m, v: a - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
            p, mu, nu)
        return (p, mu, nu, t), loss

    return jax.lax.scan(step, carry, batches)


def fast_adaptation_scan_adam(
    loss_fn: Callable[[Any, Any], jnp.ndarray],
    params: Any,
    batches: Any,
    lr: float = 1e-3,
    betas=(0.9, 0.98),
    eps: float = 1e-9,
    clip: float = 1.0,
):
    """`fast_adaptation_scan` drop-in with the Adam optimizer (fresh
    moments). Returns (adapted params, per-step losses)."""
    carry, losses = adam_scan_carry(
        loss_fn, adam_carry(params), batches, lr, betas, eps, clip)
    return carry[0], losses
