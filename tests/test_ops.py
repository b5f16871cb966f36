"""Golden tests for the vectorized TPU ops against naive loop references
(which replicate the reference repo's Python-loop semantics:
modules.py:169-196 LengthRegulator, reduction.py:13-82 reductions)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fscl_tpu.ops.length_regulator import regulate_lengths, gather_frame_labels
from fscl_tpu.ops.masking import length_mask, masked_mean
from fscl_tpu.ops.segment_ops import (
    phoneme_query_extract, segment_mean, frame_phoneme_query_extract,
)


def naive_length_regulate(x, durations, max_len):
    B, L, D = x.shape
    out = np.zeros((B, max_len, D), dtype=x.dtype)
    mel_len = []
    for b in range(B):
        rows = []
        for i in range(L):
            rows.extend([x[b, i]] * int(durations[b, i]))
        mel_len.append(len(rows))
        rows = rows[:max_len]
        if rows:
            out[b, : len(rows)] = np.stack(rows)
    return out, np.array(mel_len)


def test_length_regulator_matches_naive():
    rng = np.random.default_rng(0)
    B, L, D, T = 3, 7, 5, 40
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    dur = rng.integers(0, 6, size=(B, L))
    out, mel_len = regulate_lengths(jnp.asarray(x), jnp.asarray(dur), T)
    ref_out, ref_len = naive_length_regulate(x, dur, T)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(mel_len), ref_len)


def test_length_regulator_overflow_truncates():
    x = jnp.ones((1, 4, 2))
    dur = jnp.array([[5, 5, 5, 5]])
    out, mel_len = regulate_lengths(x, dur, 8)
    assert out.shape == (1, 8, 2)
    assert int(mel_len[0]) == 20  # raw total; caller clips to max


def test_gather_frame_labels():
    labels = jnp.array([[3, 5, 7]])
    dur = jnp.array([[2, 1, 3]])
    out = gather_frame_labels(labels, dur, 8)
    np.testing.assert_array_equal(
        np.asarray(out)[0], [3, 3, 5, 7, 7, 7, 0, 0])


def naive_segment_mean(reprs, durations):
    B, T = reprs.shape[:2]
    L = durations.shape[1]
    out = np.zeros((B, L) + reprs.shape[2:], dtype=np.float32)
    for b in range(B):
        pos = 0
        for i in range(L):
            d = int(durations[b, i])
            if d > 0:
                out[b, i] = reprs[b, pos: pos + d].mean(axis=0)
            pos += d
    return out


def test_segment_mean_matches_naive():
    rng = np.random.default_rng(1)
    B, T, NL, D = 2, 30, 3, 4
    reprs = rng.normal(size=(B, T, NL, D)).astype(np.float32)
    dur = rng.integers(0, 5, size=(B, 6))
    out = segment_mean(jnp.asarray(reprs), jnp.asarray(dur))
    np.testing.assert_allclose(
        np.asarray(out), naive_segment_mean(reprs, dur), rtol=1e-5, atol=1e-6)


def naive_phoneme_query(reprs, durations, phonemes, n_symbols):
    seg = naive_segment_mean(reprs, durations)
    table = {i: [] for i in range(n_symbols)}
    B, L = durations.shape
    for b in range(B):
        for i in range(L):
            if durations[b, i] > 0:
                table[int(phonemes[b, i])].append(seg[b, i])
    out = np.zeros((n_symbols,) + reprs.shape[2:], dtype=np.float32)
    for c in range(n_symbols):
        if table[c]:
            out[c] = np.stack(table[c]).mean(axis=0)
    return out[None]


def test_phoneme_query_extract_matches_naive():
    rng = np.random.default_rng(2)
    B, T, NL, D, L, S = 3, 25, 2, 4, 5, 11
    reprs = rng.normal(size=(B, T, NL, D)).astype(np.float32)
    dur = rng.integers(0, 5, size=(B, L))
    phn = rng.integers(0, S, size=(B, L))
    out = phoneme_query_extract(
        jnp.asarray(reprs), jnp.asarray(dur), jnp.asarray(phn), S)
    np.testing.assert_allclose(
        np.asarray(out), naive_phoneme_query(reprs, dur, phn, S),
        rtol=1e-5, atol=1e-6)


def test_phoneme_query_nan_guard():
    reprs = jnp.full((1, 4, 1, 2), jnp.nan)
    dur = jnp.array([[2, 2]])
    phn = jnp.array([[1, 2]])
    out = phoneme_query_extract(reprs, dur, phn, 4)
    assert not bool(jnp.any(jnp.isnan(out)))


def test_frame_phoneme_query_extract():
    rng = np.random.default_rng(3)
    reprs = rng.normal(size=(1, 10, 1, 2)).astype(np.float32)
    dur = np.array([[4, 6]])
    phn = np.array([[2, 2]])
    out = frame_phoneme_query_extract(
        jnp.asarray(reprs), jnp.asarray(dur), jnp.asarray(phn), 3)
    np.testing.assert_allclose(
        np.asarray(out)[0, 2], reprs[0, :10].mean(axis=0), rtol=1e-5)


def test_masked_mean_equals_masked_select_mean():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 6)).astype(np.float32)
    lens = np.array([4, 2])
    valid = np.asarray(length_mask(jnp.asarray(lens), 6))
    got = float(masked_mean(jnp.asarray(x), jnp.asarray(valid)))
    want = np.concatenate([x[0, :4], x[1, :2]]).mean()
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("Dh", [64, 128])
def test_attention_xla_vs_pallas_interpret(Dh):
    """Pallas kernel numerics vs XLA path (interpret mode on CPU)."""
    import functools
    from jax.experimental import pallas as pl
    from fscl_tpu.ops import attention as A

    rng = jax.random.PRNGKey(0)
    B, H, L = 2, 2, 128
    q, k, v = jax.random.normal(rng, (3, B, H, L, Dh))
    valid = jnp.arange(L)[None, :] < jnp.array([100, 128])[:, None]
    want = A.xla_attention(q, k, v, valid)

    # run the pallas kernel in interpret mode
    from jax.experimental.pallas import tpu as pltpu
    temp = Dh ** 0.5
    qf, kf, vf = (t.reshape(B * H, L, Dh) for t in (q, k, v))
    mask = jnp.repeat(valid.astype(jnp.int32), H, axis=0)[:, None, :]
    got = pl.pallas_call(
        functools.partial(A._attn_kernel, temp=temp),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, L, Dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, L, Dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, L, Dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, Dh), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, L, Dh), q.dtype),
        interpret=True,
    )(qf, kf, vf, mask).reshape(B, H, L, Dh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
