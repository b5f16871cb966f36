"""ops.bucketize must match jnp.searchsorted/np.digitize exactly —
including duplicate boundaries (zero-duration phonemes produce equal
cumsum entries) and queries landing exactly on an edge."""
import numpy as np
import jax.numpy as jnp

from fscl_tpu.ops.bucketize import digitize, searchsorted_right


def test_searchsorted_right_matches_jnp():
    rng = np.random.default_rng(0)
    for _ in range(5):
        dur = rng.integers(0, 5, (4, 32)).astype(np.int32)  # zeros -> dups
        csum = np.cumsum(dur, axis=-1)
        t = np.arange(96, dtype=np.int32)
        got = np.asarray(searchsorted_right(jnp.asarray(csum), jnp.asarray(t)))
        want = np.stack([np.searchsorted(c, t, side="right") for c in csum])
        np.testing.assert_array_equal(got, want)


def test_searchsorted_right_on_edges():
    csum = jnp.asarray([[2, 2, 5, 9]], jnp.int32)
    t = jnp.asarray([0, 1, 2, 3, 4, 5, 8, 9, 10], jnp.int32)
    got = np.asarray(searchsorted_right(csum, t))[0]
    want = np.searchsorted([2, 2, 5, 9], np.asarray(t), side="right")
    np.testing.assert_array_equal(got, want)


def test_digitize_matches_numpy():
    rng = np.random.default_rng(1)
    edges = np.linspace(-3.0, 3.0, 255).astype(np.float32)
    x = rng.normal(size=(3, 40)).astype(np.float32)
    # include exact-edge hits and out-of-range values
    x[0, :5] = edges[[0, 1, 100, 253, 254]]
    x[1, 0] = -10.0
    x[1, 1] = 10.0
    got = np.asarray(digitize(jnp.asarray(x), jnp.asarray(edges)))
    want = np.digitize(x, edges)
    np.testing.assert_array_equal(got, want)
