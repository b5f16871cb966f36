"""MXUConv1D == nn.Conv (same params, SAME padding) + grad flow."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fscl_tpu.ops.conv_mxu import MXUConv1D, conv1d_im2col


@pytest.mark.parametrize("k", [1, 3, 5, 9])
def test_matches_nn_conv(k):
    B, T, Cin, Cout = 2, 24, 16, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, Cin))
    ref = nn.Conv(Cout, (k,), padding="SAME")
    v = ref.init(jax.random.PRNGKey(1), x)
    want = ref.apply(v, x)
    got = conv1d_im2col(x, v["params"]["kernel"], v["params"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_module_param_compat_and_grad():
    B, T, C = 2, 16, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, C))
    m = MXUConv1D(12, 5)
    v = m.init(jax.random.PRNGKey(1), x)
    assert v["params"]["kernel"].shape == (5, C, 12)
    assert v["params"]["bias"].shape == (12,)
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(v)
    assert float(jnp.abs(g["params"]["kernel"]).max()) > 0


def test_even_kernel_matches_nn_conv():
    # even k: SAME padding is asymmetric — match flax's convention
    B, T, Cin, Cout, k = 2, 20, 8, 8, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, Cin))
    ref = nn.Conv(Cout, (k,), padding="SAME")
    v = ref.init(jax.random.PRNGKey(1), x)
    want = ref.apply(v, x)
    got = conv1d_im2col(x, v["params"]["kernel"], v["params"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("k,d", [(3, 2), (5, 3), (3, 1)])
def test_dilated_matches_nn_conv(k, d):
    B, T, Cin, Cout = 2, 32, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, Cin))
    ref = nn.Conv(Cout, (k,), padding="SAME", kernel_dilation=(d,))
    v = ref.init(jax.random.PRNGKey(1), x)
    want = ref.apply(v, x)
    got = conv1d_im2col(x, v["params"]["kernel"], v["params"]["bias"],
                        dilation=d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
