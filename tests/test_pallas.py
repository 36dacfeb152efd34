"""Fused depthwise kernel: math and VJP parity.

On the CPU test backend the op falls back to its XLA composition, so these
tests pin the custom-VJP math (forward/backward agreement with plain autodiff
of the unfused composition). The Pallas TPU path is exercised by
tools/bench_depthwise.py on real hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adamml_tpu.ops.pallas.depthwise import depthwise_conv3x3


def _reference(x, w, scale, bias, stride, relu6):
    c = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x, w.reshape(3, 3, 1, c), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        preferred_element_type=jnp.float32)
    out = out * scale + bias
    if relu6:
        out = jnp.clip(out, 0.0, 6.0)
    return out.astype(x.dtype)


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32))


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("relu6", [False, True])
@pytest.mark.parametrize("hw", [(8, 8), (9, 11)])
def test_forward_matches_reference(stride, relu6, hw):
    h, w_ = hw
    x = _rand((2, h, w_, 16), 0)
    w = _rand((3, 3, 16), 1)
    scale = _rand((16,), 2) * 0.1 + 1.0
    bias = _rand((16,), 3) * 0.1
    got = depthwise_conv3x3(x, w, stride=stride, scale=scale, bias=bias,
                            relu6=relu6)
    want = _reference(x, w, scale, bias, stride, relu6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("relu6", [False, True])
def test_vjp_matches_autodiff(stride, relu6):
    x = _rand((2, 8, 8, 8), 4)
    w = _rand((3, 3, 8), 5)
    scale = _rand((8,), 6) * 0.1 + 1.0
    bias = _rand((8,), 7) * 0.1

    def loss_fused(x, w, s, b):
        out = depthwise_conv3x3(x, w, stride=stride, scale=s, bias=b,
                                relu6=relu6)
        return jnp.sum(out * jnp.cos(out.astype(jnp.float32)))

    def loss_ref(x, w, s, b):
        out = _reference(x, w, s, b, stride, relu6)
        return jnp.sum(out * jnp.cos(out.astype(jnp.float32)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_defaults_identity_affine():
    x = _rand((1, 6, 6, 8), 8)
    w = _rand((3, 3, 8), 9)
    got = depthwise_conv3x3(x, w)
    want = _reference(x, w, jnp.ones((8,)), jnp.zeros((8,)), 1, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
