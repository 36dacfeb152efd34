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


class TestFusedTPool:
    """ops/pallas/tpool_fused: on CPU the op runs its jnp reference
    composition; these tests pin the ALGEBRA (grouped affine mapping, pool
    semantics, custom VJP) that the TPU kernel was verified bit-exact
    against on hardware (BENCH.md round 3)."""

    def _args(self, n=8, f=4, h=8, w=8, c=16, r=2, s=2):
        import jax
        import jax.numpy as jnp

        k = jax.random.PRNGKey(0)
        y = jax.random.normal(k, (n, f, h, w, c), jnp.float32)
        ident = jax.random.normal(jax.random.fold_in(k, 1),
                                  (n, f, h, w, c), jnp.float32)
        a = jax.random.normal(jax.random.fold_in(k, 2), (r, s, c)) * 0.3 + 1.0
        b = jax.random.normal(jax.random.fold_in(k, 3), (r, s, c)) * 0.1
        return y, ident, a, b

    def test_matches_unfused_grouped_composition(self):
        """reference_impl == GroupedBatchNorm-style grouped affine + add +
        relu + temporal_pool, with the interleaved (clips, segments) row
        mapping."""
        import numpy as np
        import jax.numpy as jnp
        from adamml_tpu.ops.pallas.tpool_fused import (
            fused_bn_add_relu_tpool, reference_impl)
        from adamml_tpu.ops.temporal import temporal_pool

        y, ident, a, b = self._args()
        n = y.shape[0]
        r, s, c = a.shape
        # manual: per-row affine via explicit row -> (replica, segment) map
        z = np.asarray(y, np.float32).copy()
        for row in range(n):
            p, seg = row // (n // r), row % s
            z[row] = z[row] * np.asarray(a)[p, seg] + np.asarray(b)[p, seg]
        z = np.maximum(z + np.asarray(ident, np.float32), 0.0)
        want = np.asarray(temporal_pool(jnp.asarray(z), 3, 2, "max"))
        got = np.asarray(fused_bn_add_relu_tpool(y, ident, a, b))
        np.testing.assert_allclose(got, want, atol=1e-6)
        np.testing.assert_allclose(np.asarray(reference_impl(y, ident, a, b)),
                                   want, atol=1e-6)

    def test_custom_vjp_matches_composition_grads(self):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from adamml_tpu.ops.pallas.tpool_fused import (
            fused_bn_add_relu_tpool, reference_impl)

        y, ident, a, b = self._args(n=4, f=2, h=4, w=4, c=8, r=1, s=2)

        def loss(fn):
            return lambda *args: jnp.sum(fn(*args) ** 2)

        gf = jax.grad(loss(fused_bn_add_relu_tpool), argnums=(0, 1, 2, 3))
        gr = jax.grad(loss(reference_impl), argnums=(0, 1, 2, 3))
        for x1, x2 in zip(gf(y, ident, a, b), gr(y, ident, a, b)):
            np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                                       atol=1e-6)

    @pytest.mark.parametrize("shape", [
        dict(n=8, f=4, h=8, w=8, c=16, r=2, s=2),
        dict(n=6, f=8, h=8, w=8, c=16, r=1, s=3),
        dict(n=4, f=2, h=8, w=8, c=8, r=1, s=1),
    ])
    def test_pallas_bwd_kernel_matches_vjp(self, shape):
        """The Pallas backward kernel (interpret mode on CPU) == jax.vjp of
        the f32 composition: dy/dident/da/db, incl. grouped affines and the
        first-max tie routing of reduce_window's VJP."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from adamml_tpu.ops.pallas.tpool_fused import (_out_frames,
                                                       _pallas_bwd,
                                                       reference_impl)

        y, ident, a, b = self._args(**shape)
        n, f, h, w, c = y.shape
        ct = jax.random.normal(jax.random.PRNGKey(9),
                               (n, _out_frames(f), h, w, c), jnp.float32)
        out, vjp = jax.vjp(reference_impl, y, ident, a, b)
        want = vjp(ct)
        got = _pallas_bwd(y, ident, a, b, ct, interpret=True)
        for g1, g2, name in zip(got, want, ("dy", "dident", "da", "db")):
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                       rtol=1e-5, atol=1e-5, err_msg=name)

    def test_pallas_bwd_kernel_tie_routing(self):
        """Engineered positive ties across frames: the kernel must send the
        cotangent to the FIRST max in window order, like reduce_window max."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from adamml_tpu.ops.pallas.tpool_fused import (_out_frames,
                                                       _pallas_bwd,
                                                       reference_impl)

        n, f, h, w, c = 2, 4, 8, 8, 8
        frame = jax.random.normal(jax.random.PRNGKey(0), (n, 1, h, w, c))
        y = jnp.tile(jnp.abs(frame) + 0.5, (1, f, 1, 1, 1))  # all frames tie
        ident = jnp.zeros_like(y)
        a = jnp.ones((1, 1, c))
        b = jnp.zeros((1, 1, c))
        ct = jax.random.normal(jax.random.PRNGKey(1),
                               (n, _out_frames(f), h, w, c), jnp.float32)
        _, vjp = jax.vjp(reference_impl, y, ident, a, b)
        want = vjp(ct)
        got = _pallas_bwd(y, ident, a, b, ct, interpret=True)
        for g1, g2, name in zip(got, want, ("dy", "dident", "da", "db")):
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                       rtol=1e-5, atol=1e-5, err_msg=name)

    def test_resnet_fused_matches_unfused(self):
        """ResNetTSN with fused_tpool on/off: identical param tree and
        matching outputs in train mode (CPU fallback path exercises the
        exact grouping algebra the TPU kernel implements)."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from adamml_tpu.models.resnet_tsn import ResNetTSN

        x = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 64, 64, 3))
        rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
        m1 = ResNetTSN(depth=18, num_classes=5, fused_tpool=True,
                       bn_seq_groups=2, dtype=jnp.float32, dropout=0.0)
        m2 = ResNetTSN(depth=18, num_classes=5, fused_tpool=False,
                       bn_seq_groups=2, dtype=jnp.float32, dropout=0.0)
        v1 = m1.init(rngs, x, train=True)
        v2 = m2.init(rngs, x, train=True)
        t1 = jax.tree_util.tree_structure(v1)
        t2 = jax.tree_util.tree_structure(v2)
        assert t1 == t2, "fused_tpool must not change the param tree"
        o1, mut1 = m1.apply(v1, x, train=True, mutable=["batch_stats"])
        o2, mut2 = m2.apply(v1, x, train=True, mutable=["batch_stats"])
        # BN renormalization amplifies the fused path's reassociated affine
        # (a*x+b vs (x-mean)*rsqrt*scale+bias, ~1e-6/layer) through deep
        # stacks on small test batches; the algebra itself is pinned exactly
        # by the block-level tests above.
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-2, atol=2e-3)
        jax.tree_util.tree_map(
            lambda s1, s2: np.testing.assert_allclose(
                np.asarray(s1), np.asarray(s2), rtol=1e-2, atol=2e-3),
            mut1, mut2)


class TestFusedTPoolHWNFC:
    """Layout-native (H, W, N, F, C) kernel variant (round 5): must be
    bit-equal to the proven 5D kernels -- same affine row mapping, same
    pool windows, same first-max tie routing. Called directly (the
    dispatch gate requires a single device and F % 8 == 0; tests run on
    the 8-device CPU mesh)."""

    def _args(self, n=4, f=8, h=4, w=4, c=128, r=1, s=2):
        import jax
        import jax.numpy as jnp

        k = jax.random.PRNGKey(42)
        y = jax.random.normal(k, (n, f, h, w, c), jnp.float32)
        ident = jax.random.normal(jax.random.fold_in(k, 1),
                                  (n, f, h, w, c), jnp.float32)
        a = jax.random.normal(jax.random.fold_in(k, 2), (r, s, c)) * 0.3 + 1.0
        b = jax.random.normal(jax.random.fold_in(k, 3), (r, s, c)) * 0.1
        return y, ident, a, b

    @pytest.mark.parametrize("shape", [
        dict(n=4, f=8, h=4, w=4, c=128, r=1, s=2),
        dict(n=8, f=8, h=4, w=4, c=128, r=2, s=2),
        dict(n=5, f=8, h=4, w=6, c=128, r=1, s=5),
        dict(n=4, f=4, h=4, w=4, c=128, r=1, s=2),  # stage-2 frame count
        dict(n=4, f=2, h=4, w=4, c=128, r=1, s=2),  # stage-3 frame count
    ])
    def test_fwd_matches_reference(self, shape):
        import numpy as np
        from adamml_tpu.ops.pallas.tpool_fused import (_pallas_fwd_hwnfc,
                                                       reference_impl)

        y, ident, a, b = self._args(**shape)
        want = np.asarray(reference_impl(y, ident, a, b))
        got = np.asarray(_pallas_fwd_hwnfc(y, ident, a, b, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-6)

    @pytest.mark.parametrize("shape", [
        dict(n=4, f=8, h=4, w=4, c=128, r=1, s=2),
        dict(n=8, f=8, h=4, w=4, c=128, r=2, s=2),
        dict(n=4, f=4, h=4, w=4, c=128, r=1, s=2),
        dict(n=4, f=2, h=4, w=4, c=128, r=1, s=2),
    ])
    def test_bwd_matches_5d_kernel(self, shape):
        """dpre and the per-row (N, 2, C) affine partials must match the
        proven 5D backward kernel exactly (same contract, same routing)."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from adamml_tpu.ops.pallas.tpool_fused import (_bwd_core, _bwd_hwnfc,
                                                       _out_frames)

        y, ident, a, b = self._args(**shape)
        n, f, h, w, c = y.shape
        ct = jax.random.normal(jax.random.PRNGKey(9),
                               (n, _out_frames(f), h, w, c), jnp.float32)
        want = _bwd_core(y, ident, a, b, ct, interpret=True)
        got = _bwd_hwnfc(y, ident, a, b, ct, interpret=True)
        for g1, g2, name in zip(got, want, ("dpre", "dab")):
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                       rtol=1e-5, atol=1e-5, err_msg=name)

    def test_bwd_tie_routing_matches_vjp(self):
        """Positive cross-frame ties: cotangent to the FIRST max in window
        order, exactly like reduce_window max's VJP."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from adamml_tpu.ops.pallas.tpool_fused import (_bwd_hwnfc,
                                                       _out_frames,
                                                       reference_impl)

        n, f, h, w, c = 2, 8, 4, 4, 128
        frame = jax.random.normal(jax.random.PRNGKey(0), (n, 1, h, w, c))
        y = jnp.tile(jnp.abs(frame) + 0.5, (1, f, 1, 1, 1))
        ident = jnp.zeros_like(y)
        a = jnp.ones((1, 1, c))
        b = jnp.zeros((1, 1, c))
        ct = jax.random.normal(jax.random.PRNGKey(1),
                               (n, _out_frames(f), h, w, c), jnp.float32)
        _, vjp = jax.vjp(reference_impl, y, ident, a, b)
        want_dy, want_did, want_da, want_db = vjp(ct)
        dpre, dab = _bwd_hwnfc(y, ident, a, b, ct, interpret=True)
        # dpre IS dident; dy = dpre * a (identity affine here); da/db from
        # the per-row partials summed over rows (one global group)
        np.testing.assert_allclose(np.asarray(dpre), np.asarray(want_did),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dpre), np.asarray(want_dy),
                                   rtol=1e-5, atol=1e-5)  # a == 1
        np.testing.assert_allclose(np.asarray(dab[:, 0].sum(0))[None, None],
                                   np.asarray(want_da), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dab[:, 1].sum(0))[None, None],
                                   np.asarray(want_db), rtol=1e-4, atol=1e-4)

    def test_gate_conditions(self):
        """_hwnfc_ok: single device + (N*F, C) tileable (the rank-4 kernel
        interface is byte-identical for any 8-row-aligned N*F and whole-lane
        C) + a tile-aligned NF-axis block under the backward VMEM budget."""
        import jax
        import jax.numpy as jnp
        from adamml_tpu.ops.pallas import tpool_fused as tf

        y8 = jnp.zeros((4, 8, 4, 4, 128), jnp.bfloat16)
        a = jnp.zeros((1, 2, 128))
        # the CPU test mesh has 8 devices -> gate is off; force the device
        # condition aside to test the shape conditions
        assert not tf._hwnfc_ok(y8, a)  # multi-device mesh
        if jax.device_count() == 1:  # pragma: no cover - not on test mesh
            assert tf._hwnfc_ok(y8, a)
        # all three stage-boundary shapes satisfy the shape gate at BOTH
        # flagship batches -- batch 24's stage 1 (120*8*256 = 245,760)
        # exceeded the old whole-NF budget and is now blocked along NF
        for n, f, c in ((80, 8, 256), (80, 4, 512), (80, 2, 1024),
                        (120, 8, 256), (120, 4, 512), (120, 2, 1024)):
            assert tf._hwnfc_shape_ok(n, f, c), (n, f, c)
            nb = tf._nf_block(n, f, c, tf._HWNFC_BWD_BUDGET)
            assert nb >= 1 and n % nb == 0
            assert nb * f * c <= tf._HWNFC_BWD_BUDGET
            fo = tf._out_frames(f)
            assert nb == n or ((nb * f) % 8 == 0 and (nb * fo) % 8 == 0)
        # lane misalignment and the kill switch still gate off
        assert not tf._hwnfc_shape_ok(4, 8, 120)
        import os
        os.environ["ADAMML_NO_TPOOL_HWNFC"] = "1"
        try:
            assert not tf._hwnfc_shape_ok(80, 8, 256)
        finally:
            del os.environ["ADAMML_NO_TPOOL_HWNFC"]

    @pytest.mark.parametrize("shape,budget", [
        # budgets chosen to force nb < n (NF-axis grid blocking) on CPU-
        # sized tensors (nb == n is budget-bound too but tile-exempt, so
        # the budget must exclude it): nb=2 blocks of 2*8*128=2048 elems
        (dict(n=4, f=8, h=4, w=4, c=128, r=1, s=2), 2048),
        (dict(n=8, f=8, h=4, w=4, c=128, r=2, s=2), 2048),
        (dict(n=8, f=4, h=4, w=4, c=128, r=1, s=2), 2048),
    ])
    def test_nf_blocking_matches_whole(self, shape, budget, monkeypatch):
        """nb < n (grid over the NF axis) must be bit-equal to the whole-NF
        kernel AND the jnp reference -- fwd and bwd."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from adamml_tpu.ops.pallas import tpool_fused as tf

        y, ident, a, b = self._args(**shape)
        n, f, h, w, c = y.shape
        nb = tf._nf_block(n, f, c, budget)
        assert 1 <= nb < n  # the point of the test: blocking is active
        want_fwd = np.asarray(tf.reference_impl(y, ident, a, b))
        ct = jax.random.normal(jax.random.PRNGKey(9),
                               (n, tf._out_frames(f), h, w, c), jnp.float32)
        want_bwd = tf._bwd_core(y, ident, a, b, ct, interpret=True)
        monkeypatch.setattr(tf, "_HWNFC_FWD_BUDGET", budget)
        monkeypatch.setattr(tf, "_HWNFC_BWD_BUDGET", budget)
        got_fwd = np.asarray(tf._pallas_fwd_hwnfc(y, ident, a, b,
                                                  interpret=True))
        np.testing.assert_allclose(got_fwd, want_fwd, atol=1e-6)
        got_bwd = tf._bwd_hwnfc(y, ident, a, b, ct, interpret=True)
        for g1, g2, name in zip(got_bwd, want_bwd, ("dpre", "dab")):
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                       rtol=1e-5, atol=1e-5, err_msg=name)
