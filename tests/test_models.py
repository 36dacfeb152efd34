import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adamml_tpu.models.resnet_tsn import ResNetTSN
from adamml_tpu.models.mobilenet_v2 import MobileNetV2
from adamml_tpu.models.policy_net import PolicyNet
from adamml_tpu.models.joint_net import JointMainNet
from adamml_tpu.models.adamml import AdaMML, split_modalities


def n_params(variables):
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(variables["params"]))


def assert_binary(x, tol=1e-5):
    """Straight-through decisions are y_hard + y_soft - stop_grad(y_soft):
    exactly 0/1 up to float addition rounding."""
    x = np.asarray(x)
    assert np.all((np.abs(x) < tol) | (np.abs(x - 1.0) < tol)), x


def init_rngs(seed=0):
    k = jax.random.PRNGKey(seed)
    return {"params": k, "gumbel": jax.random.fold_in(k, 1),
            "dropout": jax.random.fold_in(k, 2),
            "policy": jax.random.fold_in(k, 3)}


class TestResNetTSN:
    def test_param_count_matches_torchvision_resnet50(self):
        # torchvision resnet50 (1000 classes) has 25,557,032 params; identical
        # conv/bn/fc shapes => identical count (structural parity check).
        model = ResNetTSN(depth=50, num_classes=1000)
        v = model.init(init_rngs(), jnp.zeros((1, 1, 32, 32, 3)), train=False)
        assert n_params(v) == 25557032

    def test_param_count_resnet18(self):
        model = ResNetTSN(depth=18, num_classes=1000)
        v = model.init(init_rngs(), jnp.zeros((1, 1, 32, 32, 3)), train=False)
        assert n_params(v) == 11689512

    def test_frame_chain_and_logits_shape(self):
        model = ResNetTSN(depth=18, num_classes=7)
        x = jnp.zeros((2, 8, 64, 64, 3))
        v = model.init(init_rngs(), x, train=False)
        out = model.apply(v, x, train=False)
        assert out.shape == (2, 7)
        feat = model.apply(v, x, train=False, features=True)
        # 8 frames -> 4 -> 2 -> 1 (reference models/resnet.py:145-154)
        assert feat.shape[1] == 1

    def test_without_t_stride_keeps_frames(self):
        model = ResNetTSN(depth=18, num_classes=7, without_t_stride=True)
        x = jnp.zeros((1, 4, 64, 64, 3))
        v = model.init(init_rngs(), x, train=False)
        feat = model.apply(v, x, train=False, features=True)
        assert feat.shape[1] == 4

    def test_remat_stages_identical_tree_and_grads(self):
        """Stage-selective remat (--remat_stages) is a pure memory/compute
        trade: same param tree, bit-identical gradients."""
        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 4, 32, 32, 3), jnp.float32)
        m0 = ResNetTSN(depth=18, num_classes=5)
        m1 = ResNetTSN(depth=18, num_classes=5, remat_stages=(1, 2))
        v0 = m0.init(init_rngs(), x, train=True)
        v1 = m1.init(init_rngs(), x, train=True)
        assert (jax.tree_util.tree_structure(v0)
                == jax.tree_util.tree_structure(v1))

        def loss(m, v):
            def f(p):
                out, _ = m.apply(
                    {"params": p, "batch_stats": v["batch_stats"]}, x,
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(1)})
                return jnp.sum(out ** 2)
            return jax.grad(f)(v["params"])

        g0 = jax.tree_util.tree_leaves(loss(m0, v0))
        g1 = jax.tree_util.tree_leaves(loss(m1, v1))
        for a, b in zip(g0, g1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_updates_batch_stats(self):
        model = ResNetTSN(depth=18, num_classes=7)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 32, 32, 3))
        v = model.init(init_rngs(), x, train=True)
        out, updates = model.apply(v, x, train=True,
                                   mutable=["batch_stats"],
                                   rngs={"dropout": jax.random.PRNGKey(1)})
        old = jax.tree_util.tree_leaves(v["batch_stats"])
        new = jax.tree_util.tree_leaves(updates["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(old, new))


class TestMobileNetV2:
    def test_param_count_matches_torchvision(self):
        model = MobileNetV2(num_classes=1000)
        v = model.init(init_rngs(), jnp.zeros((1, 1, 32, 32, 3)), train=False)
        assert n_params(v) == 3504872

    def test_logits_and_features(self):
        model = MobileNetV2(num_classes=9)
        x = jnp.zeros((2, 1, 64, 64, 1))  # sound-like single channel
        v = model.init(init_rngs(), x, train=False)
        out = model.apply(v, x, train=False)
        assert out.shape == (2, 9)
        f = model.apply(v, x, train=False, features=True)
        assert f.shape == (2, 1, 1280)

    def test_policy_variant_temporal_pooling(self):
        model = MobileNetV2(num_classes=9, temporal_pooling=True)
        x = jnp.zeros((2, 4, 64, 64, 3))
        v = model.init(init_rngs(), x, train=False)
        f = model.apply(v, x, train=False, features=True)
        # 4 frames -> 2 (c=64 stage) -> 1 (c=160 stage)
        # (reference models/policy_net.py:120-130)
        assert f.shape == (2, 1, 1280)

    def test_temporal_pooling_flag_adds_no_params(self):
        a = MobileNetV2(num_classes=5, temporal_pooling=True)
        b = MobileNetV2(num_classes=5, temporal_pooling=False)
        va = a.init(init_rngs(), jnp.zeros((1, 4, 32, 32, 3)), train=False)
        vb = b.init(init_rngs(), jnp.zeros((1, 4, 32, 32, 3)), train=False)
        assert n_params(va) == n_params(vb)


class TestPolicyNet:
    def _inputs(self, n=2, s=3):
        rgb = jnp.zeros((n, s, 4, 48, 48, 3))
        snd = jnp.zeros((n, s, 1, 64, 64, 1))
        return [rgb, snd]

    def test_lstm_shapes(self):
        model = PolicyNet(modality=("rgb", "sound"), causality_modeling="lstm")
        x = self._inputs()
        v = model.init(init_rngs(), x, 5.0, train=False)
        dec, logits = model.apply(v, x, 5.0, train=False,
                                  rngs={"gumbel": jax.random.PRNGKey(7)})
        assert dec.shape == (3, 2, 2)      # (S, M, N)
        assert logits.shape == (3, 2, 2, 2)
        assert_binary(dec)

    def test_no_causality_shapes(self):
        model = PolicyNet(modality=("rgb", "sound"), causality_modeling=None)
        x = self._inputs()
        v = model.init(init_rngs(), x, 5.0, train=False)
        dec, logits = model.apply(v, x, 5.0, train=False,
                                  rngs={"gumbel": jax.random.PRNGKey(7)})
        assert dec.shape == (3, 2, 2)
        assert logits.shape == (3, 2, 2, 2)

    def test_lstm_param_shapes_match_torch_lstmcell(self):
        model = PolicyNet(modality=("rgb", "sound"), causality_modeling="lstm")
        x = self._inputs()
        v = model.init(init_rngs(), x, 5.0, train=False)
        lstm = v["params"]["lstm"]
        # torch LSTMCell(2048 + 2*M, 256): weight_ih (1024, 2052) -> flax
        # kernel (2052, 1024)
        assert lstm["ih"]["kernel"].shape == (2048 + 4, 4 * 256)
        assert lstm["hh"]["kernel"].shape == (256, 4 * 256)
        assert lstm["fc_0"]["kernel"].shape == (256, 2)

    def test_gumbel_rng_varies_over_segments(self):
        """Each scan step must draw fresh gumbel noise."""
        model = PolicyNet(modality=("rgb",), causality_modeling=None)
        n, s = 64, 2
        x = [jnp.zeros((n, s, 2, 48, 48, 3))]
        v = model.init(init_rngs(), x, 5.0, train=False)
        dec, _ = model.apply(v, x, 5.0, train=False,
                             rngs={"gumbel": jax.random.PRNGKey(0)})
        d = np.asarray(dec)  # (S, 1, N)
        assert not np.array_equal(d[0], d[1])


class TestJointMainNet:
    def test_logits_fusion_with_decisions(self):
        model = JointMainNet(modality=("rgb", "sound"), depth=18, num_classes=5)
        rgb = jnp.zeros((4, 2, 48, 48, 3))
        snd = jnp.zeros((4, 1, 64, 64, 1))
        v = model.init(init_rngs(), [rgb, snd], None, train=False)
        dec = jnp.asarray([[1., 1., 0., 0.], [1., 0., 1., 0.]])
        out = model.apply(v, [rgb, snd], dec, train=False)
        assert out.shape == (4, 5)
        # all-off sample -> exactly zero logits in mean fusion
        np.testing.assert_allclose(np.asarray(out)[3], 0.0, atol=1e-6)

    def test_learnable_lf_weights_init_and_sum(self):
        model = JointMainNet(modality=("rgb", "sound"), depth=18,
                             num_classes=5, learnable_lf_weights=True)
        rgb = jnp.zeros((2, 2, 48, 48, 3))
        snd = jnp.zeros((2, 1, 64, 64, 1))
        v = model.init(init_rngs(), [rgb, snd], None, train=False)
        lf = np.asarray(v["params"]["lf_weights"])
        assert lf.shape == (1,)
        np.testing.assert_allclose(lf, 0.5)

    def test_eval_capacity_packing_matches_full_run(self):
        """Packed conditional execution must equal the full masked run when
        the selected rows fit within capacity."""
        rgb = jax.random.normal(jax.random.PRNGKey(0), (8, 2, 48, 48, 3))
        snd = jax.random.normal(jax.random.PRNGKey(1), (8, 1, 64, 64, 1))
        dec = jnp.asarray([[1., 0., 0., 1., 0., 0., 1., 0.],
                           [0., 1., 0., 0., 1., 0., 0., 0.]])  # <= 3 of 8 on
        full = JointMainNet(modality=("rgb", "sound"), depth=18,
                            num_classes=5, dropout=0.0)
        packed = JointMainNet(modality=("rgb", "sound"), depth=18,
                              num_classes=5, dropout=0.0, eval_capacity=0.5)
        v = full.init(init_rngs(), [rgb, snd], None, train=False)
        out_full = full.apply(v, [rgb, snd], dec, train=False)
        out_packed = packed.apply(v, [rgb, snd], dec, train=False)
        np.testing.assert_allclose(np.asarray(out_packed),
                                   np.asarray(out_full), rtol=2e-3, atol=2e-3)

    def test_eval_capacity_drops_over_capacity_rows(self):
        rgb = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 48, 48, 3))
        dec = jnp.asarray([[1., 1., 1., 1.]])  # all on, capacity 0.5 -> 2 run
        packed = JointMainNet(modality=("rgb",), depth=18, num_classes=5,
                              dropout=0.0, eval_capacity=0.5)
        v = packed.init(init_rngs(), [rgb], None, train=False)
        out = np.asarray(packed.apply(v, [rgb], dec, train=False))
        # exactly 2 rows got logits; the rest degraded to zeros
        nonzero_rows = (np.abs(out).sum(axis=1) > 0).sum()
        assert nonzero_rows == 2

    def test_fc2_rejects_decisions(self):
        model = JointMainNet(modality=("rgb",), depth=18, num_classes=5,
                             fusion_point="fc2")
        rgb = jnp.zeros((2, 2, 48, 48, 3))
        v = model.init(init_rngs(), [rgb], None, train=False)
        with pytest.raises(ValueError):
            model.apply(v, [rgb], jnp.ones((1, 2)), train=False)

    def test_fc2_shapes(self):
        model = JointMainNet(modality=("rgb", "sound"), depth=18,
                             num_classes=5, fusion_point="fc2")
        rgb = jnp.zeros((2, 2, 48, 48, 3))
        snd = jnp.zeros((2, 1, 64, 64, 1))
        v = model.init(init_rngs(), [rgb, snd], None, train=False)
        out = model.apply(v, [rgb, snd], None, train=False,
                          rngs={"dropout": jax.random.PRNGKey(0)})
        assert out.shape == (2, 5)


class TestAdaMML:
    def test_split_modalities_proxy_rule(self):
        p, m = split_modalities(("rgb", "flow", "rgbdiff", "sound"))
        assert p == ("rgb", "rgbdiff", "sound")
        assert m == ("rgb", "flow", "sound")
        p, m = split_modalities(("rgb", "sound"))
        assert p == m == ("rgb", "sound")

    def _model_and_inputs(self, rng_policy=False):
        model = AdaMML(modality=("rgb", "sound"), num_classes=6, depth=18,
                       causality_modeling="lstm", rng_policy=rng_policy,
                       policy_input_size=32)
        n, s = 2, 3
        rgb = jax.random.normal(jax.random.PRNGKey(0), (n, s, 4, 48, 48, 3))
        snd = jax.random.normal(jax.random.PRNGKey(1), (n, s, 1, 64, 64, 1))
        return model, [rgb, snd]

    def test_forward_shapes(self):
        model, x = self._model_and_inputs()
        v = model.init(init_rngs(), x, 5.0, train=False)
        logits, dec = model.apply(
            v, x, 5.0, train=False,
            rngs={"gumbel": jax.random.PRNGKey(2)})
        assert logits.shape == (2, 6)
        assert dec.shape == (2, 3, 2)  # (N, S, M)
        assert_binary(dec)

    def test_rng_policy_baseline(self):
        model, x = self._model_and_inputs(rng_policy=True)
        v = model.init(init_rngs(), x, 5.0, train=False)
        # no policy_net params when rng baseline is active
        assert "policy_net" not in v["params"]
        logits, dec = model.apply(v, x, 5.0, train=False,
                                  rngs={"policy": jax.random.PRNGKey(3)})
        assert logits.shape == (2, 6)
        assert_binary(dec)

    def test_decisions_gate_segment_logits(self):
        """With all decisions OFF, final logits must be exactly zero
        (logits-mode masking, reference joint_resnet_mobilenetv2.py:92-94)."""
        model = AdaMML(modality=("rgb", "sound"), num_classes=6, depth=18,
                       rng_policy=True, rng_threshold=1.1,  # uniform <= 1 < 1.1 -> all off
                       policy_input_size=32)
        n, s = 2, 2
        x = [jax.random.normal(jax.random.PRNGKey(0), (n, s, 4, 48, 48, 3)),
             jax.random.normal(jax.random.PRNGKey(1), (n, s, 1, 64, 64, 1))]
        v = model.init(init_rngs(), x, 5.0, train=False)
        logits, dec = model.apply(v, x, 5.0, train=False,
                                  rngs={"policy": jax.random.PRNGKey(3)})
        assert np.all(np.asarray(dec) == 0.0)
        np.testing.assert_allclose(np.asarray(logits), 0.0, atol=1e-6)
