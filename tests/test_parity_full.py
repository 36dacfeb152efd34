"""Golden numerical parity: FULL AdaMML forward vs the torch reference.

Builds the actual reference model (/root/reference, imported, never copied),
converts its randomly-initialized weights into the flax AdaMML via
ckpt.torch_convert, feeds both the SAME clip batch, and requires the policy
trace (LSTM over segments), decisions, masked fused logits, and the final
segment-mean prediction to agree within fp tolerance (VERDICT round-1
item 10; reference models/adamml.py:69-91).

Gumbel noise is the one non-deterministic ingredient shared by neither
framework's RNG, so both sides run with noise-free straight-through
decisions (hard argmax == gumbel_softmax with zero noise); everything else
-- policy trunks, joint MLP, LSTM recurrence with logits feedback, ResNet
TSN, sound MobileNetV2, learnable late fusion, segment averaging -- is
exercised end to end.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.parity]

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"

import jax
import jax.numpy as jnp

from adamml_tpu.ckpt.torch_convert import (convert_lstm_cell,
                                           convert_mobilenet_v2_state_dict,
                                           convert_resnet_state_dict,
                                           _dense)

N, S, F, HW, K = 2, 2, 4, 64, 7  # batch, segments, frames, rgb size, classes
MODALITY = ["rgb", "sound"]


def _build_reference():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not mounted")
    sys.path.insert(0, REFERENCE)
    try:
        import models.policy_net as ref_pnet

        # the policy trunk constructor downloads ImageNet weights
        # unconditionally (reference models/policy_net.py:193-203); no
        # network egress here -> stub the download with just the first-conv
        # tensor its channel-inflation branch inspects (strict=False load
        # leaves every other randomly-initialized weight in place)
        torch.manual_seed(123)
        stub = {"features.0.0.weight": torch.randn(32, 3, 3, 3)}
        ref_pnet.model_zoo.load_url = lambda *a, **k: dict(stub)
        from models.adamml import adamml as ref_adamml

        torch.manual_seed(0)
        ref = ref_adamml(
            groups=F, modality=MODALITY, input_channels=[3, 1],
            num_segments=S, rng_policy=False, rng_threshold=0.5,
            causality_modeling="lstm", num_classes=K, depth=18,
            without_t_stride=False, dropout=0.5, pooling_method="max",
            fusion_point="logits", unimodality_pretrained=[],
            learnable_lf_weights=True)
        ref.eval()
        # noise-free straight-through decision: hard argmax (==
        # F.gumbel_softmax(hard=True) with zero gumbel noise)
        ref.policy_net.wrapper_gumbel_softmax = (
            lambda logits: (logits.argmax(dim=-1) == 1).float())
        return ref
    finally:
        sys.path.remove(REFERENCE)


def _sub(sd, prefix):
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _convert_full(ref):
    """Reference state_dict -> flax AdaMML {params, batch_stats}."""
    # .copy(): torch .numpy() returns a VIEW of the tensor storage; without
    # it, training the torch model in place would mutate the converted flax
    # params too (burned the training-parity test in round 3)
    sd = {k: v.detach().cpu().numpy().copy()
          for k, v in ref.state_dict().items()}
    params = {"policy_net": {}, "main_net": {}}
    stats = {"policy_net": {}, "main_net": {}}

    # policy trunks (d-li14 layout, reference models/policy_net.py:98-203)
    for i, m in enumerate(MODALITY):
        bp, bs = convert_mobilenet_v2_state_dict(
            _sub(sd, f"policy_net.joint_net.nets.{i}."), layout="d-li14",
            input_channels=3 if m == "rgb" else 1, include_head=False)
        params["policy_net"][f"net_{m}"] = bp
        stats["policy_net"][f"net_{m}"] = bs
    # joint MLP (reference models/policy_net.py:228-231)
    for ours, theirs in (("joint_fc1", "joint.0"), ("joint_fc2", "joint.2")):
        params["policy_net"][ours] = {
            "kernel": _dense(sd[f"policy_net.joint_net.{theirs}.weight"]),
            "bias": sd[f"policy_net.joint_net.{theirs}.bias"]}
    # LSTM cell + per-modality decision heads live under the scanned cell
    lstm = convert_lstm_cell(_sub(sd, "policy_net."), prefix="lstm")
    for i in range(len(MODALITY)):
        lstm[f"fc_{i}"] = {"kernel": _dense(sd[f"policy_net.fcs.{i}.weight"]),
                           "bias": sd[f"policy_net.fcs.{i}.bias"]}
    params["policy_net"]["lstm"] = lstm

    # main-net backbones (reference joint_resnet_mobilenetv2.py:26-46)
    for i, m in enumerate(MODALITY):
        sub = _sub(sd, f"main_net.nets.{i}.")
        if m == "sound":
            bp, bs = convert_mobilenet_v2_state_dict(
                sub, layout="torchvision", input_channels=1)
        else:
            bp, bs = convert_resnet_state_dict(sub, depth=18,
                                               input_channels=3)
        params["main_net"][f"net_{m}"] = bp
        stats["main_net"][f"net_{m}"] = bs
    params["main_net"]["lf_weights"] = sd["main_net.lf_weights"].reshape(-1)
    return params, stats


def _make_inputs(rng):
    """(our input list, reference input list) from one numpy draw."""
    rgb = rng.randn(N, S, F, HW, HW, 3).astype(np.float32)
    spec = rng.randn(N, S, 1, 256, 256, 1).astype(np.float32)
    ours = [jnp.asarray(rgb), jnp.asarray(spec)]
    # reference rgb: (N, S*F*C, H, W), channel-last -> (S, F, C) packing
    # (reference utils/video_transforms.py Stack + data_layer view)
    t_rgb = torch.from_numpy(
        np.transpose(rgb, (0, 1, 2, 5, 3, 4)).reshape(N, S * F * 3, HW, HW))
    # reference sound TRAIN layout: segments stacked along width, chunked in
    # data_layer (reference models/adamml.py:47-53)
    t_snd = torch.from_numpy(
        np.concatenate([spec[:, i, 0, :, :, 0] for i in range(S)],
                       axis=-1)[:, None])
    return ours, [t_rgb, t_snd]


class TestFullForwardParity:
    @pytest.fixture(scope="class")
    def bundle(self):
        ref = _build_reference()
        params, stats = _convert_full(ref)

        from adamml_tpu.models.adamml import AdaMML

        model = AdaMML(modality=tuple(MODALITY), num_classes=K, depth=18,
                       dropout=0.5, fusion_point="logits",
                       learnable_lf_weights=True, causality_modeling="lstm",
                       policy_input_size=160, dtype=jnp.float32)
        return ref, model, params, stats

    def test_full_forward_matches(self, bundle, monkeypatch):
        ref, model, params, stats = bundle
        from adamml_tpu.models import policy_net as our_pnet

        monkeypatch.setattr(
            our_pnet, "gumbel_decision",
            lambda rng, logits, tau: (jnp.argmax(logits, -1) == 1).astype(
                jnp.float32))

        ours_in, ref_in = _make_inputs(np.random.RandomState(3))
        with torch.no_grad():
            ref_logits, ref_dec = ref(ref_in, S)

        logits, decisions = model.apply(
            {"params": params, "batch_stats": stats}, ours_in, 5.0,
            train=False, rngs={"gumbel": jax.random.PRNGKey(0)})

        np.testing.assert_array_equal(np.asarray(decisions),
                                      ref_dec.numpy())  # (N, S, M) 0/1
        np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                                   rtol=1e-3, atol=2e-3)

    def test_init_shapes_match_converted(self, bundle):
        """Our random init produces the exact tree the converter fills."""
        ref, model, params, stats = bundle
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "gumbel": jax.random.PRNGKey(1)},
            _make_inputs(np.random.RandomState(0))[0], train=False)

        def shapes(t):
            return jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), t)

        assert shapes(variables["params"]) == shapes(params)
        assert shapes(variables["batch_stats"]) == shapes(stats)
