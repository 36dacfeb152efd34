"""Checkpoint + torch-weight-conversion tests.

The conversion tests build torch models with torchvision's exact state-dict
key layout (written here independently as test oracles), convert their
random weights into the flax models, and require NUMERIC agreement of the
forward pass -- the strongest structural parity check available without
network access to the real pretrained weights.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
from torch import nn

from adamml_tpu.ckpt.torch_convert import (convert_mobilenet_v2_state_dict,
                                           convert_resnet_state_dict,
                                           convert_lstm_cell,
                                           inflate_first_conv)
from adamml_tpu.models.mobilenet_v2 import MobileNetV2
from adamml_tpu.models.resnet_tsn import ResNetTSN


# ---- torch oracles with torchvision key layout --------------------------

def _torch_basic_block(inp, planes, stride):
    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(inp, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = None
            if stride != 1 or inp != planes:
                self.downsample = nn.Sequential(
                    nn.Conv2d(inp, planes, 1, stride, bias=False),
                    nn.BatchNorm2d(planes))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + idt)

    return Block()


class TorchResNet18(nn.Module):
    def __init__(self, num_classes=6):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        chans = [64, 128, 256, 512]
        inp = 64
        for li, c in enumerate(chans):
            blocks = []
            for b in range(2):
                stride = 2 if (li > 0 and b == 0) else 1
                blocks.append(_torch_basic_block(inp, c, stride))
                inp = c
            setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def _torch_convbnrelu(inp, oup, k=3, stride=1, groups=1):
    return nn.Sequential(
        nn.Conv2d(inp, oup, k, stride, (k - 1) // 2, groups=groups,
                  bias=False),
        nn.BatchNorm2d(oup), nn.ReLU6(inplace=True))


def _torch_inverted_residual(inp, oup, stride, expand):
    class IR(nn.Module):
        def __init__(self):
            super().__init__()
            hidden = int(round(inp * expand))
            layers = []
            if expand != 1:
                layers.append(_torch_convbnrelu(inp, hidden, k=1))
            layers.extend([
                _torch_convbnrelu(hidden, hidden, stride=stride,
                                  groups=hidden),
                nn.Conv2d(hidden, oup, 1, 1, 0, bias=False),
                nn.BatchNorm2d(oup)])
            self.conv = nn.Sequential(*layers)
            self.use_res = stride == 1 and inp == oup

        def forward(self, x):
            return x + self.conv(x) if self.use_res else self.conv(x)

    return IR()


class TorchMobileNetV2(nn.Module):
    CFG = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]

    def __init__(self, num_classes=6, input_channels=3):
        super().__init__()
        feats = [_torch_convbnrelu(input_channels, 32, stride=2)]
        inp = 32
        for t, c, n, s in self.CFG:
            for i in range(n):
                feats.append(_torch_inverted_residual(
                    inp, c, s if i == 0 else 1, t))
                inp = c
        feats.append(_torch_convbnrelu(inp, 1280, k=1))
        self.features = nn.Sequential(*feats)
        self.classifier = nn.Sequential(nn.Dropout(0.2),
                                        nn.Linear(1280, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = x.mean(dim=(2, 3))
        return self.classifier(x)


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean = torch.randn(m.running_mean.shape, generator=g) * 0.1
            m.running_var = torch.rand(m.running_var.shape, generator=g) + 0.5


class TestResNetConversion:
    def test_forward_parity_resnet18(self):
        tm = TorchResNet18(num_classes=6).eval()
        _randomize_bn_stats(tm)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params, stats = convert_resnet_state_dict(sd, depth=18)
        model = ResNetTSN(depth=18, num_classes=6, dropout=0.0)
        x = np.random.default_rng(0).normal(size=(2, 1, 64, 64, 3)).astype(
            np.float32)
        out = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x), train=False)
        with torch.no_grad():
            expected = tm(torch.tensor(x[:, 0]).permute(0, 3, 1, 2)).numpy()
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3,
                                   atol=1e-3)

    def test_channel_inflation(self):
        w = np.random.default_rng(1).normal(size=(64, 3, 7, 7)).astype(
            np.float32)
        out = inflate_first_conv(w, 10)
        assert out.shape == (64, 10, 7, 7)
        np.testing.assert_allclose(out[:, 0], w.mean(axis=1), rtol=1e-6)
        np.testing.assert_allclose(out[:, 0], out[:, 9])


class TestMobileNetConversion:
    def test_forward_parity_torchvision_layout(self):
        tm = TorchMobileNetV2(num_classes=6).eval()
        _randomize_bn_stats(tm, seed=1)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params, stats = convert_mobilenet_v2_state_dict(
            sd, layout="torchvision")
        model = MobileNetV2(num_classes=6, dropout=0.0)
        x = np.random.default_rng(2).normal(size=(2, 1, 64, 64, 3)).astype(
            np.float32)
        out = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x), train=False)
        with torch.no_grad():
            expected = tm(torch.tensor(x[:, 0]).permute(0, 3, 1, 2)).numpy()
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3,
                                   atol=1e-3)


def _torch_dli14_convbnrelu(inp, oup, k=3, stride=1):
    # d-li14 conv_3x3_bn / conv_1x1_bn: flat Sequential(conv, bn, relu6)
    return nn.Sequential(nn.Conv2d(inp, oup, k, stride, (k - 1) // 2,
                                   bias=False),
                         nn.BatchNorm2d(oup), nn.ReLU6(inplace=True))


def _torch_dli14_block(inp, oup, stride, expand):
    class IR(nn.Module):
        def __init__(self):
            super().__init__()
            hidden = round(inp * expand)
            if expand == 1:
                self.conv = nn.Sequential(
                    nn.Conv2d(hidden, hidden, 3, stride, 1, groups=hidden,
                              bias=False),
                    nn.BatchNorm2d(hidden), nn.ReLU6(inplace=True),
                    nn.Conv2d(hidden, oup, 1, 1, 0, bias=False),
                    nn.BatchNorm2d(oup))
            else:
                self.conv = nn.Sequential(
                    nn.Conv2d(inp, hidden, 1, 1, 0, bias=False),
                    nn.BatchNorm2d(hidden), nn.ReLU6(inplace=True),
                    nn.Conv2d(hidden, hidden, 3, stride, 1, groups=hidden,
                              bias=False),
                    nn.BatchNorm2d(hidden), nn.ReLU6(inplace=True),
                    nn.Conv2d(hidden, oup, 1, 1, 0, bias=False),
                    nn.BatchNorm2d(oup))
            self.identity = stride == 1 and inp == oup

        def forward(self, x):
            return x + self.conv(x) if self.identity else self.conv(x)

    return IR()


class TorchDli14MobileNetV2(nn.Module):
    """d-li14 policy-trunk key layout (reference models/policy_net.py:98-203),
    num_frames=1 so no temporal pooling -- a pure 2D net for parity."""

    CFG = TorchMobileNetV2.CFG

    def __init__(self, num_classes=6):
        super().__init__()
        feats = [_torch_dli14_convbnrelu(3, 32, stride=2)]
        inp = 32
        for t, c, n, s in self.CFG:
            for i in range(n):
                feats.append(_torch_dli14_block(inp, c, s if i == 0 else 1, t))
                inp = c
        self.features = nn.Sequential(*feats)
        self.conv = _torch_dli14_convbnrelu(inp, 1280, k=1)
        self.classifier = nn.Linear(1280, num_classes)

    def forward(self, x):
        x = self.conv(self.features(x))
        x = x.mean(dim=(2, 3))
        return self.classifier(x)


class TestDli14Conversion:
    def test_forward_parity_dli14_layout(self):
        tm = TorchDli14MobileNetV2(num_classes=6).eval()
        _randomize_bn_stats(tm, seed=2)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params, stats = convert_mobilenet_v2_state_dict(sd, layout="d-li14")
        model = MobileNetV2(num_classes=6, dropout=0.0, temporal_pooling=True)
        x = np.random.default_rng(6).normal(size=(2, 1, 64, 64, 3)).astype(
            np.float32)
        out = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x), train=False)
        with torch.no_grad():
            expected = tm(torch.tensor(x[:, 0]).permute(0, 3, 1, 2)).numpy()
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3,
                                   atol=1e-3)


class TestLSTMConversion:
    def test_lstm_cell_numeric_parity(self):
        torch.manual_seed(0)
        cell = nn.LSTMCell(12, 8)
        sd = {f"lstm.{k}": v.detach().numpy()
              for k, v in cell.state_dict().items()}
        p = convert_lstm_cell(sd)

        x = np.random.default_rng(3).normal(size=(4, 12)).astype(np.float32)
        h0 = np.random.default_rng(4).normal(size=(4, 8)).astype(np.float32)
        c0 = np.random.default_rng(5).normal(size=(4, 8)).astype(np.float32)
        with torch.no_grad():
            ht, ct = cell(torch.tensor(x), (torch.tensor(h0),
                                            torch.tensor(c0)))

        gates = (x @ p["ih"]["kernel"] + p["ih"]["bias"]
                 + h0 @ p["hh"]["kernel"] + p["hh"]["bias"])
        i, f, g, o = np.split(gates, 4, axis=-1)

        def sig(v):
            return 1.0 / (1.0 + np.exp(-v))

        c1 = sig(f) * c0 + sig(i) * np.tanh(g)
        h1 = sig(o) * np.tanh(c1)
        np.testing.assert_allclose(h1, ht.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(c1, ct.numpy(), rtol=1e-5, atol=1e-6)


class TestCheckpointRoundtrip:
    def test_save_load(self, tmp_path):
        from adamml_tpu.ckpt.checkpoint import (load_checkpoint,
                                                save_checkpoint)
        from adamml_tpu.train.train_state import AdaMMLTrainState
        from adamml_tpu.train.optim import sgd_transform

        params = {"main_net": {"w": jnp.arange(6.0).reshape(2, 3)},
                  "policy_net": {"w": jnp.ones((3,))}}
        stats = {"main_net": {"bn": {"mean": jnp.zeros((3,))}}}
        tx = sgd_transform(0.9, False, 1e-4)
        state = AdaMMLTrainState.create(
            params, stats, tx.init(params["main_net"]),
            tx.init(params["policy_net"]), temperature=4.2)
        path = save_checkpoint(state, {"epoch": 3, "stage": "finetune",
                                       "best_top1": 55.0, "arch": "t"},
                               str(tmp_path), is_best=True, epoch=3,
                               suffix="_finetune")
        import os

        assert os.path.exists(os.path.join(str(tmp_path), "model_best"))
        assert os.path.exists(os.path.join(str(tmp_path),
                                           "checkpoint_finetune_03"))

        target = AdaMMLTrainState.create(
            jax.tree_util.tree_map(jnp.zeros_like, params),
            jax.tree_util.tree_map(jnp.zeros_like, stats),
            tx.init(params["main_net"]), tx.init(params["policy_net"]),
            temperature=0.0)
        restored, meta = load_checkpoint(path, target)
        assert meta["stage"] == "finetune"
        assert float(restored.temperature) == pytest.approx(4.2)
        np.testing.assert_allclose(
            np.asarray(restored.params["main_net"]["w"]),
            np.arange(6.0).reshape(2, 3))
