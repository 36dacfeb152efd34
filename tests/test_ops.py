import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from adamml_tpu.ops.gumbel import gumbel_softmax_hard, gumbel_decision
from adamml_tpu.ops.temporal import temporal_pool
from adamml_tpu.ops.spectrogram import (
    SpectrogramConfig, log_power_spectrogram, log_power_spectrogram_np)
from adamml_tpu.ops.augment import (
    crop_resize_normalize, rgbdiff_from_frames, policy_stream)


class TestGumbel:
    def test_hard_one_hot_forward(self):
        key = jax.random.PRNGKey(0)
        logits = jnp.array([[2.0, -1.0], [0.0, 0.0], [-3.0, 3.0]])
        y = gumbel_softmax_hard(key, logits, tau=5.0)
        np.testing.assert_allclose(np.sort(np.asarray(y), axis=-1),
                                   np.tile([0.0, 1.0], (3, 1)), atol=1e-6)

    def test_straight_through_gradient_matches_torch(self):
        """Gradient of sum(hard_sample * w) w.r.t. logits must equal the
        soft-softmax gradient, for the same gumbel noise."""
        logits_np = np.array([[1.0, -0.5, 0.3], [0.2, 0.1, -1.0]], np.float32)
        w_np = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], np.float32)
        gumbels = np.array([[0.1, 0.9, -0.3], [0.5, -0.2, 0.4]], np.float32)
        tau = 2.5

        # torch: replicate F.gumbel_softmax(hard=True) with fixed noise
        lt = torch.tensor(logits_np, requires_grad=True)
        y_soft = torch.softmax((lt + torch.tensor(gumbels)) / tau, dim=-1)
        index = y_soft.max(-1, keepdim=True)[1]
        y_hard = torch.zeros_like(y_soft).scatter_(-1, index, 1.0)
        t_out = y_hard - y_soft.detach() + y_soft
        (t_out * torch.tensor(w_np)).sum().backward()
        torch_grad = lt.grad.numpy()

        def f(logits):
            g = jnp.asarray(gumbels)
            y_soft = jax.nn.softmax((logits + g) / tau, axis=-1)
            idx = jnp.argmax(y_soft, axis=-1)
            y_hard = jax.nn.one_hot(idx, 3)
            y = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
            return (y * w_np).sum()

        jax_grad = jax.grad(f)(jnp.asarray(logits_np))
        np.testing.assert_allclose(np.asarray(jax_grad), torch_grad,
                                   rtol=1e-5, atol=1e-6)

    def test_decision_is_last_column(self):
        key = jax.random.PRNGKey(3)
        logits = jnp.array([[10.0, -10.0], [-10.0, 10.0]])
        d = gumbel_decision(key, logits, tau=0.01)
        np.testing.assert_allclose(np.asarray(d), [0.0, 1.0], atol=1e-6)

    def test_selection_rate_follows_temperature(self):
        key = jax.random.PRNGKey(42)
        logits = jnp.tile(jnp.array([[0.0, 2.0]]), (4096, 1))
        d = gumbel_decision(key, logits, tau=0.5)
        assert float(d.mean()) > 0.8  # strongly prefers ON at low tau


class TestTemporalPool:
    @pytest.mark.parametrize("mode,frames", [
        ("max", 2), ("max", 4), ("max", 8),
        # torch avg_pool3d rejects input < kernel even with padding, so the
        # reference could never run avg at F=2 either; parity-check F >= 4.
        ("avg", 4), ("avg", 8),
    ])
    def test_matches_torch_pool3d(self, mode, frames):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, frames, 5, 5, 3)).astype(np.float32)
        out = temporal_pool(jnp.asarray(x), kernel=3, stride=2, mode=mode)
        # torch path mirrors reference models/common.py:28-33:
        # (N, F, H, W, C) -> (N, C', F, H, W) pooled over F
        xt = torch.tensor(x).permute(0, 4, 1, 2, 3)  # N, C, F, H, W
        pool = (torch.nn.MaxPool3d((3, 1, 1), (2, 1, 1), (1, 0, 0)) if mode == "max"
                else torch.nn.AvgPool3d((3, 1, 1), (2, 1, 1), (1, 0, 0)))
        expected = pool(xt).permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-6)

    def test_frame_halving_chain(self):
        # 8 -> 4 -> 2 -> 1 as in reference models/resnet.py:145-154
        x = jnp.zeros((1, 8, 2, 2, 1))
        for expected in (4, 2, 1):
            x = temporal_pool(x)
            assert x.shape[1] == expected


class TestSpectrogram:
    def test_shape_256x256(self):
        cfg = SpectrogramConfig()
        assert cfg.num_samples == 30720
        assert cfg.win_length == 240
        assert cfg.hop_length == 120
        assert cfg.num_freqs == 256
        assert cfg.num_frames == 256
        x = jnp.asarray(np.random.default_rng(0).normal(size=(30720,)),
                        jnp.float32)
        out = log_power_spectrogram(x, cfg)
        assert out.shape == (256, 256)

    def test_matches_numpy_twin(self):
        cfg = SpectrogramConfig()
        x = np.random.default_rng(1).normal(size=(cfg.num_samples,)).astype(np.float32)
        dev = np.asarray(log_power_spectrogram(jnp.asarray(x), cfg))
        host = log_power_spectrogram_np(x, cfg)
        np.testing.assert_allclose(dev, host, rtol=1e-3, atol=1e-3)

    def test_matches_scipy_stft_windowing(self):
        """Cross-check the framing/window against scipy's hann + manual rfft
        (librosa formula at reference utils/video_dataset.py:126-130)."""
        from scipy.signal import get_window
        cfg = SpectrogramConfig()
        x = np.random.default_rng(2).normal(size=(cfg.num_samples,))
        win = get_window("hann", cfg.win_length, fftbins=True)
        lpad = (cfg.n_fft - cfg.win_length) // 2
        win_padded = np.pad(win, (lpad, cfg.n_fft - cfg.win_length - lpad))
        xp = np.pad(x, (cfg.n_fft // 2, cfg.n_fft // 2))
        frame0 = xp[:cfg.n_fft] * win_padded
        expected_col0 = np.log(np.abs(np.fft.rfft(frame0, cfg.n_fft)) ** 2 + cfg.eps)
        got = log_power_spectrogram_np(x.astype(np.float32), cfg)[:, 0]
        np.testing.assert_allclose(got, expected_col0, rtol=1e-4, atol=1e-4)

    def test_batched(self):
        cfg = SpectrogramConfig()
        x = jnp.zeros((2, 3, cfg.num_samples))
        out = log_power_spectrogram(x, cfg)
        assert out.shape == (2, 3, 256, 256)


class TestAugment:
    def test_identity_crop(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, size=(1, 1, 8, 8, 3), dtype=np.uint8)
        crop = np.array([[0, 0, 8, 8]], np.float32)
        flip = np.array([False])
        out = crop_resize_normalize(jnp.asarray(img), jnp.asarray(crop),
                                    jnp.asarray(flip), out_size=8,
                                    mean=None, std=None)
        np.testing.assert_allclose(np.asarray(out)[0, 0], img[0, 0], atol=1e-3)

    def test_flip(self):
        img = np.arange(8, dtype=np.uint8).reshape(1, 1, 1, 8, 1)
        img = np.broadcast_to(img, (1, 1, 4, 8, 1)).copy()
        crop = np.array([[0, 0, 8, 4]], np.float32)
        out = crop_resize_normalize(jnp.asarray(img), jnp.asarray(crop),
                                    jnp.asarray(np.array([True])), out_size=4,
                                    mean=None, std=None)
        out_noflip = crop_resize_normalize(jnp.asarray(img), jnp.asarray(crop),
                                           jnp.asarray(np.array([False])),
                                           out_size=4, mean=None, std=None)
        np.testing.assert_allclose(np.asarray(out)[..., ::-1, :],
                                   np.asarray(out_noflip), atol=1e-4)

    def test_flow_x_inversion_on_flip(self):
        img = np.full((1, 1, 4, 4, 2), 100, np.uint8)
        crop = np.array([[0, 0, 4, 4]], np.float32)
        out = crop_resize_normalize(jnp.asarray(img), jnp.asarray(crop),
                                    jnp.asarray(np.array([True])), out_size=4,
                                    mean=None, std=None, flow_channels=True)
        out = np.asarray(out)
        np.testing.assert_allclose(out[..., 0], 155.0, atol=1e-3)  # inverted x
        np.testing.assert_allclose(out[..., 1], 100.0, atol=1e-3)  # y untouched

    def test_normalization(self):
        img = np.full((1, 2, 4, 4, 3), 255, np.uint8)
        crop = np.array([[0, 0, 4, 4]], np.float32)
        out = crop_resize_normalize(
            jnp.asarray(img), jnp.asarray(crop),
            jnp.asarray(np.array([False])), out_size=4,
            mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))
        expected = (1.0 - np.array([0.485, 0.456, 0.406])) / \
            np.array([0.229, 0.224, 0.225])
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], expected,
                                   rtol=1e-4)

    def test_crop_resize_matches_pil_bilinear(self):
        """center-crop + resize vs PIL BILINEAR (the reference interpolator,
        utils/video_transforms.py:96-100)."""
        from PIL import Image
        rng = np.random.default_rng(3)
        src = rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8)
        # crop (8, 4, 24, 24) then resize to 16x16
        pil = Image.fromarray(src).crop((8, 4, 32, 28)).resize(
            (16, 16), Image.BILINEAR)
        expected = np.asarray(pil, dtype=np.float32)
        frames = src[None, None]
        out = crop_resize_normalize(
            jnp.asarray(frames), jnp.asarray(np.array([[8, 4, 24, 24]], np.float32)),
            jnp.asarray(np.array([False])), out_size=16, mean=None, std=None)
        got = np.asarray(out)[0, 0]
        d = np.abs(got - expected)
        # interior must agree to sub-quantization level; the crop border may
        # differ (PIL clamps at the crop edge, our sampler reads the true
        # neighboring pixels of the source image)
        assert d[2:-2, 2:-2].mean() < 0.5
        assert d[2:-2, 2:-2].max() < 2.0
        assert d.mean() < 3.0

    def test_rgbdiff_formula(self):
        a = np.array([[[10, 0, 255]]], np.uint8)     # frame 0, (1, 1, 3)
        b = np.array([[[20, 0, 0]]], np.uint8)       # frame 1
        frames = np.stack([a, b], axis=0)[None]      # (1, 2, 1, 1, 3)
        out = np.asarray(rgbdiff_from_frames(jnp.asarray(frames)))
        expected = ((b.astype(np.float64) - a.astype(np.float64) + 255.0)
                    * 255.0 / 510.0).astype(np.uint8)
        np.testing.assert_array_equal(out[0, 0], expected)

    def test_policy_stream_shape(self):
        x = jnp.zeros((2, 5, 8, 224, 224, 3))
        out = policy_stream(x, size=160, stride=2)
        assert out.shape == (2, 5, 4, 160, 160, 3)
