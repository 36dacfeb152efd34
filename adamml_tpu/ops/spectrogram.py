"""Device-side log-power spectrogram.

Replaces the reference's host-side librosa STFT (reference
utils/video_dataset.py:104-132): 24 kHz mono, 1.28 s window, n_fft=511 (256
bins), periodic Hann of 10 ms padded center to n_fft, 5 ms hop, center
zero-padding, log(|S|^2 + 1e-6). On a 30720-sample window this yields a
256x256 (freq, time) image.

Runs as batched XLA (frame gather + window multiply + rfft) on device, so
audio DSP rides the TPU instead of serializing Python workers.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SpectrogramConfig:
    resampling_rate: int = 24000
    audio_length: float = 1.28
    n_fft: int = 511
    window_ms: float = 10.0
    hop_ms: float = 5.0
    eps: float = 1e-6

    @property
    def num_samples(self) -> int:
        return int(round(self.resampling_rate * self.audio_length))

    @property
    def win_length(self) -> int:
        # reference utils/video_dataset.py:126
        return int(round(self.window_ms * self.resampling_rate / 1e3))

    @property
    def hop_length(self) -> int:
        # reference utils/video_dataset.py:127 (named noverlap there but used
        # as librosa's hop_length)
        return int(round(self.hop_ms * self.resampling_rate / 1e3))

    @property
    def num_freqs(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def num_frames(self) -> int:
        padded = self.num_samples + 2 * (self.n_fft // 2)
        return 1 + (padded - self.n_fft) // self.hop_length


def _periodic_hann(win_length: int) -> np.ndarray:
    """scipy.signal.get_window('hann', n, fftbins=True) as used by librosa."""
    n = np.arange(win_length, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)


def _padded_window(cfg: SpectrogramConfig) -> np.ndarray:
    """Hann(win_length) centered into an n_fft-long buffer (librosa
    util.pad_center semantics)."""
    w = _periodic_hann(cfg.win_length)
    lpad = (cfg.n_fft - cfg.win_length) // 2
    rpad = cfg.n_fft - cfg.win_length - lpad
    return np.pad(w, (lpad, rpad)).astype(np.float32)


@functools.partial(jax.jit, static_argnums=(1,))
def log_power_spectrogram(samples: jax.Array, cfg: SpectrogramConfig) -> jax.Array:
    """samples: (..., num_samples) float -> (..., num_freqs, num_frames)."""
    window = jnp.asarray(_padded_window(cfg))
    half = cfg.n_fft // 2
    x = jnp.pad(samples.astype(jnp.float32),
                [(0, 0)] * (samples.ndim - 1) + [(half, half)])
    frame_starts = np.arange(cfg.num_frames) * cfg.hop_length
    idx = frame_starts[:, None] + np.arange(cfg.n_fft)[None, :]
    frames = x[..., idx] * window  # (..., num_frames, n_fft)
    spec = jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    out = jnp.log(power + cfg.eps)
    # librosa returns (freq, time); swap the trailing axes to match
    return jnp.swapaxes(out, -1, -2)


def log_power_spectrogram_np(samples: np.ndarray,
                             cfg: SpectrogramConfig = SpectrogramConfig()
                             ) -> np.ndarray:
    """Pure-numpy reference twin of `log_power_spectrogram` for host fallback
    and golden tests."""
    window = _padded_window(cfg).astype(np.float64)
    half = cfg.n_fft // 2
    x = np.pad(samples.astype(np.float64), (half, half))
    starts = np.arange(cfg.num_frames) * cfg.hop_length
    idx = starts[:, None] + np.arange(cfg.n_fft)[None, :]
    frames = x[idx] * window
    spec = np.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    power = spec.real ** 2 + spec.imag ** 2
    return np.log(power + cfg.eps).T.astype(np.float32)
