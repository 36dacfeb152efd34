from .gumbel import gumbel_softmax_hard, gumbel_decision
from .temporal import temporal_pool
from .spectrogram import log_power_spectrogram, SpectrogramConfig
from .augment import (
    crop_resize_normalize,
    rgbdiff_from_frames,
    policy_stream,
)
from .pallas.depthwise import depthwise_conv3x3

__all__ = [
    "gumbel_softmax_hard",
    "gumbel_decision",
    "temporal_pool",
    "log_power_spectrogram",
    "SpectrogramConfig",
    "crop_resize_normalize",
    "rgbdiff_from_frames",
    "policy_stream",
    "depthwise_conv3x3",
]
