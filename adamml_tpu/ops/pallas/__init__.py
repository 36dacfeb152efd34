from .depthwise import depthwise_conv3x3, pallas_depthwise_available

__all__ = ["depthwise_conv3x3", "pallas_depthwise_available"]
