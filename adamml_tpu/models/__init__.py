from .resnet_tsn import ResNetTSN
from .mobilenet_v2 import MobileNetV2
from .joint_net import JointMainNet
from .policy_net import PolicyNet
from .adamml import AdaMML
from .model_builder import build_model, MODEL_TABLE

__all__ = [
    "ResNetTSN",
    "MobileNetV2",
    "JointMainNet",
    "PolicyNet",
    "AdaMML",
    "build_model",
    "MODEL_TABLE",
]
