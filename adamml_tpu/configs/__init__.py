from .dataset_config import DATASET_CONFIG, DatasetMeta, get_dataset_config, register_dataset
from .config import (
    DataConfig,
    ModelConfig,
    OptimConfig,
    RuntimeConfig,
    ExperimentConfig,
    arg_parser,
    config_from_args,
    arch_name,
    input_channels_for,
)

__all__ = [
    "DATASET_CONFIG",
    "DatasetMeta",
    "get_dataset_config",
    "register_dataset",
    "DataConfig",
    "ModelConfig",
    "OptimConfig",
    "RuntimeConfig",
    "ExperimentConfig",
    "arg_parser",
    "config_from_args",
    "arch_name",
    "input_channels_for",
]
