from .records import VideoRecord, parse_list_file
from .samplers import random_clip, sample_train_clip, sample_val_test_clip
from .aug_params import sample_crop_flip
from .video_dataset import VideoDataset, MultiVideoDataset
from .synthetic import SyntheticVideoDataset
from .dataflow import HostDataLoader
from .device_pipeline import make_batch_preprocessor

__all__ = [
    "VideoRecord",
    "parse_list_file",
    "random_clip",
    "sample_train_clip",
    "sample_val_test_clip",
    "sample_crop_flip",
    "VideoDataset",
    "MultiVideoDataset",
    "SyntheticVideoDataset",
    "HostDataLoader",
    "make_batch_preprocessor",
]
