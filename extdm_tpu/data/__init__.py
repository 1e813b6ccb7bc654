from extdm_tpu.data.augmentation import AllAugmentationTransform
from extdm_tpu.data.h5 import HDF5VideoStore, HDF5VideoWriter
from extdm_tpu.data.loader import DataLoader, default_collate
from extdm_tpu.data.synthetic import (
    make_moving_shapes_dataset,
    make_moving_shapes_video,
    write_video_hdf5,
)
from extdm_tpu.data.two_frames import DatasetRepeater, TwoFramesDataset
from extdm_tpu.data.video_dataset import VideoDataset, to_rgb_video

__all__ = [
    "AllAugmentationTransform",
    "HDF5VideoStore",
    "HDF5VideoWriter",
    "DataLoader",
    "default_collate",
    "make_moving_shapes_dataset",
    "make_moving_shapes_video",
    "write_video_hdf5",
    "DatasetRepeater",
    "TwoFramesDataset",
    "VideoDataset",
    "to_rgb_video",
]
