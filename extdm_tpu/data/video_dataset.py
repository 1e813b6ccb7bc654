"""Clip sampler over the HDF5 video store.

Mirrors /root/reference/data/video_dataset.py:51-164 (index remapping,
random start time, /255 normalization, UCF crop/flip branch) but framework-
free: returns numpy, batches are assembled by `extdm_tpu.data.loader`.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from extdm_tpu.data.h5 import HDF5VideoStore


def to_rgb_video(video: np.ndarray) -> np.ndarray:
    """Canonicalize a clip to (T, H, W, 3) float32 (ref dataset2video :17-24).

    Accepts (T, H, W) grayscale, (T, 1|3, H, W) channel-first, or
    (T, H, W, C) channel-last.
    """
    if video.ndim == 3:
        video = np.repeat(video[..., None], 3, axis=-1)
    elif video.shape[1] in (1, 3) and video.ndim == 4 and video.shape[-1] not in (1, 3):
        video = np.transpose(video, (0, 2, 3, 1))
        if video.shape[-1] == 1:
            video = np.repeat(video, 3, axis=-1)
    elif video.shape[-1] == 1:
        video = np.repeat(video, 3, axis=-1)
    return np.ascontiguousarray(video, dtype=np.float32)


class VideoDataset:
    def __init__(
        self,
        data_dir: str,
        type: str = "train",
        total_videos: int = -1,
        num_frames: int = 40,
        image_size: int = 64,
        random_time: bool = True,
        random_horizontal_flip: bool = False,
        seed: int = 0,
        raw_uint8: bool = False,
    ):
        self.data_dir = data_dir
        self.type = type
        self.num_frames = num_frames
        self.image_size = image_size
        self.total_videos = total_videos
        self.random_time = random_time
        self.random_horizontal_flip = random_horizontal_flip
        # raw_uint8: return frames in the stored dtype/layout (no /255) so
        # the loader can ship 1/4 the bytes to the device and the train
        # step canonicalizes in-graph (see DMTrainer.canonicalize_video).
        self.raw_uint8 = raw_uint8
        self.rng = np.random.RandomState(seed)

        self.is_ucf = "UCF" in data_dir
        if self.is_ucf:
            self.store = HDF5VideoStore(data_dir)
            self.num_train_vids = int(self.store.attr("num_train"))
            # every 10th test video — Mathieu et al. protocol (ref :79)
            self.num_test_vids = int(self.store.attr("num_test")) // 10
        else:
            self.store = HDF5VideoStore(os.path.join(data_dir, type))

    def __len__(self) -> int:
        if self.total_videos > 0:
            return self.total_videos
        return self.max_index()

    def max_index(self) -> int:
        if self.is_ucf:
            return self.num_train_vids if self.type == "train" else self.num_test_vids
        return len(self.store)

    def len_of_vid(self, index: int) -> int:
        return self.store.video_length(index % len(self))

    def _resolve_video_index(self, index: int) -> int:
        n = len(self)
        video_index = round(index / (n - 1) * (self.max_index() - 1)) if n > 1 else 0
        if self.is_ucf and self.type != "train":
            video_index = video_index * 10 + self.num_train_vids
        return video_index

    def __getitem__(self, index: int, time_idx: int = 0) -> Tuple[np.ndarray, int]:
        """Returns (clip, video_index); clip is (T, ...) float in [0, 1] in
        the *stored* layout (grayscale stays (T, H, W)) — canonicalize with
        `to_rgb_video`, matching the reference's collate-then-rearrange."""
        video_index = self._resolve_video_index(index)
        total = self.store.video_length(video_index)
        if self.random_time and total > self.num_frames:
            time_idx = int(self.rng.choice(total - self.num_frames))
        frames = self.store.read_frames(video_index, time_idx, self.num_frames)

        if self.is_ucf:
            full_w = int(self.image_size / 240 * 320)
            if self.type == "train":
                crop_c = int(self.rng.randint(full_w - self.image_size))
            else:
                crop_c = int((full_w - self.image_size) / 2)
            frames = frames[:, :, crop_c : crop_c + self.image_size]
            if self.random_horizontal_flip and self.rng.randint(2) == 0:
                frames = frames[:, :, ::-1]

        if self.raw_uint8 and np.issubdtype(frames.dtype, np.integer):
            return np.ascontiguousarray(frames), video_index
        clip = frames.astype(np.float32) / 255.0
        return clip, video_index

    def prefill_cache(self) -> int:
        """Single-flight RAM-cache pre-fill (see HDF5VideoStore)."""
        return self.store.prefill_cache()
