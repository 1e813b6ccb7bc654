"""Auxiliary dataset interfaces mirroring /root/reference/data/base.py.

These are not on the main train/valid paths (same as the reference, where
they back ad-hoc experiments), but complete the data-layer surface:

- `ConcatDatasetWithIndex` — concatenation that also returns which child
  dataset served the item (ref base.py:17-29).
- `VideoPaths` — clips read straight from video files with a frame range
  and optional per-frame transform, normalized to [-1, 1] (ref :32-65).
- `HDF5InterfaceDataset` — fixed-length clip windows over an HDF5 video
  store with uniform video remapping, random start time and optional
  horizontal flip (ref :68-140).

All return numpy arrays (channels-last) — device placement happens in the
prefetching loader, not here.
"""
from __future__ import annotations

import bisect
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from extdm_tpu.data.h5 import HDF5VideoStore


class ConcatDatasetWithIndex:
    """Concatenate datasets; __getitem__ returns (item, dataset_idx)."""

    def __init__(self, datasets: Sequence[Any]):
        assert len(datasets) > 0
        self.datasets = list(datasets)
        sizes = [len(d) for d in self.datasets]
        self.cumulative_sizes = list(np.cumsum(sizes))

    def __len__(self) -> int:
        return self.cumulative_sizes[-1]

    def __getitem__(self, idx: int):
        if idx < 0:
            if -idx > len(self):
                raise ValueError("index out of range")
            idx = len(self) + idx
        dataset_idx = bisect.bisect_right(self.cumulative_sizes, idx)
        sample_idx = idx if dataset_idx == 0 else idx - self.cumulative_sizes[dataset_idx - 1]
        return self.datasets[dataset_idx][sample_idx], dataset_idx


def read_video_file(path: str) -> np.ndarray:
    """(T, H, W, C) uint8 frames from a video file (imageio/ffmpeg)."""
    import imageio.v3 as iio

    return np.asarray(iio.imread(path, plugin="pyav"))


class VideoPaths:
    """Clips read from video files given (path, start, end) triples.

    `trans` is applied per frame (frame -> frame). Output float32 in
    [-1, 1] like the reference's `(video/127.5 - 1)`.
    """

    def __init__(self, paths: Sequence[str], start_idxs: Sequence[int],
                 end_idxs: Sequence[int],
                 trans: Optional[Callable[[np.ndarray], np.ndarray]] = None,
                 labels: Optional[Dict[str, Sequence[Any]]] = None,
                 reader: Callable[[str], np.ndarray] = read_video_file):
        self._length = len(paths)
        self._trans = trans
        self._reader = reader
        self.labels: Dict[str, Sequence[Any]] = dict(labels or {})
        self.labels["file_path"] = list(paths)
        self.labels["start_idx"] = list(start_idxs)
        self.labels["end_idx"] = list(end_idxs)

    def __len__(self) -> int:
        return self._length

    def preprocess_video(self, video_path: str, start_idx: int, end_idx: int) -> np.ndarray:
        video = self._reader(video_path)[start_idx:end_idx].astype(np.uint8)
        if self._trans is not None:
            video = np.stack([self._trans(frame) for frame in video])
        return (video / 127.5 - 1.0).astype(np.float32)

    def __getitem__(self, i: int) -> Dict[str, Any]:
        item: Dict[str, Any] = {
            "video": self.preprocess_video(
                self.labels["file_path"][i],
                int(self.labels["start_idx"][i]),
                int(self.labels["end_idx"][i]),
            )
        }
        for k, v in self.labels.items():
            item[k] = v[i]
        return item


class HDF5InterfaceDataset:
    """Fixed-length clip windows over an `HDF5VideoStore`.

    index -> video via uniform remap over [0, max_index) (so a subset
    `total_videos` spans the whole store), then a random (or given) start
    time; optional horizontal flip on the whole clip.
    """

    def __init__(self, data_dir: str, frames_per_sample: int,
                 random_time: bool = True, total_videos: int = -1,
                 start_at: int = 0, labels: Optional[Dict[str, Any]] = None,
                 hflip: bool = False, seed: Optional[int] = None):
        self.labels = dict(labels or {})
        self.store = HDF5VideoStore(data_dir)
        self.total_videos = total_videos
        self.start_at = start_at
        self.random_time = random_time
        self.frames_per_sample = frames_per_sample
        self.hflip = hflip
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return self.total_videos if self.total_videos > 0 else len(self.store)

    def max_index(self) -> int:
        return len(self.store)

    def len_of_vid(self, index: int) -> int:
        return self.store.video_length(index % len(self))

    def __getitem__(self, index: int, time_idx: int = 0) -> Dict[str, Any]:
        denom = max(len(self) - 1, 1)
        video_index = int(round(index / denom * (self.max_index() - 1)))
        video_len = self.store.video_length(video_index) - self.start_at
        if self.random_time and video_len > self.frames_per_sample:
            time_idx = int(self._rng.choice(video_len - self.frames_per_sample))
        time_idx += self.start_at
        num = min(self.frames_per_sample, max(video_len, 1))
        clip = self.store.read_frames(video_index, time_idx, num)
        clip = clip.astype(np.float32)
        if clip.max() > 1.5:
            clip = clip / 255.0
        if clip.ndim == 3:
            clip = clip[..., None]
        if self.hflip and self._rng.rand() < 0.5:
            clip = clip[:, :, ::-1].copy()
        item: Dict[str, Any] = {"video": clip}
        for k, v in self.labels.items():
            item[k] = v
        return item
