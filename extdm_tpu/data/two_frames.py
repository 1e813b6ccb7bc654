"""Stage-1 pair sampler: two random frames with distance constraints.

Mirrors /root/reference/data/two_frames_dataset.py:81-234 (rejection
sampling over frame distance, gray->rgb, augmentation pipeline, repeat
wrapper for I/O efficiency). Returns channels-last float32 in [0, 1].
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from extdm_tpu.data.augmentation import AllAugmentationTransform
from extdm_tpu.data.h5 import HDF5VideoStore


def gray2rgb(frame: np.ndarray) -> np.ndarray:
    if frame.ndim == 2:
        return np.repeat(frame[..., None], 3, axis=-1)
    if frame.shape[-1] == 1:
        return np.repeat(frame, 3, axis=-1)
    return frame


class TwoFramesDataset:
    def __init__(
        self,
        root_dir: str,
        type: str = "train",
        total_videos: int = -1,
        frame_shape: int = 64,
        min_frame_distance: int = 0,
        max_frame_distance: int = 50,
        augmentation_params: Optional[dict] = None,
        seed: int = 0,
        raw_uint8: bool = False,
    ):
        self.root_dir = root_dir
        self.type = type
        self.total_videos = total_videos
        self.frame_shape = frame_shape
        self.min_frame_distance = min_frame_distance
        self.max_frame_distance = max_frame_distance
        self.rng = np.random.RandomState(seed)

        self.is_ucf = "UCF" in root_dir
        if self.is_ucf:
            self.store = HDF5VideoStore(root_dir)
            self.num_train_vids = int(self.store.attr("num_train"))
            self.num_test_vids = int(self.store.attr("num_test")) // 10
        else:
            self.store = HDF5VideoStore(os.path.join(root_dir, type))

        if type == "train" and augmentation_params:
            self.transform = AllAugmentationTransform(**augmentation_params)
        else:
            self.transform = None
        # raw_uint8: return frames in the STORED dtype/layout with no
        # augmentation — the train step canonicalizes and augments
        # in-graph (train/device_augment.py); 1/12th the transfer bytes
        # for gray stores. Only valid with geometry-preserving (or no)
        # augmentation pipelines.
        self.raw_uint8 = raw_uint8
        if raw_uint8 and self.transform is not None:
            assert getattr(self.transform, "batchable", False), (
                "raw_uint8 requires a geometry-preserving augmentation "
                "pipeline (flip/jitter only) — crop/resize/rotation must "
                "run on host")

    def max_index(self) -> int:
        if self.is_ucf:
            return self.num_train_vids if self.type == "train" else self.num_test_vids
        return len(self.store)

    def __len__(self) -> int:
        return self.total_videos if self.total_videos > 0 else self.max_index()

    def _sample_pair(self, num_frames: int) -> np.ndarray:
        idxs = np.sort(self.rng.choice(num_frames, replace=True, size=2))
        for _ in range(1000):
            d = idxs[1] - idxs[0]
            if self.min_frame_distance <= d <= self.max_frame_distance:
                break
            idxs = np.sort(self.rng.choice(num_frames, replace=True, size=2))
        return idxs

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        n = len(self)
        video_index = round(index / (n - 1) * (self.max_index() - 1)) if n > 1 else 0
        if self.is_ucf and self.type != "train":
            video_index = video_index * 10 + self.num_train_vids

        num_frames = self.store.video_length(video_index)
        frame_idxs = self._sample_pair(num_frames)

        crop_c = None
        if self.is_ucf:
            full_w = int(self.frame_shape / 240 * 320)
            if self.type == "train":
                crop_c = int(self.rng.randint(full_w - self.frame_shape))
            else:
                crop_c = int((full_w - self.frame_shape) / 2)

        frames = []
        for fi in frame_idxs:
            frame = self.store.read_frames(video_index, int(fi), 1)[0]
            if crop_c is not None:
                frame = frame[:, crop_c : crop_c + self.frame_shape]
            if self.raw_uint8 and np.issubdtype(frame.dtype, np.integer):
                frames.append(np.ascontiguousarray(frame))
                continue
            frame = gray2rgb(frame)
            if np.issubdtype(frame.dtype, np.integer):
                frame = frame.astype(np.float32) / 255.0
            frames.append(frame.astype(np.float32))

        if self.raw_uint8 and frames[0].dtype == np.uint8:
            return {"source": frames[0], "driving": frames[1],
                    "frame": np.asarray(frame_idxs), "id": index}

        if self.transform is not None:
            frames = self.transform(frames)

        return {
            "source": np.ascontiguousarray(frames[0], np.float32),
            "driving": np.ascontiguousarray(frames[1], np.float32),
            "frame": np.asarray(frame_idxs),
            "id": index,
        }

    def prefill_cache(self) -> int:
        """Single-flight RAM-cache pre-fill (see HDF5VideoStore)."""
        return self.store.prefill_cache()

    def _read_pair(self, index: int) -> Dict[str, np.ndarray]:
        """__getitem__ minus the augmentation (shared by both paths)."""
        n = len(self)
        video_index = round(index / (n - 1) * (self.max_index() - 1)) if n > 1 else 0
        if self.is_ucf and self.type != "train":
            video_index = video_index * 10 + self.num_train_vids
        num_frames = self.store.video_length(video_index)
        frame_idxs = self._sample_pair(num_frames)
        crop_c = None
        if self.is_ucf:
            full_w = int(self.frame_shape / 240 * 320)
            if self.type == "train":
                crop_c = int(self.rng.randint(full_w - self.frame_shape))
            else:
                crop_c = int((full_w - self.frame_shape) / 2)
        frames = []
        for fi in frame_idxs:
            frame = self.store.read_frames(video_index, int(fi), 1)[0]
            if crop_c is not None:
                frame = frame[:, crop_c : crop_c + self.frame_shape]
            frame = gray2rgb(frame)
            if np.issubdtype(frame.dtype, np.integer):
                frame = frame.astype(np.float32) / 255.0
            frames.append(frame.astype(np.float32))
        return {"frames": frames, "idxs": frame_idxs}

    def get_batch(self, indices) -> Dict[str, np.ndarray]:
        """Whole-batch fast path (used by DataLoader when present): reads
        all pairs, then applies the augmentation VECTORIZED across the
        batch (independent per-pair parameters; one numpy/cv2 pass per op
        instead of B x T python dispatches — the measured AE host
        bottleneck on the 1-core host, VERDICT r3 #5). Falls back to the
        per-item transform for geometry-changing pipelines."""
        pairs, fidx = [], []
        for i in indices:
            d = self._read_pair(int(i))
            pairs.append(np.stack(d["frames"]))
            fidx.append(d["idxs"])
        clips = np.stack(pairs)  # (B, 2, H, W, 3)
        if self.transform is not None:
            if getattr(self.transform, "batchable", False):
                clips = self.transform.batch_call(clips)
            else:
                clips = np.stack(
                    [np.stack(self.transform(list(c))) for c in clips])
        return {
            "source": np.ascontiguousarray(clips[:, 0], np.float32),
            "driving": np.ascontiguousarray(clips[:, 1], np.float32),
            "frame": np.stack(fidx),
            "id": np.asarray([int(i) for i in indices]),
        }


class DatasetRepeater:
    """Iterate the dataset num_repeats times per epoch (ref :221-234)."""

    def __init__(self, dataset, num_repeats: int = 100):
        self.dataset = dataset
        self.num_repeats = num_repeats

    def __len__(self):
        return self.num_repeats * len(self.dataset)

    def __getitem__(self, idx):
        return self.dataset[idx % len(self.dataset)]

    def get_batch(self, indices):
        n = len(self.dataset)
        return self.dataset.get_batch([int(i) % n for i in indices])

    def prefill_cache(self) -> int:
        return self.dataset.prefill_cache()
