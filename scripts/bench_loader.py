"""Loader throughput reality check.

TPU-native equivalent of the reference's `check_num_workers` sweep
(data/video_dataset.py:214-242): synthesizes a KTH-scale HDF5 store
(>= 1 GB of uint8 frames in the reference shard layout, lzf-compressed),
then sweeps DataLoader worker counts for both stages' datasets and prints
batches/s, frames/s, and the implied data-time share of a measured train
step.

Usage:
  python scripts/bench_loader.py --root /tmp/loader_bench --make \
      [--videos 2000] [--frames 120] [--size 64]
  python scripts/bench_loader.py --root /tmp/loader_bench \
      [--stage dm|ae|both] [--workers 0,1,2,4,8,16] [--batches 20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# KTH AE training augmentation (configs/AE/kth.yaml)
AE_AUG = {
    "flip_param": {"horizontal_flip": True, "time_flip": True},
    "jitter_param": {"brightness": 0.1, "contrast": 0.1, "saturation": 0.1, "hue": 0.1},
}


def make_store(root: str, videos: int, frames: int, size: int) -> None:
    """Synthetic gray video store: per-frame lzf datasets (reference
    layout), content is a drifting blob + noise so lzf neither free-rides
    nor degenerates."""
    from extdm_tpu.data import HDF5VideoWriter

    rs = np.random.RandomState(0)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    t0 = time.perf_counter()
    total_bytes = 0
    for split, n in (("train", videos), ("valid", max(8, videos // 20))):
        writer = HDF5VideoWriter(os.path.join(root, split), force=True)
        for v in range(n):
            cx, cy = rs.rand(2) * size
            vx, vy = rs.randn(2) * 1.5
            noise = rs.randint(0, 30, (frames, size, size), dtype=np.uint8)
            vid = []
            for t in range(frames):
                blob = 200.0 * np.exp(-(((xx - (cx + vx * t)) % size) ** 2 +
                                        ((yy - (cy + vy * t)) % size) ** 2) / 50.0)
                vid.append((blob + noise[t]).clip(0, 255).astype(np.uint8))
            writer.add_video(vid)
            total_bytes += frames * size * size
        writer.close()
    print(f"wrote {total_bytes/1e9:.2f} GB raw frames in "
          f"{time.perf_counter()-t0:.0f}s -> {root}")


def sweep(root: str, stage: str, worker_counts, n_batches: int, batch: int,
          num_frames: int, size: int, step_time_ms: float,
          worker_type: str = "thread"):
    from extdm_tpu.data import DataLoader, TwoFramesDataset, VideoDataset

    if stage == "dm":
        ds = VideoDataset(root, type="train", num_frames=num_frames,
                          image_size=size, seed=0)
        frames_per_item = num_frames
    else:
        ds = TwoFramesDataset(root, type="train", frame_shape=size,
                              max_frame_distance=50,
                              augmentation_params=AE_AUG, seed=0)
        frames_per_item = 2

    results = []
    for w in worker_counts:
        loader = DataLoader(ds, batch, num_workers=w, seed=0,
                            worker_type=worker_type)
        it = iter(loader)
        next(it)  # warm the producer thread + handle caches
        t0 = time.perf_counter()
        n = 0
        for _ in range(n_batches):
            try:
                next(it)
                n += 1
            except StopIteration:
                break
        dt = time.perf_counter() - t0
        bps = n / dt
        res = {
            "stage": stage, "workers": w, "worker_type": worker_type,
            "batches_per_s": round(bps, 2),
            "frames_per_s": round(bps * batch * frames_per_item, 1),
            "ms_per_batch": round(1000 / bps, 1),
            "data_share_of_step": round((1000 / bps) / step_time_ms, 3),
        }
        results.append(res)
        print(json.dumps(res))
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--make", action="store_true")
    p.add_argument("--videos", type=int, default=2000)
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--stage", default="both", choices=["dm", "ae", "both"])
    p.add_argument("--workers", default="0,1,2,4,8,16")
    p.add_argument("--worker_type", default="thread",
                   choices=["thread", "process"])
    p.add_argument("--batches", type=int, default=20)
    p.add_argument("--dm_batch", type=int, default=32)
    p.add_argument("--ae_batch", type=int, default=100)
    p.add_argument("--num_frames", type=int, default=30, help="DM clip length (KTH 10+20)")
    # measured on-chip step times (IMPLEMENTATION_NOTES): DM b16 ~592ms
    # wall -> per-b32-batch ~1184ms; AE b100 ~250ms. data_share is
    # ms_per_batch/step_time: the loader keeps the chip fed iff << 1.
    p.add_argument("--dm_step_ms", type=float, default=1184.0)
    p.add_argument("--ae_step_ms", type=float, default=250.0)
    args = p.parse_args()

    if args.make:
        make_store(args.root, args.videos, args.frames, args.size)
        return

    workers = [int(x) for x in args.workers.split(",")]
    if args.stage in ("dm", "both"):
        sweep(args.root, "dm", workers, args.batches, args.dm_batch,
              args.num_frames, args.size, args.dm_step_ms,
              worker_type=args.worker_type)
    if args.stage in ("ae", "both"):
        sweep(args.root, "ae", workers, args.batches, args.ae_batch,
              args.num_frames, args.size, args.ae_step_ms,
              worker_type=args.worker_type)


if __name__ == "__main__":
    main()
