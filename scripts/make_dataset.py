"""Dataset preparation CLI.

The reference README documents converter scripts that are absent from its
snapshot (README.md:77-132: SMMNIST download+convert, KTH 01/02/03, BAIR,
cityscapes, UCF). This CLI supplies:

- `shapes`: fully synthetic SMMNIST-style bouncing sprites (no network) —
  the CPU-runnable end-to-end path;
- `frames`: convert a directory tree of per-video frame folders
  (root/<video>/<frame>.png|jpg) into the HDF5 shard layout;
- `npy`: convert an (N, T, H, W[, C]) .npy/.npz array (e.g. BAIR exports).

All outputs use the reference on-disk layout (data/h5.py) so either
framework can read them.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def convert_frames_tree(src: str, out: str, image_size: int, split: str):
    import cv2

    from extdm_tpu.data import HDF5VideoWriter

    videos = sorted(d for d in glob.glob(os.path.join(src, "*")) if os.path.isdir(d))
    assert videos, f"no video dirs under {src}"
    writer = HDF5VideoWriter(os.path.join(out, split), force=True)
    for vdir in videos:
        frames = []
        for fp in sorted(glob.glob(os.path.join(vdir, "*"))):
            img = cv2.imread(fp, cv2.IMREAD_UNCHANGED)
            if img is None:
                continue
            if img.ndim == 3:
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            if image_size and img.shape[0] != image_size:
                img = cv2.resize(img, (image_size, image_size), interpolation=cv2.INTER_AREA)
            frames.append(img.astype(np.uint8))
        if frames:
            writer.add_video(frames)
    writer.close()
    print(f"wrote {len(videos)} videos to {out}/{split}")


def convert_video_files(src: str, out: str, split: str, image_size: int, gray: bool):
    """Decode video files (avi/mp4/...) with cv2 into the shard layout —
    covers the reference's documented KTH/UCF converters (README.md:77-132)."""
    import cv2

    from extdm_tpu.data import HDF5VideoWriter

    files = sorted(
        f for f in glob.glob(os.path.join(src, "**", "*"), recursive=True)
        if os.path.splitext(f)[1].lower() in (".avi", ".mp4", ".mov", ".mkv", ".webm")
    )
    assert files, f"no video files under {src}"
    writer = HDF5VideoWriter(os.path.join(out, split), force=True)
    n = 0
    for path in files:
        cap = cv2.VideoCapture(path)
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if gray:
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            else:
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            if image_size and frame.shape[0] != image_size:
                frame = cv2.resize(frame, (image_size, image_size),
                                   interpolation=cv2.INTER_AREA)
            frames.append(frame.astype(np.uint8))
        cap.release()
        if frames:
            writer.add_video(frames)
            n += 1
    writer.close()
    print(f"wrote {n} videos to {out}/{split}")


def convert_npy(src: str, out: str, split: str):
    from extdm_tpu.data import write_video_hdf5

    arr = np.load(src)
    if hasattr(arr, "files"):
        arr = arr[arr.files[0]]
    assert arr.ndim in (4, 5), arr.shape
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    write_video_hdf5(arr, os.path.join(out, split))
    print(f"wrote {arr.shape[0]} videos to {out}/{split}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("shapes", help="synthetic bouncing-sprites dataset")
    sp.add_argument("--out", required=True)
    sp.add_argument("--num_train", type=int, default=256)
    sp.add_argument("--num_valid", type=int, default=64)
    sp.add_argument("--num_frames", type=int, default=30)
    sp.add_argument("--image_size", type=int, default=64)
    sp.add_argument("--seed", type=int, default=0)

    fp = sub.add_parser("frames", help="frame-folder tree -> h5 shards")
    fp.add_argument("--src", required=True)
    fp.add_argument("--out", required=True)
    fp.add_argument("--split", default="train")
    fp.add_argument("--image_size", type=int, default=64)

    np_ = sub.add_parser("npy", help="(N,T,H,W[,C]) array -> h5 shards")
    np_.add_argument("--src", required=True)
    np_.add_argument("--out", required=True)
    np_.add_argument("--split", default="train")

    vp = sub.add_parser("videos", help="directory of video files -> h5 shards (cv2)")
    vp.add_argument("--src", required=True)
    vp.add_argument("--out", required=True)
    vp.add_argument("--split", default="train")
    vp.add_argument("--image_size", type=int, default=64)
    vp.add_argument("--gray", action="store_true", help="store grayscale (KTH-style)")

    mp = sub.add_parser("smmnist",
                        help="stochastic moving MNIST from raw MNIST idx files")
    mp.add_argument("--mnist_images", required=True,
                    help="path to train-images-idx3-ubyte[.gz]")
    mp.add_argument("--out", required=True)
    mp.add_argument("--split", default="train")
    mp.add_argument("--num_videos", type=int, default=8000)
    mp.add_argument("--num_frames", type=int, default=30)
    mp.add_argument("--image_size", type=int, default=64)
    mp.add_argument("--num_digits", type=int, default=2)
    mp.add_argument("--seed", type=int, default=0)

    bp = sub.add_parser("bair",
                        help="BAIR push tfrecords -> h5 shards (no tensorflow)")
    bp.add_argument("--src", required=True, help="directory of .tfrecord files")
    bp.add_argument("--out", required=True)
    bp.add_argument("--split", default="train")

    kp = sub.add_parser("kth", help="raw KTH avis -> person-split h5 stores "
                                    "(train persons 01-20, test 21-25)")
    kp.add_argument("--src", required=True, help="dir of KTH .avi files "
                                                 "(flat or per-action)")
    kp.add_argument("--out", required=True)
    kp.add_argument("--image_size", type=int, default=64)

    cp = sub.add_parser("cityscapes",
                        help="leftImg8bit_sequence png tree -> h5 shards")
    cp.add_argument("--src", required=True,
                    help="leftImg8bit_sequence root (contains train/ val/)")
    cp.add_argument("--out", required=True)
    cp.add_argument("--image_size", type=int, default=64)
    cp.add_argument("--splits", default="train:train,val:test",
                    help="comma list of <src_split>:<out_split>")

    up = sub.add_parser("ucf101",
                        help="UCF-101 avis + ucfTrainTestlist -> single h5 "
                             "store with num_train/num_test metadata")
    up.add_argument("--src", required=True, help="UCF-101 root (class dirs)")
    up.add_argument("--splits_dir", required=True, help="ucfTrainTestlist dir")
    up.add_argument("--out", required=True)
    up.add_argument("--image_size", type=int, default=64)
    up.add_argument("--split_id", type=int, default=1)

    args = p.parse_args()
    if args.cmd == "shapes":
        from extdm_tpu.data import make_moving_shapes_dataset

        make_moving_shapes_dataset(args.out, args.num_train, args.num_valid,
                                   args.num_frames, args.image_size, args.seed)
        print(f"synthetic dataset at {args.out}")
    elif args.cmd == "frames":
        convert_frames_tree(args.src, args.out, args.image_size, args.split)
    elif args.cmd == "npy":
        convert_npy(args.src, args.out, args.split)
    elif args.cmd == "videos":
        convert_video_files(args.src, args.out, args.split, args.image_size, args.gray)
    elif args.cmd == "smmnist":
        from extdm_tpu.data import HDF5VideoWriter
        from extdm_tpu.data.converters import load_mnist_images, make_smmnist

        images = load_mnist_images(args.mnist_images)
        writer = HDF5VideoWriter(os.path.join(args.out, args.split), force=True)
        n = 0
        for video in make_smmnist(images, args.num_videos, args.num_frames,
                                  args.image_size, args.num_digits,
                                  seed=args.seed):
            writer.add_video(list(video))
            n += 1
        writer.close()
        print(f"wrote {n} videos to {args.out}/{args.split}")
    elif args.cmd == "kth":
        from extdm_tpu.data import HDF5VideoWriter
        from extdm_tpu.data.converters import iter_kth_videos

        writers = {s: HDF5VideoWriter(os.path.join(args.out, s), force=True)
                   for s in ("train", "test")}
        counts = {"train": 0, "test": 0}
        for split, name, video in iter_kth_videos(args.src, args.image_size):
            writers[split].add_video(list(video))
            counts[split] += 1
        for w in writers.values():
            w.close()
        print(f"wrote {counts['train']} train / {counts['test']} test "
              f"videos to {args.out}")
    elif args.cmd == "cityscapes":
        from extdm_tpu.data import HDF5VideoWriter
        from extdm_tpu.data.converters import iter_cityscapes_videos

        for pair in args.splits.split(","):
            src_split, out_split = pair.split(":")
            writer = HDF5VideoWriter(os.path.join(args.out, out_split),
                                     force=True)
            n = 0
            for video in iter_cityscapes_videos(args.src, src_split,
                                                args.image_size):
                writer.add_video(list(video))
                n += 1
            writer.close()
            print(f"wrote {n} {src_split} videos to {args.out}/{out_split}")
    elif args.cmd == "ucf101":
        from extdm_tpu.data import HDF5VideoWriter
        from extdm_tpu.data.converters import iter_ucf101_videos

        # single store, train-first (VideoDataset UCF branch layout)
        writer = HDF5VideoWriter(args.out, force=True)
        counts = {"train": 0, "test": 0}
        for split, video in iter_ucf101_videos(args.src, args.splits_dir,
                                               args.image_size,
                                               args.split_id):
            writer.add_video(list(video))
            counts[split] += 1
        writer.set_scalar("num_train", counts["train"])
        writer.set_scalar("num_test", counts["test"])
        writer.close()
        print(f"wrote {counts['train']} train + {counts['test']} test "
              f"videos to {args.out}")
    elif args.cmd == "bair":
        from extdm_tpu.data import HDF5VideoWriter
        from extdm_tpu.data.converters import iter_bair_videos

        writer = HDF5VideoWriter(os.path.join(args.out, args.split), force=True)
        n = 0
        for video in iter_bair_videos(args.src):
            writer.add_video(list(video))
            n += 1
        writer.close()
        print(f"wrote {n} videos to {args.out}/{args.split}")


if __name__ == "__main__":
    main()
