"""Converter tests: MNIST idx parsing, SMMNIST synthesis, and the
dependency-free TFRecord/tf.train.Example reader (fixtures are built by
hand in the exact wire formats)."""
import gzip
import struct

import numpy as np
import pytest

from extdm_tpu.data.converters import (
    iter_bair_videos,
    iter_tfrecords,
    load_mnist_images,
    make_smmnist,
    parse_tf_example,
)


def _write_idx(path, images):
    n, r, c = images.shape
    with open(path, "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, r, c))
        f.write(images.tobytes())


class TestMNIST:
    def test_idx_roundtrip(self, tmp_path):
        rs = np.random.RandomState(0)
        imgs = rs.randint(0, 256, (5, 28, 28), dtype=np.uint8)
        p = str(tmp_path / "imgs-idx3-ubyte")
        _write_idx(p, imgs)
        out = load_mnist_images(p)
        np.testing.assert_array_equal(out, imgs)

    def test_idx_gzip(self, tmp_path):
        rs = np.random.RandomState(1)
        imgs = rs.randint(0, 256, (3, 28, 28), dtype=np.uint8)
        p = str(tmp_path / "imgs-idx3-ubyte.gz")
        with gzip.open(p, "wb") as f:
            f.write(struct.pack(">IIII", 2051, 3, 28, 28))
            f.write(imgs.tobytes())
        np.testing.assert_array_equal(load_mnist_images(p), imgs)

    def test_smmnist_generation(self):
        rs = np.random.RandomState(2)
        digits = rs.randint(0, 256, (10, 28, 28), dtype=np.uint8)
        vids = list(make_smmnist(digits, num_videos=3, num_frames=12,
                                 image_size=64, num_digits=2, seed=0))
        assert len(vids) == 3
        for v in vids:
            assert v.shape == (12, 64, 64) and v.dtype == np.uint8
            # digits actually move: frames differ
            assert (v[0] != v[-1]).any()
        # deterministic under the same seed
        vids2 = list(make_smmnist(digits, num_videos=3, num_frames=12,
                                  image_size=64, num_digits=2, seed=0))
        np.testing.assert_array_equal(vids[1], vids2[1])


# ------------------------- protobuf/tfrecord fixture builders (wire format)

def _varint(v):
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _ld(field, payload):  # length-delimited field
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _feature_bytes(vals):
    inner = b"".join(_ld(1, v) for v in vals)  # BytesList.value
    return _ld(1, inner)  # Feature.bytes_list


def _feature_floats(vals):
    packed = struct.pack(f"<{len(vals)}f", *vals)
    return _ld(2, _ld(1, packed))  # Feature.float_list (packed)


def _feature_ints(vals):
    body = b""
    for v in vals:  # Int64List.value as repeated varints
        body += _varint(1 << 3) + _varint(v)
    return _ld(3, body)


def _example(features: dict) -> bytes:
    entries = b""
    for key, feat in features.items():
        entry = _ld(1, key.encode()) + _ld(2, feat)
        entries += _ld(1, entry)  # Features.feature map entry
    return _ld(1, entries)  # Example.features


def _write_tfrecord(path, records):
    with open(path, "wb") as f:
        for rec in records:
            f.write(struct.pack("<Q", len(rec)))
            f.write(b"\x00" * 4)  # length crc (reader skips)
            f.write(rec)
            f.write(b"\x00" * 4)  # data crc


class TestTFRecord:
    def test_example_parsing(self):
        ex = _example({
            "a/encoded": _feature_bytes([b"hello"]),
            "b/floats": _feature_floats([1.5, -2.0]),
            "c/ints": _feature_ints([7, 300]),
        })
        out = parse_tf_example(ex)
        assert out["a/encoded"] == [b"hello"]
        assert out["b/floats"] == [1.5, -2.0]
        assert out["c/ints"] == [7, 300]

    def test_tfrecord_framing(self, tmp_path):
        p = str(tmp_path / "x.tfrecord")
        _write_tfrecord(p, [b"rec1", b"longer record 2"])
        assert list(iter_tfrecords(p)) == [b"rec1", b"longer record 2"]

    def test_bair_videos(self, tmp_path):
        rs = np.random.RandomState(3)
        T, H, W, C = 4, 64, 64, 3
        vids = [rs.randint(0, 256, (T, H, W, C), dtype=np.uint8) for _ in range(2)]
        records = []
        for v in vids:
            feats = {}
            for t in range(T):
                feats[f"{t}/image_aux1/encoded"] = _feature_bytes([v[t].tobytes()])
                feats[f"{t}/action"] = _feature_floats([0.0, 1.0])
            records.append(_example(feats))
        p = str(tmp_path / "traj_0.tfrecord")
        _write_tfrecord(p, records)
        out = list(iter_bair_videos(str(tmp_path)))
        assert len(out) == 2
        for got, want in zip(out, vids):
            np.testing.assert_array_equal(got, want)
