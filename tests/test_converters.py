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


def _write_avi(path, frames_gray):
    """Write (T, H, W) uint8 as an MJPG avi via cv2."""
    import cv2

    h, w = frames_gray.shape[1:]
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 25,
                         (w, h))
    assert vw.isOpened()
    for f in frames_gray:
        vw.write(cv2.cvtColor(f, cv2.COLOR_GRAY2BGR))
    vw.release()


class TestKTH:
    def test_person_split(self):
        from extdm_tpu.data.converters import kth_split

        assert kth_split("person01_boxing_d1_uncomp.avi") == "train"
        assert kth_split("/x/person20_running_d4_uncomp.avi") == "train"
        assert kth_split("person21_walking_d1_uncomp.avi") == "test"
        assert kth_split("person25_jogging_d2_uncomp.avi") == "test"
        assert kth_split("README.txt") is None

    def test_iter_kth(self, tmp_path):
        from extdm_tpu.data.converters import iter_kth_videos

        cv2 = pytest.importorskip("cv2")  # noqa: F841
        rs = np.random.RandomState(0)
        for name in ("person01_boxing_d1_uncomp.avi",
                     "person22_boxing_d1_uncomp.avi"):
            (tmp_path / "boxing").mkdir(exist_ok=True)
            _write_avi(tmp_path / "boxing" / name,
                       rs.randint(0, 256, (4, 120, 160), dtype=np.uint8))
        got = list(iter_kth_videos(str(tmp_path), image_size=64))
        assert [(s, n) for s, n, _ in got] == [
            ("train", "person01_boxing_d1_uncomp.avi"),
            ("test", "person22_boxing_d1_uncomp.avi")]
        for _, _, vid in got:
            assert vid.shape == (4, 64, 64) and vid.dtype == np.uint8


class TestCityscapes:
    def test_iter_cityscapes(self, tmp_path):
        from extdm_tpu.data.converters import iter_cityscapes_videos

        cv2 = pytest.importorskip("cv2")
        rs = np.random.RandomState(0)
        city = tmp_path / "train" / "aachen"
        city.mkdir(parents=True)
        # two 3-frame snippets (seq 000000 / 000001), 2:1 aspect like
        # the real 1024x2048 frames
        for seq in ("000000", "000001"):
            for t in range(3):
                img = rs.randint(0, 256, (64, 128, 3), dtype=np.uint8)
                cv2.imwrite(
                    str(city / f"aachen_{seq}_{t:06d}_leftImg8bit.png"),
                    img)
        vids = list(iter_cityscapes_videos(str(tmp_path), "train",
                                           image_size=32, snippet_len=3))
        assert len(vids) == 2
        for v in vids:
            assert v.shape == (3, 32, 32, 3) and v.dtype == np.uint8

    def test_center_crop_is_square_from_middle(self, tmp_path):
        from extdm_tpu.data.converters import iter_cityscapes_videos

        cv2 = pytest.importorskip("cv2")
        city = tmp_path / "val" / "munich"
        city.mkdir(parents=True)
        # left half black, center white: the square center crop keeps
        # the middle band
        img = np.zeros((32, 64, 3), np.uint8)
        img[:, 16:48] = 255
        cv2.imwrite(str(city / "munich_000000_000000_leftImg8bit.png"), img)
        (v,) = iter_cityscapes_videos(str(tmp_path), "val", image_size=32,
                                      snippet_len=1)
        assert v.mean() > 250  # all-white crop


class TestUCF101:
    def test_split_list_and_store_layout(self, tmp_path):
        from extdm_tpu.data import HDF5VideoStore, HDF5VideoWriter
        from extdm_tpu.data.converters import (iter_ucf101_videos,
                                               read_ucf_split_list)

        cv2 = pytest.importorskip("cv2")  # noqa: F841
        rs = np.random.RandomState(0)
        ucf = tmp_path / "UCF-101"
        splits = tmp_path / "ucfTrainTestlist"
        splits.mkdir()
        (ucf / "Biking").mkdir(parents=True)
        names = [f"Biking/v_Biking_g0{i}_c01.avi" for i in range(3)]
        for n in names:
            _write_avi(ucf / n, rs.randint(0, 256, (3, 48, 64),
                                           dtype=np.uint8))
        (splits / "trainlist01.txt").write_text(
            f"{names[0]} 1\n{names[1]} 1\n")
        (splits / "testlist01.txt").write_text(f"{names[2]}\n")

        assert read_ucf_split_list(str(splits), "train") == names[:2]
        assert read_ucf_split_list(str(splits), "test") == names[2:]

        out = tmp_path / "UCF101_h5"
        writer = HDF5VideoWriter(str(out), force=True)
        counts = {"train": 0, "test": 0}
        for split, video in iter_ucf101_videos(str(ucf), str(splits),
                                               image_size=48):
            # 240:320 aspect preserved -> width 64 at height 48
            assert video.shape == (3, 48, 64, 3)
            writer.add_video(list(video))
            counts[split] += 1
        writer.set_scalar("num_train", counts["train"])
        writer.set_scalar("num_test", counts["test"])
        writer.close()
        assert counts == {"train": 2, "test": 1}

        store = HDF5VideoStore(str(out))
        assert int(store.attr("num_train")) == 2
        assert int(store.attr("num_test")) == 1
        assert len(store) == 3
        store.close()
