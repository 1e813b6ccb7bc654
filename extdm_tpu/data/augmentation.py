"""Video clip augmentations (numpy, host-side).

Mirrors /root/reference/data/augmentation.py (torch_videovision):
RandomFlip (time + horizontal), RandomResize, RandomCrop, RandomRotation,
ColorJitter with torchvision adjust_* semantics (random factor ranges and
random op order). All ops take/return a list or array of (H, W, C) float32
frames in [0, 1] and apply the *same* sampled parameters to every frame.
"""
from __future__ import annotations

import random
from typing import List, Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

Clip = Sequence[np.ndarray]


class RandomFlip:
    def __init__(self, time_flip: bool = False, horizontal_flip: bool = False):
        self.time_flip = time_flip
        self.horizontal_flip = horizontal_flip

    def __call__(self, clip: Clip) -> Clip:
        if random.random() < 0.5 and self.time_flip:
            return list(clip)[::-1]
        if random.random() < 0.5 and self.horizontal_flip:
            return [np.fliplr(img) for img in clip]
        return clip


class RandomResize:
    def __init__(self, ratio=(3.0 / 4.0, 4.0 / 3.0), interpolation: str = "nearest"):
        self.ratio = ratio
        self.interpolation = interpolation

    def __call__(self, clip: Clip) -> Clip:
        scale = random.uniform(*self.ratio)
        h, w = clip[0].shape[:2]
        new_w, new_h = int(w * scale), int(h * scale)
        interp = cv2.INTER_NEAREST if self.interpolation == "nearest" else cv2.INTER_LINEAR
        return [cv2.resize(img, (new_w, new_h), interpolation=interp) for img in clip]


class RandomCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, clip: Clip) -> Clip:
        h, w = self.size
        im_h, im_w = clip[0].shape[:2]
        pad_h = max(0, h - im_h)
        pad_w = max(0, w - im_w)
        if pad_h or pad_w:
            clip = [
                np.pad(img, ((pad_h // 2, pad_h - pad_h // 2),
                             (pad_w // 2, pad_w - pad_w // 2)) + ((0, 0),) * (img.ndim - 2))
                for img in clip
            ]
            im_h, im_w = clip[0].shape[:2]
        y1 = 0 if h == im_h else random.randint(0, im_h - h)
        x1 = 0 if w == im_w else random.randint(0, im_w - w)
        return [img[y1 : y1 + h, x1 : x1 + w] for img in clip]


class RandomRotation:
    def __init__(self, degrees):
        self.degrees = (-degrees, degrees) if isinstance(degrees, (int, float)) else tuple(degrees)

    def __call__(self, clip: Clip) -> Clip:
        angle = random.uniform(*self.degrees)
        h, w = clip[0].shape[:2]
        mat = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
        return [cv2.warpAffine(img, mat, (w, h)) for img in clip]


def adjust_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    return np.clip(img * factor, 0.0, 1.0)


def _luma(img: np.ndarray) -> np.ndarray:
    return img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114


def adjust_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    # per-IMAGE luma mean (torchvision semantics); on a stacked (T, H, W, C)
    # clip the mean is per frame, so batched == frame-by-frame application.
    mean = _luma(img).mean(axis=(-2, -1), keepdims=True)[..., None]
    return np.clip(mean * (1 - factor) + img * factor, 0.0, 1.0)


def adjust_saturation(img: np.ndarray, factor: float) -> np.ndarray:
    gray = _luma(img)[..., None]
    return np.clip(gray * (1 - factor) + img * factor, 0.0, 1.0)


def adjust_hue(img: np.ndarray, hue: float) -> np.ndarray:
    """hue in [-0.5, 0.5] — fraction of a full hue rotation (torchvision).

    Accepts (H, W, C) or a stacked (T, H, W, C) clip — cvtColor is
    pixelwise, so the clip is flattened to (T*H, W, C) for one cv2 call
    (one-core host: per-frame cv2 dispatch dominated the jitter cost)."""
    shape = img.shape
    flat = img.astype(np.float32).reshape(-1, shape[-2], shape[-1])
    hsv = cv2.cvtColor(flat, cv2.COLOR_RGB2HSV)
    hsv[..., 0] = np.mod(hsv[..., 0] + hue * 360.0, 360.0)
    out = np.clip(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB), 0.0, 1.0)
    return out.reshape(shape)


class ColorJitter:
    def __init__(self, brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    def sample_params(self):
        b = random.uniform(max(0, 1 - self.brightness), 1 + self.brightness) if self.brightness else None
        c = random.uniform(max(0, 1 - self.contrast), 1 + self.contrast) if self.contrast else None
        s = random.uniform(max(0, 1 - self.saturation), 1 + self.saturation) if self.saturation else None
        h = random.uniform(-self.hue, self.hue) if self.hue else None
        return b, c, s, h

    def __call__(self, clip: Clip) -> Clip:
        b, c, s, h = self.sample_params()
        ops = []
        if b is not None:
            ops.append(lambda img: adjust_brightness(img, b))
        if s is not None:
            ops.append(lambda img: adjust_saturation(img, s))
        if h is not None:
            ops.append(lambda img: adjust_hue(img, h))
        if c is not None:
            ops.append(lambda img: adjust_contrast(img, c))
        random.shuffle(ops)
        # One vectorized pass over the stacked clip: every adjust_* is
        # frame-independent (contrast keeps per-frame means), so batched
        # application is numerically identical to the per-frame loop and
        # ~T x cheaper in op dispatch on the one-core host.
        stacked = np.stack(clip).astype(np.float32)
        for op in ops:
            stacked = op(stacked)
        return list(stacked.astype(np.float32))


class AllAugmentationTransform:
    """Compose per the config's augmentation_params sections (ref :323-345)."""

    def __init__(self, resize_param=None, rotation_param=None, flip_param=None,
                 crop_param=None, jitter_param=None):
        self.flip_param = flip_param
        self.jitter_param = jitter_param
        self.transforms = []
        if flip_param is not None:
            self.transforms.append(RandomFlip(**flip_param))
        if rotation_param is not None:
            self.transforms.append(RandomRotation(**rotation_param))
        if resize_param is not None:
            self.transforms.append(RandomResize(**resize_param))
        if crop_param is not None:
            self.transforms.append(RandomCrop(**crop_param))
        if jitter_param is not None:
            self.transforms.append(ColorJitter(**jitter_param))
        # geometry-preserving pipelines (flip + jitter only — the KTH/
        # SMMNIST/BAIR AE configs) admit the whole-batch vectorized path
        self.batchable = resize_param is None and rotation_param is None \
            and crop_param is None

    def __call__(self, clip: Clip) -> Clip:
        for t in self.transforms:
            clip = t(clip)
        return clip

    def batch_call(self, clips: np.ndarray) -> np.ndarray:
        """Vectorized equivalent of mapping __call__ over B clips with
        INDEPENDENT per-clip parameters (same distribution, different
        random stream): clips (B, T, H, W, C) float32 in [0,1].

        One numpy/cv2 pass per op over the whole batch replaces B x T
        python-level op dispatches — the AE stage's per-pair python
        augmentation was the measured host bottleneck on the 1-core host
        (VERDICT r3 #5; ref chain: data/augmentation.py:91-345)."""
        assert self.batchable
        B = clips.shape[0]
        out = clips
        fp = self.flip_param or {}
        if fp.get("time_flip"):
            tmask = np.random.rand(B) < 0.5
            out = out.copy()
            out[tmask] = out[tmask, ::-1]
            hmask = np.logical_and(~tmask, np.random.rand(B) < 0.5)
        else:
            hmask = np.random.rand(B) < 0.5
        if fp.get("horizontal_flip"):
            out = out.copy() if out is clips else out
            out[hmask] = out[hmask, :, :, ::-1]
        jp = self.jitter_param
        if jp:
            jit = ColorJitter(**jp)
            col = lambda lo, k: np.random.uniform(
                max(0.0, 1 - jp.get(k, 0.0)), 1 + jp.get(k, 0.0),
                (B, 1, 1, 1, 1)).astype(np.float32) if jp.get(k) else None
            b = col(0, "brightness")
            c = col(0, "contrast")
            s = col(0, "saturation")
            h = (np.random.uniform(-jp["hue"], jp["hue"], B).astype(np.float32)
                 if jp.get("hue") else None)
            ops = []
            if b is not None:
                ops.append(lambda a: np.clip(a * b, 0.0, 1.0))
            if s is not None:
                ops.append(lambda a: np.clip(
                    _luma(a)[..., None] * (1 - s) + a * s, 0.0, 1.0))
            if h is not None:
                def hue_op(a):
                    sh = a.shape
                    flat = np.ascontiguousarray(
                        a.reshape(-1, sh[-2], sh[-1]))
                    hsv = cv2.cvtColor(flat, cv2.COLOR_RGB2HSV)
                    hsv = hsv.reshape(sh)
                    hsv[..., 0] = np.mod(
                        hsv[..., 0] + h[:, None, None, None] * 360.0, 360.0)
                    rgb = cv2.cvtColor(
                        np.ascontiguousarray(hsv.reshape(-1, sh[-2], sh[-1])),
                        cv2.COLOR_HSV2RGB)
                    return np.clip(rgb.reshape(sh), 0.0, 1.0)
                ops.append(hue_op)
            if c is not None:
                ops.append(lambda a: np.clip(
                    _luma(a).mean(axis=(-2, -1), keepdims=True)[..., None]
                    * (1 - c) + a * c, 0.0, 1.0))
            # torchvision shuffles the op order per clip; one shared
            # order per batch keeps the same marginal distributions
            import random as _r
            _r.shuffle(ops)
            for op in ops:
                out = op(out)
        return out.astype(np.float32)
