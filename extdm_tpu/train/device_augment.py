"""In-graph (device-side) stage-1 pair augmentation.

The AE stage's host producer was transfer-bound: augmented f32 RGB pairs
are 12.6 MB/batch through the ~70 MB/s tunneled device path, against a
~0.17 s device step (round-4 evidence run: 19-52% data wait per window).
With `--device_augment` the loader ships RAW uint8 stored-layout pairs
(1/12th the bytes for gray stores) and the flip/jitter chain runs inside
the jitted train step with per-pair parameters drawn from the step key.

Semantics mirror data/augmentation.py's flip+jitter pipeline (the
KTH/SMMNIST/BAIR AE configs; geometry-changing pipelines — crop /
resize / rotation — are NOT supported here and keep the host path):
- time_flip reverses the 2-frame clip == swapping source/driving;
  when it fires, horizontal flip is skipped (ref RandomFlip semantics,
  data/augmentation.py:24-34).
- brightness/saturation/contrast/hue factors are sampled per pair from
  the same uniform ranges; hue is an exact HSV rotation (verified
  against the cv2 host path). The one distributional difference vs the
  host chain: torchvision shuffles the jitter op ORDER per clip, here
  the order is fixed (brightness, saturation, hue, contrast) — the ops
  commute up to the [0,1] clipping nonlinearity, and augmentation order
  is a regularization detail, not an inference-parity surface.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def canonicalize_images(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 (B, H, W) / (B, H, W, 1|3) stored layout -> f32 (B, H, W, 3)
    in [0, 1]; float inputs pass through (host-canonicalized path)."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        x = x.astype(jnp.float32) / 255.0
    if x.ndim == 3:
        x = x[..., None]
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    return x


def _rgb_to_hsv(x):
    """x: (..., 3) f32 in [0,1] -> (h in [0,1), s, v)."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    safe = jnp.where(delta == 0, 1.0, delta)
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta == 0, 0.0, (h / 6.0) % 1.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _luma(x):
    return (x[..., 0] * 0.299 + x[..., 1] * 0.587 + x[..., 2] * 0.114)


# ---------------------------------------------------------------------------
# Geometry (rotation -> resize -> crop), jit-static shapes.
#
# The host pipeline (data/augmentation.py, ref data/augmentation.py order
# flip -> rotation -> resize -> crop -> jitter) materializes the rotated
# and resized intermediates per clip with cv2. In-graph that would mean
# DYNAMIC shapes (resized dims depend on the sampled scale), so instead
# the three ops are composed into ONE per-pair affine coordinate map from
# the static (out, out) output grid back into the stored frame, followed
# by a single bilinear gather with zero fill — numerically the same
# composition, evaluated lazily. Deliberate deltas vs the host chain
# (regularization details, not inference-parity surfaces, same spirit as
# the fixed jitter order documented above):
# - resize interpolation is bilinear (host default is cv2 nearest);
# - crop offsets are continuous uniform over the same support (host draws
#   integers);
# - out-of-source pixels blend to 0 over a half-pixel band (host: hard
#   zero border for rotation/pad, edge-replicate for resize clamping).
# Pure crops (scale 1, no rotation, integer offsets) are bit-exact.
# ---------------------------------------------------------------------------


def _bilinear_zero(img, ys, xs):
    """img (H, W, C); ys/xs (h, w) f32 source coords -> (h, w, C),
    bilinear with zero fill outside the source rectangle."""
    H, W = img.shape[0], img.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]

    def corner(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        return jnp.where(valid[..., None], img[yc, xc], 0.0)

    top = corner(y0, x0) * (1 - wx) + corner(y0, x0 + 1) * wx
    bot = corner(y0 + 1, x0) * (1 - wx) + corner(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


def sample_geometry(key: jax.Array, B: int, in_hw, out_size: int,
                    resize_param: Optional[dict] = None,
                    rotation_param: Optional[dict] = None,
                    crop_param: Optional[dict] = None):
    """Draw per-pair (angle, per-axis scale, per-axis offset) matching the
    host samplers (RandomRotation / RandomResize / RandomCrop):
    - angle ~ U(-degrees, degrees);
    - one scale ~ U(*ratio) for both axes, snapped to the exact per-axis
      ratios floor(dim*s)/dim that cv2.resize(int(w*s), int(h*s)) uses;
    - crop offset per axis: U(0, resized_dim - out) when the resized
      frame covers the crop, else the host's centered zero-pad offset
      -((out - resized_dim) // 2).
    Returns (angle_rad, sy, sx, offy, offx), each (B,)."""
    H, W = in_hw
    ka, ks, ky, kx = jax.random.split(key, 4)
    if rotation_param:
        deg = rotation_param.get("degrees", 0.0)
        lo, hi = ((-deg, deg) if not isinstance(deg, (tuple, list))
                  else tuple(deg))
        angle = jax.random.uniform(ka, (B,), minval=lo, maxval=hi)
        angle = angle * (np.pi / 180.0)
    else:
        angle = jnp.zeros((B,))
    if resize_param:
        lo, hi = resize_param.get("ratio", (3.0 / 4.0, 4.0 / 3.0))
        s = jax.random.uniform(ks, (B,), minval=lo, maxval=hi)
    else:
        s = jnp.ones((B,))
    # cv2.resize targets int(dim * s): snap to the realized per-axis ratio
    sy = jnp.floor(H * s) / H
    sx = jnp.floor(W * s) / W

    def offset(k, scale, dim):
        resized = jnp.floor(dim * scale)
        span = jnp.maximum(resized - out_size, 0.0)
        u = jax.random.uniform(k, (B,)) * span
        pad_top = jnp.floor((out_size - resized) / 2.0)
        return jnp.where(resized >= out_size, u, -pad_top)

    if crop_param or resize_param:
        offy = offset(ky, sy, H)
        offx = offset(kx, sx, W)
    else:
        offy = jnp.zeros((B,))
        offx = jnp.zeros((B,))
    return angle, sy, sx, offy, offx


def apply_geometry(img: jnp.ndarray, out_size: int, angle, sy, sx, offy,
                   offx) -> jnp.ndarray:
    """img (B, H, W, C) f32 -> (B, out, out, C): per-pair composed
    rotation(center, cv2 convention) -> resize(sy, sx) -> crop(offy, offx),
    one bilinear gather per image."""
    B, H, W = img.shape[0], img.shape[1], img.shape[2]
    rows = jnp.arange(out_size, dtype=jnp.float32)
    cols = jnp.arange(out_size, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(rows, cols, indexing="ij")

    def one(im, a, syi, sxi, oy, ox):
        # crop -> resized coords; resize -> rotated coords (cv2
        # center-aligned convention src = (dst + 0.5)/s - 0.5)
        ry = (gy + oy + 0.5) / syi - 0.5
        rx = (gx + ox + 0.5) / sxi - 0.5
        # rotation: cv2.getRotationMatrix2D((w/2, h/2), angle) forward map
        # is [[c, s], [-s, c]] about the center; sample src via inverse
        cy, cx = H / 2.0, W / 2.0
        dy, dx = ry - cy, rx - cx
        c, sn = jnp.cos(a), jnp.sin(a)
        src_x = c * dx - sn * dy + cx
        src_y = sn * dx + c * dy + cy
        return _bilinear_zero(im, src_y, src_x)

    return jax.vmap(one)(img, angle, sy, sx, offy, offx)


def augment_pairs(source: jnp.ndarray, driving: jnp.ndarray, key: jax.Array,
                  flip_param: Optional[dict] = None,
                  jitter_param: Optional[dict] = None,
                  resize_param: Optional[dict] = None,
                  rotation_param: Optional[dict] = None,
                  crop_param: Optional[dict] = None):
    """source/driving: uint8 stored layout or f32 (B, H, W, 3).
    Returns the augmented f32 RGB pair (host op order: flip -> rotation
    -> resize -> crop -> jitter; geometry params shared across the pair,
    like the host's clip-level transforms)."""
    src = canonicalize_images(source)
    drv = canonicalize_images(driving)
    B = src.shape[0]
    ks = jax.random.split(key, 8)

    fp = flip_param or {}
    if fp.get("time_flip"):
        tmask = jax.random.bernoulli(ks[0], 0.5, (B,))
        src, drv = (jnp.where(tmask[:, None, None, None], drv, src),
                    jnp.where(tmask[:, None, None, None], src, drv))
        hcoin = jax.random.bernoulli(ks[1], 0.5, (B,))
        hmask = jnp.logical_and(~tmask, hcoin)
    else:
        hmask = jax.random.bernoulli(ks[1], 0.5, (B,))
    if fp.get("horizontal_flip"):
        m = hmask[:, None, None, None]
        src = jnp.where(m, src[:, :, ::-1], src)
        drv = jnp.where(m, drv[:, :, ::-1], drv)

    if resize_param or rotation_param or crop_param:
        cs = (crop_param or {}).get("size", src.shape[1])
        if isinstance(cs, (tuple, list)):
            assert cs[0] == cs[1], "device geometry supports square crops"
            cs = cs[0]
        out_size = int(cs)
        geo = sample_geometry(ks[7], B, (src.shape[1], src.shape[2]),
                              out_size, resize_param=resize_param,
                              rotation_param=rotation_param,
                              crop_param=crop_param)
        src = apply_geometry(src, out_size, *geo)
        drv = apply_geometry(drv, out_size, *geo)

    jp = jitter_param or {}

    def factor(k, name):
        a = jp.get(name, 0.0)
        if not a:
            return None
        return jax.random.uniform(k, (B, 1, 1, 1),
                                  minval=max(0.0, 1.0 - a), maxval=1.0 + a)

    bf = factor(ks[2], "brightness")
    sf = factor(ks[3], "saturation")
    cf = factor(ks[4], "contrast")
    hue = jp.get("hue", 0.0)
    hf = (jax.random.uniform(ks[5], (B, 1, 1), minval=-hue, maxval=hue)
          if hue else None)

    def jitter(img):
        # factors are (B, 1, 1, 1) and broadcast against (B, H, W, C)
        # or (B, H, W, 1) intermediates
        if bf is not None:
            img = jnp.clip(img * bf, 0.0, 1.0)
        if sf is not None:
            gray = _luma(img)[..., None]
            img = jnp.clip(gray * (1.0 - sf) + img * sf, 0.0, 1.0)
        if hf is not None:
            h, s, v = _rgb_to_hsv(img)
            img = jnp.clip(_hsv_to_rgb((h + hf) % 1.0, s, v), 0.0, 1.0)
        if cf is not None:
            mean = _luma(img).mean(axis=(-2, -1), keepdims=True)[..., None]
            img = jnp.clip(mean * (1.0 - cf) + img * cf, 0.0, 1.0)
        return img

    return jitter(src), jitter(drv)


def prepare_batch(batch: Dict[str, jnp.ndarray], key: jax.Array,
                  augment: Optional[dict]) -> Dict[str, jnp.ndarray]:
    """Canonicalize (and optionally augment) a {source, driving} batch
    inside the train step."""
    src, drv = batch["source"], batch["driving"]
    if augment is not None:
        src, drv = augment_pairs(src, drv, key, **augment)
    else:
        src, drv = canonicalize_images(src), canonicalize_images(drv)
    out = dict(batch)
    out["source"], out["driving"] = src, drv
    return out
