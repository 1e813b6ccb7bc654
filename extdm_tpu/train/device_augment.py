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


def augment_pairs(source: jnp.ndarray, driving: jnp.ndarray, key: jax.Array,
                  flip_param: Optional[dict] = None,
                  jitter_param: Optional[dict] = None):
    """source/driving: uint8 stored layout or f32 (B, H, W, 3).
    Returns the augmented f32 RGB pair."""
    src = canonicalize_images(source)
    drv = canonicalize_images(driving)
    B = src.shape[0]
    ks = jax.random.split(key, 7)

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
