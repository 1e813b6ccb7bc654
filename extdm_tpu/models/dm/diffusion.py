"""Gaussian diffusion over video latents.

Semantics match /root/reference/model/BaseDM_adaptor/Diffusion.py:39-328:
cosine beta schedule (fp64 -> fp32 buffers), epsilon-prediction with
L1 / L2(x10) loss, Imagen-style dynamic thresholding of the decoded x0,
ancestral sampling, and the DDIM sampler with the reference's exact time
grid (linspace(0, T, steps+2)[:-1], paired) and its `alphas_cumprod_prev`
indexing.

TPU design: the schedule is precomputed in numpy; sampling is a single
`lax.scan` over the (static) step pairs — one compiled program reused by
the autoregressive rollout. The denoise function is passed in as a closure
(params are baked by the caller), keeping this module purely functional.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.9999)


@dataclass(frozen=True)
class DiffusionSchedule:
    """All schedule buffers, fp32, as numpy constants baked into the jit."""

    num_timesteps: int
    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray

    @staticmethod
    def create(timesteps: int = 1000) -> "DiffusionSchedule":
        betas = cosine_beta_schedule(timesteps)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
        posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        f32 = lambda a: np.asarray(a, np.float32)
        return DiffusionSchedule(
            num_timesteps=timesteps,
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
            posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
            posterior_mean_coef2=f32(
                (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
            ),
        )


def _extract(arr: np.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    out = jnp.take(jnp.asarray(arr), t)
    return out.reshape(t.shape[0], *((1,) * (ndim - 1)))


def dynamic_threshold(x0: jnp.ndarray, percentile: float = 0.9) -> jnp.ndarray:
    """Imagen dynamic thresholding (ref :305-318): clamp to the per-sample
    `percentile` of |x0|, then rescale into [-1, 1]."""
    b = x0.shape[0]
    flat = jnp.abs(x0.reshape(b, -1))
    s = jnp.quantile(flat, percentile, axis=-1)
    s = jnp.maximum(s, 1.0)
    s = s.reshape(b, *((1,) * (x0.ndim - 1)))
    return jnp.clip(x0, -s, s) / s


def ddim_time_pairs(num_timesteps: int, sampling_steps: int) -> np.ndarray:
    """The reference's DDIM grid (:214-216): linspace(0, T, steps+2)[:-1]
    as ints, reversed, consecutive pairs. Shape (steps+1, 2)."""
    times = np.linspace(0.0, num_timesteps, sampling_steps + 2)[:-1].astype(np.int64)
    times = list(reversed(times.tolist()))
    return np.asarray(list(zip(times[:-1], times[1:])), dtype=np.int32)


DenoiseFn = Callable[..., jnp.ndarray]  # (x, t, cond_frames, cond_fea) -> eps


@dataclass(frozen=True)
class GaussianDiffusion:
    schedule: DiffusionSchedule
    sampling_timesteps: int = 10
    ddim_eta: float = 1.0
    loss_type: str = "l2"
    use_dynamic_thres: bool = True
    dynamic_thres_percentile: float = 0.9

    # --- q process -----------------------------------------------------------
    def q_sample(self, x_start, t, noise):
        s = self.schedule
        return (
            _extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def predict_start_from_noise(self, x_t, t, noise):
        s = self.schedule
        return (
            _extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
        )

    def q_posterior(self, x_start, x_t, t):
        s = self.schedule
        mean = (
            _extract(s.posterior_mean_coef1, t, x_t.ndim) * x_start
            + _extract(s.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        var = _extract(s.posterior_variance, t, x_t.ndim)
        log_var = _extract(s.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, var, log_var

    def _maybe_threshold(self, x0):
        if self.use_dynamic_thres:
            return dynamic_threshold(x0, self.dynamic_thres_percentile)
        return jnp.clip(x0, -1.0, 1.0)

    # --- training -------------------------------------------------------------
    def p_losses(
        self,
        denoise_fn: DenoiseFn,
        key: jax.Array,
        x_cond: jnp.ndarray,
        x_pred: jnp.ndarray,
        cond_fea: Optional[jnp.ndarray],
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (loss, pred_x0). x_*: (B, T, h, w, C) latents."""
        b = x_pred.shape[0]
        key_t, key_noise = jax.random.split(key)
        t = jax.random.randint(key_t, (b,), 0, self.schedule.num_timesteps)
        noise = jax.random.normal(key_noise, x_pred.shape, x_pred.dtype)
        x_noisy = self.q_sample(x_pred, t, noise)
        pred_noise = denoise_fn(x_noisy, t, x_cond, cond_fea)

        if self.loss_type == "l1":
            loss = jnp.abs(noise - pred_noise).mean()
        elif self.loss_type == "l2":
            loss = jnp.mean((noise * 10.0 - pred_noise * 10.0) ** 2)
        else:
            raise NotImplementedError(self.loss_type)

        pred_x0 = self.predict_start_from_noise(x_noisy, t, pred_noise)
        pred_x0 = self._maybe_threshold(pred_x0)
        return loss, pred_x0

    # --- DDIM sampling -----------------------------------------------------------
    def ddim_sample(
        self,
        denoise_fn: DenoiseFn,
        key: jax.Array,
        x_cond: jnp.ndarray,
        pred_frames: int,
        cond_fea: Optional[jnp.ndarray],
        init_noise: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x_cond: (B, tc, h, w, C). Returns (B, pred_frames, h, w, C).

        `init_noise` overrides the drawn x_T (reproducible trajectories /
        parity tests against the reference sampler)."""
        s = self.schedule
        B, _, h, w, C = x_cond.shape
        shape = (B, pred_frames, h, w, C)
        pairs = ddim_time_pairs(s.num_timesteps, self.sampling_timesteps)
        eta = self.ddim_eta

        key, init_key = jax.random.split(key)
        img = (jax.random.normal(init_key, shape, jnp.float32)
               if init_noise is None else init_noise.astype(jnp.float32))

        alphas_prev = jnp.asarray(s.alphas_cumprod_prev)

        def step(carry, pair):
            img, key = carry
            key, nkey = jax.random.split(key)
            time, time_next = pair[0], pair[1]
            alpha = alphas_prev[time]
            alpha_next = alphas_prev[time_next]
            t_b = jnp.full((B,), time, jnp.int32)
            pred_noise = denoise_fn(img, t_b, x_cond, cond_fea)
            x_start = self.predict_start_from_noise(img, t_b, pred_noise)
            x_start = self._maybe_threshold(x_start)

            sigma = eta * jnp.sqrt((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
            c = jnp.sqrt(jnp.maximum((1 - alpha_next) - sigma**2, 0.0))
            noise = jnp.where(time_next > 0, jax.random.normal(nkey, shape, img.dtype), 0.0)
            img = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
            return (img, key), None

        (img, _), _ = jax.lax.scan(step, (img, key), jnp.asarray(pairs))
        return img

    # --- ancestral sampling --------------------------------------------------------
    def p_sample_loop(
        self,
        denoise_fn: DenoiseFn,
        key: jax.Array,
        x_cond: jnp.ndarray,
        pred_frames: int,
        cond_fea: Optional[jnp.ndarray],
        init_noise: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        s = self.schedule
        B, _, h, w, C = x_cond.shape
        shape = (B, pred_frames, h, w, C)
        key, init_key = jax.random.split(key)
        img = (jax.random.normal(init_key, shape, jnp.float32)
               if init_noise is None else init_noise.astype(jnp.float32))

        def step(carry, t):
            img, key = carry
            key, nkey = jax.random.split(key)
            t_b = jnp.full((B,), t, jnp.int32)
            eps = denoise_fn(img, t_b, x_cond, cond_fea)
            x0 = self._maybe_threshold(self.predict_start_from_noise(img, t_b, eps))
            mean, _, log_var = self.q_posterior(x0, img, t_b)
            noise = jax.random.normal(nkey, shape, img.dtype)
            nonzero = (t > 0).astype(img.dtype)
            img = mean + nonzero * jnp.exp(0.5 * log_var) * noise
            return (img, key), None

        ts = jnp.arange(s.num_timesteps - 1, -1, -1)
        (img, _), _ = jax.lax.scan(step, (img, key), ts)
        return img

    def interpolate(
        self,
        denoise_fn: DenoiseFn,
        key: jax.Array,
        x_cond: jnp.ndarray,
        x1: jnp.ndarray,
        x2: jnp.ndarray,
        cond_fea: Optional[jnp.ndarray] = None,
        t: Optional[int] = None,
        lam: float = 0.5,
    ) -> jnp.ndarray:
        """Latent interpolation (ref Diffusion.py:260-274): noise both
        latents to step t, mix with weight lam, then ancestrally denoise
        back from t."""
        s = self.schedule
        t = s.num_timesteps - 1 if t is None else t
        B = x1.shape[0]
        key, k1 = jax.random.split(key)
        tb = jnp.full((B,), t, jnp.int32)
        noise = jax.random.normal(k1, x1.shape, x1.dtype)
        xt1 = self.q_sample(x1, tb, noise)
        xt2 = self.q_sample(x2, tb, noise)
        img = (1 - lam) * xt1 + lam * xt2

        def step(carry, ti):
            img, key = carry
            key, nkey = jax.random.split(key)
            t_b = jnp.full((B,), ti, jnp.int32)
            eps = denoise_fn(img, t_b, x_cond, cond_fea)
            x0 = self._maybe_threshold(self.predict_start_from_noise(img, t_b, eps))
            mean, _, log_var = self.q_posterior(x0, img, t_b)
            nz = (ti > 0).astype(img.dtype)
            img = mean + nz * jnp.exp(0.5 * log_var) * jax.random.normal(nkey, img.shape, img.dtype)
            return (img, key), None

        (img, _), _ = jax.lax.scan(step, (img, key), jnp.arange(t - 1, -1, -1))
        return img

    def sample(self, denoise_fn, key, x_cond, pred_frames, cond_fea=None,
               init_noise=None):
        if self.sampling_timesteps < self.schedule.num_timesteps:
            return self.ddim_sample(denoise_fn, key, x_cond, pred_frames,
                                    cond_fea, init_noise=init_noise)
        return self.p_sample_loop(denoise_fn, key, x_cond, pred_frames,
                                  cond_fea, init_noise=init_noise)


def guided_denoise_fn(denoise_fn: DenoiseFn, cond_scale: float = 1.0) -> DenoiseFn:
    """Classifier-free guidance wrapper (reference forward_with_cond_scale,
    DenoiseNet_..._ada_u22.py:1160-1170): eps = eps_null + scale*(eps - eps_null).
    The underlying denoise_fn must accept null_cond_mask."""
    if cond_scale == 1.0:
        return denoise_fn

    def fn(x, t, cond_frames, cond_fea, **kw):
        b = x.shape[0]
        full = denoise_fn(x, t, cond_frames, cond_fea,
                          null_cond_mask=jnp.zeros((b,), bool), **kw)
        null = denoise_fn(x, t, cond_frames, cond_fea,
                          null_cond_mask=jnp.ones((b,), bool), **kw)
        if cond_scale == 0.0:
            return null
        return null + (full - null) * cond_scale

    return fn
