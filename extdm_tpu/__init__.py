"""ExtDM-TPU: a TPU-native JAX framework for distribution-extrapolation
video prediction (ExtDM, CVPR 2024).

Re-designed from scratch for TPU (jax/XLA/pallas/pjit) with the same
capabilities as the PyTorch reference (SZU-AdvTech-2024/140):

- Stage 1: LFAE / RegionMM latent flow auto-encoder (unsupervised motion).
- Stage 2: 3D-UNet Gaussian diffusion over the flow+occlusion latent space
  with Motion-Adaptor distribution extrapolation.
- Data pipeline (HDF5 video shards), metrics (PSNR/SSIM/LPIPS/FVD),
  config-driven training/eval CLIs, multi-chip sharding via jax.sharding.
"""

__version__ = "0.1.0"
