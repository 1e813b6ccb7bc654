"""Convert reference PyTorch checkpoints / pretrained nets to framework
checkpoints (msgpack).

Supported inputs:
- AE checkpoint (.pth with generator/region_predictor/bg_predictor)
- DM checkpoint (.pth with 'diffusion' = GaussianDiffusion state dict;
  converts the denoise_fn UNet — schedule buffers are recomputed) (--kind dm)
- torchvision VGG19 state dict            (--kind vgg19)
- lpips AlexNet LPIPS state dict          (--kind lpips)
- pytorch_i3d InceptionI3d state dict     (--kind i3d)

Requires torch (cpu) to load the .pth; conversion itself is numpy-only.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--kind", required=True,
                   choices=["ae", "dm", "vgg19", "lpips", "i3d"])
    p.add_argument("--config", default=None, help="AE yaml (for --kind ae)")
    p.add_argument("--path1", action="store_true",
                   help="include the THW-bias/alpha/beta params (path=1 "
                        "denoiser variant) in DM conversion")
    args = p.parse_args()

    import torch

    from extdm_tpu.convert.torch2jax import (
        convert_dm_checkpoint,
        convert_i3d,
        convert_lfae_checkpoint,
        convert_lpips,
        convert_vgg19,
    )
    from extdm_tpu.train import save_checkpoint

    obj = torch.load(args.src, map_location="cpu", weights_only=False)

    def as_numpy_sd(sd):
        return {k: v.detach().numpy() for k, v in sd.items()}

    if args.kind == "ae":
        assert args.config, "--config required for AE checkpoints"
        from extdm_tpu.config import load_config

        cfg = load_config(args.config)
        ckpt = {k: as_numpy_sd(v) for k, v in obj.items()
                if k in ("generator", "region_predictor", "bg_predictor")}
        variables = convert_lfae_checkpoint(ckpt, cfg["flow_params"]["model_params"])
    elif args.kind == "dm":
        sd = obj["diffusion"] if isinstance(obj, dict) and "diffusion" in obj else obj
        params = convert_dm_checkpoint(as_numpy_sd(sd) if hasattr(
            next(iter(sd.values())), "detach") else sd, path1=args.path1)
        # match scripts/train_dm.py's checkpoint layout so valid_dm
        # --checkpoint loads it directly
        variables = {"state": {"unet_params": params},
                     "example": int(obj.get("example", 0)) if isinstance(obj, dict) else 0}
    else:
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        sd = as_numpy_sd(sd)
        variables = {"vgg19": convert_vgg19, "lpips": convert_lpips,
                     "i3d": convert_i3d}[args.kind](sd)

    save_checkpoint(args.out, variables)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
