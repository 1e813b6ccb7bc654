"""Convert reference PyTorch checkpoints / pretrained nets to framework
checkpoints (msgpack).

Supported inputs:
- AE checkpoint (.pth with generator/region_predictor/bg_predictor)
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
                   choices=["ae", "vgg19", "lpips", "i3d"])
    p.add_argument("--config", default=None, help="AE yaml (for --kind ae)")
    args = p.parse_args()

    import torch

    from extdm_tpu.convert.torch2jax import (
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
    else:
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        sd = as_numpy_sd(sd)
        variables = {"vgg19": convert_vgg19, "lpips": convert_lpips,
                     "i3d": convert_i3d}[args.kind](sd)

    save_checkpoint(args.out, variables)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
