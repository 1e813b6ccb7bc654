"""Cross-video motion transfer with the LFAE (ref vis/test_flowae_run_video2video.py).

Takes an *appearance* video and one or more *motion* videos from the
dataset: the appearance video's reference frame (frame tc-1) is warped by
the flow the RegionPredictor/BGMotionPredictor estimate toward each motion
video's frames (ref :88-145), and the generator decodes the result
(forward_with_flow, ref :134-145). Saves appearance / motion / transfer
gifs plus per-frame flow figures.

TPU-first: all frames of all motion videos ride the batch axis of one
jitted LFAE program (vs the reference's per-frame python loop).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from extdm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--flowae_checkpoint", default="")
    p.add_argument("--root_dir", default=None)
    p.add_argument("--log_dir", default="logs/video2video")
    p.add_argument("--appearance_index", type=int, default=0,
                   help="dataset index providing the reference frame")
    p.add_argument("--motion_indices", default="1,2,3",
                   help="comma-separated dataset indices providing the motion")
    p.add_argument("--num_frames", type=int, default=20)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--dump_flow", action="store_true",
                   help="also save per-frame flow color + warped-grid figures")
    args = p.parse_args()

    from extdm_tpu.config import load_config
    from extdm_tpu.data import VideoDataset, to_rgb_video
    from extdm_tpu.models.dm.flow_diffusion import LFAE
    from extdm_tpu.utils import setup_seed
    from extdm_tpu.utils.visualize import save_gif, to_uint8
    from scripts.train_dm import load_lfae_variables_for_lfae

    cfg_raw = load_config(args.config)
    if args.root_dir:
        cfg_raw["dataset_params"]["root_dir"] = args.root_dir
    dp = cfg_raw["dataset_params"]
    vp = dp["valid_params"]
    tc = vp["cond_frames"]
    setup_seed(args.seed)
    os.makedirs(args.log_dir, exist_ok=True)

    dataset = VideoDataset(dp["root_dir"], type=vp["type"],
                           num_frames=args.num_frames, image_size=dp["frame_shape"],
                           random_time=False, seed=args.seed)
    motion_ids = [int(i) for i in args.motion_indices.split(",")]
    appearance = to_rgb_video(dataset[args.appearance_index][0])  # (T, H, W, 3)
    motions = np.stack([to_rgb_video(dataset[i][0]) for i in motion_ids])

    lfae = LFAE(flow_params=cfg_raw["flow_params"]["model_params"])
    variables = load_lfae_variables_for_lfae(lfae, args.flowae_checkpoint,
                                             jax.random.PRNGKey(args.seed),
                                             args.num_frames, dp["frame_shape"], tc)

    # hybrid videos: the motion clips with the appearance frame as ref at
    # tc-1 — encode_video then warps appearance -> motion-frame regions.
    ref_frame = appearance[tc - 1]
    hybrid = motions.copy()
    hybrid[:, tc - 1] = ref_frame

    encode = jax.jit(
        lambda vars_, v: lfae.apply(vars_, v, tc, True, method=LFAE.encode_video)
    )
    out = encode(variables, jnp.asarray(hybrid))
    transfer = np.asarray(out["out_vid"])  # (M, T, H, W, 3)
    flows = np.asarray(out["flow"])

    save_gif(os.path.join(args.log_dir, "appearance.gif"),
             [to_uint8(f) for f in appearance], fps=10)
    for m, mid in enumerate(motion_ids):
        save_gif(os.path.join(args.log_dir, f"motion_{mid}.gif"),
                 [to_uint8(f) for f in motions[m]], fps=10)
        save_gif(os.path.join(args.log_dir, f"transfer_{mid}.gif"),
                 [to_uint8(f) for f in transfer[m]], fps=10)
        if args.dump_flow:
            from extdm_tpu.utils.flow_viz import flow2fig, grid2fig
            from extdm_tpu.utils.visualize import save_image

            fdir = os.path.join(args.log_dir, f"flow_{mid}")
            for t in range(flows.shape[1]):
                save_image(os.path.join(fdir, f"flow_t{t:03d}.png"),
                           flow2fig(flows[m, t]))
                save_image(os.path.join(fdir, f"grid_t{t:03d}.png"),
                           grid2fig(flows[m, t], grid_size=32,
                                    img_size=dp["frame_shape"]))
    print(f"motion-transfer gifs -> {args.log_dir}")


if __name__ == "__main__":
    main()
