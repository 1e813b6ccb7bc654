"""Grid / strip / gif visualizers for training artifacts.

Covers the reference's utils/visualize.py:14-344 (pics / row strips /
bordered comparison gif-grids with cond=blue pred=orange borders,
LFAE_visualize, sample_img) with numpy + imageio only (mediapy-free).
Videos here are (T, H, W, C) float in [0, 1].
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

COND_COLOR = (0, 114, 189)  # blue
PRED_COLOR = (217, 83, 25)  # orange


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def add_border(frame: np.ndarray, color, width: int = 2) -> np.ndarray:
    """frame: (H, W, 3) uint8."""
    out = frame.copy()
    c = np.asarray(color, np.uint8)
    out[:width], out[-width:] = c, c
    out[:, :width], out[:, -width:] = c, c
    return out


def video_strip(video: np.ndarray, max_frames: int = 10) -> np.ndarray:
    """(T, H, W, C) -> one horizontal strip image."""
    T = video.shape[0]
    step = max(1, T // max_frames)
    frames = [to_uint8(video[t]) for t in range(0, T, step)][:max_frames]
    return np.concatenate(frames, axis=1)


def comparison_grid(rows: Sequence[np.ndarray], max_frames: int = 10) -> np.ndarray:
    """Stack strips of several videos (e.g. real / recon / sample)."""
    strips = [video_strip(v, max_frames) for v in rows]
    w = min(s.shape[1] for s in strips)
    return np.concatenate([s[:, :w] for s in strips], axis=0)


def bordered_video(video: np.ndarray, cond_frames: int) -> List[np.ndarray]:
    """Frames with blue borders for cond, orange for pred (ref :60-120)."""
    out = []
    for t in range(video.shape[0]):
        color = COND_COLOR if t < cond_frames else PRED_COLOR
        out.append(add_border(to_uint8(video[t]), color))
    return out


def save_gif(path: str, frames: Sequence[np.ndarray], fps: int = 10) -> None:
    import imageio

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    imageio.mimsave(path, list(frames), duration=1000.0 / fps, loop=0)


def save_image(path: str, img: np.ndarray) -> None:
    import imageio

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    imageio.imwrite(path, img if img.dtype == np.uint8 else to_uint8(img))


def _nearest_upscale(img: np.ndarray, size: int) -> np.ndarray:
    """Integer nearest-neighbor upscale of (h, w[, c]) to (size, size[, c])."""
    r = max(1, size // img.shape[0])
    out = np.repeat(np.repeat(img, r, axis=0), r, axis=1)
    return out[:size, :size]


def dm_shot_panel(ret: dict, target_frame: np.ndarray, nf: int, tc: int) -> np.ndarray:
    """One 2x5 DM training shot frame (ref scripts/DM/train.py:316-345):

        | src | real_out | real_warp | real_grid | real_conf |
        | tar | fake_out | fake_warp | fake_grid | fake_conf |

    `ret` is FlowDiffusion.make_monitor output (numpy, batch element 0 is
    rendered), `target_frame` the real video frame at absolute index nf,
    `nf` in [tc, tc+tp). Returns (2*msk, 5*msk, 3) uint8.
    """
    from extdm_tpu.utils.flow_viz import conf2fig, grid2fig

    msk = target_frame.shape[0]
    nfp = nf - tc  # index into the fake (pred-only) tensors

    def px(img):
        return to_uint8(np.asarray(img, np.float32))

    def conf_img(conf):
        if conf is None:
            return np.full((msk, msk, 3), 255, np.uint8)
        g = _nearest_upscale(conf2fig(np.asarray(conf, np.float32)), msk)
        return np.stack([g] * 3, axis=-1)

    def grid_img(grid):
        return grid2fig(np.asarray(grid, np.float32), grid_size=12, img_size=msk)

    top = [
        px(ret["ref_imgs"][0]),
        px(ret["real_out_vid"][0, nf]),
        px(ret["real_warped_vid"][0, nf]),
        grid_img(ret["real_vid_grid"][0, nf]),
        conf_img(None if ret.get("real_vid_conf") is None else ret["real_vid_conf"][0, nf]),
    ]
    bot = [
        px(target_frame),
        px(ret["fake_out_vid"][0, nfp]),
        px(ret["fake_warped_vid"][0, nfp]),
        grid_img(ret["fake_vid_grid"][0, nfp]),
        conf_img(None if ret.get("fake_vid_conf") is None else ret["fake_vid_conf"][0, nfp]),
    ]
    return np.concatenate(
        [np.concatenate(top, axis=1), np.concatenate(bot, axis=1)], axis=0
    )


def dm_imgshot(ret: dict, video: np.ndarray, tc: int, tp: int) -> np.ndarray:
    """The reference imgshot: one panel at the middle predicted frame."""
    nf = tc + tp // 2
    return dm_shot_panel(ret, np.asarray(video[0, nf], np.float32), nf, tc)


def dm_vidshot(ret: dict, video: np.ndarray, tc: int, tp: int) -> List[np.ndarray]:
    """The reference vidshot: one panel per predicted frame -> gif frames."""
    return [dm_shot_panel(ret, np.asarray(video[0, nf], np.float32), nf, tc)
            for nf in range(tc, tc + tp)]


def visualize_comparison_gif(
    path: str,
    real: np.ndarray,
    sample: np.ndarray,
    cond_frames: int,
    fps: int = 10,
) -> None:
    """Side-by-side real|sample gif with cond/pred borders (ref :60-161)."""
    real_frames = bordered_video(real, cond_frames)
    sample_frames = bordered_video(sample, cond_frames)
    frames = [np.concatenate([r, s], axis=1) for r, s in zip(real_frames, sample_frames)]
    save_gif(path, frames, fps)


def lfae_visualize(
    path_prefix: str,
    real: np.ndarray,
    recon: np.ndarray,
    warped: Optional[np.ndarray] = None,
    max_frames: int = 10,
) -> None:
    """Reconstruction grid: real / recon / (warped) (ref LFAE_visualize :283-336)."""
    rows = [real, recon] + ([warped] if warped is not None else [])
    save_image(path_prefix + "_grid.png", comparison_grid(rows, max_frames))


def visualize_ori_pre_flow_diff(
    save_path: str,
    origin: np.ndarray,
    result: np.ndarray,
    origin_flow: np.ndarray,
    result_flow: np.ndarray,
    video_diff: Optional[np.ndarray] = None,
    flow_diff: Optional[np.ndarray] = None,
    epoch_or_step_num: int = 0,
    cond_frame_num: int = 10,
    fps: int = 2,
) -> List[str]:
    """GT-vs-prediction analysis gifs (ref utils/visualize.py:245-281).

    All inputs are (B, T, H, W, 3) float in [0, 1]. Per video, each frame is
    a 2x3 tile [[origin, result, video_diff], [origin_flow, result_flow,
    flow_diff]] with blue cond / orange pred borders; one gif per video
    named ``{i:03}_psnr{value}.gif``. The diff rows default to the rms
    channel difference (as vis/save_new.py:27-28 computes them).
    """
    if video_diff is None:
        video_diff = np.sqrt(((origin - result) ** 2).mean(-1))[..., None].repeat(3, -1)
    if flow_diff is None:
        flow_diff = np.sqrt(((origin_flow - result_flow) ** 2).mean(-1))[..., None].repeat(3, -1)
    mse = ((origin[:, cond_frame_num:] - result[:, cond_frame_num:]) ** 2).mean(
        axis=(1, 2, 3, 4)
    )
    psnr = 10 * np.log10(1.0 / np.maximum(mse, 1e-12))

    out_dir = os.path.join(save_path, str(epoch_or_step_num), "gif_grid")
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(origin.shape[0]):
        frames = []
        for t in range(origin.shape[1]):
            top = np.concatenate(
                [to_uint8(origin[i, t]), to_uint8(result[i, t]), to_uint8(video_diff[i, t])],
                axis=1,
            )
            bot = np.concatenate(
                [to_uint8(origin_flow[i, t]), to_uint8(result_flow[i, t]),
                 to_uint8(flow_diff[i, t])],
                axis=1,
            )
            tile = np.concatenate([top, bot], axis=0)
            color = COND_COLOR if t < cond_frame_num else PRED_COLOR
            frames.append(add_border(tile, color))
        path = os.path.join(out_dir, f"{i:03d}_psnr{psnr[i]:.3f}.gif")
        save_gif(path, frames, fps)
        paths.append(path)
    return paths


def _disk_mask(h: int, w: int, cy: float, cx: float, radius: float):
    ys, xs = np.ogrid[:h, :w]
    return (ys - cy) ** 2 + (xs - cx) ** 2 <= radius**2


class RegionVisualizer:
    """Region/keypoint diagnostics grid (reference util.py Visualizer
    :313-432): source/driving frames with region centers, colored heatmaps,
    deformed image, occlusion map, prediction — rendered matplotlib-free.
    """

    def __init__(self, kp_size: int = 5, colormap: str = "gist_rainbow",
                 region_bg_color=(0, 0, 0)):
        self.kp_size = kp_size
        self.colormap_name = colormap
        self.region_bg_color = np.asarray(region_bg_color, np.float32)

    def _color(self, i: int, n: int):
        import matplotlib.cm as cm

        return np.asarray(cm.get_cmap(self.colormap_name)(i / max(n, 1))[:3], np.float32)

    def draw_image_with_kp(self, image: np.ndarray, kp: np.ndarray) -> np.ndarray:
        """image (H, W, 3) float [0,1]; kp (K, 2) in [-1, 1] (x, y)."""
        img = image.copy()
        h, w = img.shape[:2]
        pix = (kp + 1) / 2 * np.asarray([w, h])
        for i, (x, y) in enumerate(pix):
            mask = _disk_mask(h, w, y, x, self.kp_size)
            img[mask] = self._color(i, len(pix))
        return img

    def colored_heatmap(self, heatmap: np.ndarray) -> np.ndarray:
        """heatmap (H, W, K) -> (H, W, 3) colored composite (ref :291-310)."""
        h, w, K = heatmap.shape
        parts, weights = [], []
        for i in range(K):
            part = heatmap[..., i:i+1]
            part = part / max(part.max(), 1e-8)
            weights.append(part)
            parts.append(part * self._color(i, K))
        weight = np.sum(weights, axis=0)
        bg_w = 1 - np.minimum(1, weight)
        weight = np.maximum(1, weight)
        return (np.sum(parts, axis=0) / weight + bg_w * self.region_bg_color).clip(0, 1)

    def visualize(self, source: np.ndarray, driving: np.ndarray, out: dict,
                  index: int = 0) -> np.ndarray:
        """Build the diagnostics grid for one sample; inputs are numpy
        channels-last arrays as produced by the LFAE forward."""
        import cv2

        h, w = source.shape[1:3]
        cells = []
        src_params = out["source_region_params"]
        cells.append(self.draw_image_with_kp(source[index], np.asarray(src_params["shift"][index])))
        if "heatmap" in src_params:
            hm = np.asarray(src_params["heatmap"][index])
            hm = cv2.resize(hm, (w, h), interpolation=cv2.INTER_LINEAR)
            cells.append(self.colored_heatmap(hm))
        if "deformed" in out:
            cells.append(np.asarray(out["deformed"][index]))
        drv_params = out["driving_region_params"]
        cells.append(self.draw_image_with_kp(driving[index], np.asarray(drv_params["shift"][index])))
        cells.append(np.asarray(out["prediction"][index]))
        if "occlusion_map" in out:
            occ = np.asarray(out["occlusion_map"][index])
            occ = cv2.resize(occ, (w, h), interpolation=cv2.INTER_LINEAR)
            if occ.ndim == 2:
                occ = occ[..., None]
            cells.append(np.repeat(occ, 3, axis=-1))
        # 2-row grid
        n = len(cells)
        cols = (n + 1) // 2
        blank = np.zeros_like(cells[0])
        cells = cells + [blank] * (2 * cols - n)
        rows = [np.concatenate(cells[:cols], axis=1), np.concatenate(cells[cols:], axis=1)]
        return to_uint8(np.concatenate(rows, axis=0))
