"""Trajectory-workload preprocessing: image sizing, brush split, drag->flow.

Host-side (numpy/PIL) replica of the Traj gradio app's preprocessing
(/root/reference/MOFA-Video-Traj/run_gradio.py) feeding the jit pipelines:

- `preprocess_image`: shortest side -> target, center-crop to /64
  (run_gradio.py:663-689);
- `divide_points_afterinterpolate`: split interpolated tracks by the motion
  brush (run_gradio.py:41-58; mask indexed [row][col] = [y][x]);
- `prepare_trajectory_flow`: PCHIP-interpolate tracks to model_length and
  rasterize sparse flow at 384^2 (run_gradio.py:498-527);
- `DragFlowEngine`: CMP completion at 384 + nearest-resize with per-axis
  scaling to target res + in/out-brush merge (run_gradio.py:236-333).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mofa_tpu.models.cmp.model import CMP, cmp_preprocess
from mofa_tpu.ops.flow import rescale_flow, merge_flows
from mofa_tpu.ops.rasterize import rasterize_trajectories
from mofa_tpu.ops.trajectory import interpolate_trajectory


def preprocess_image(image: "np.ndarray | object", target_size: int = 512):
    """PIL image or HWC uint8 array -> (np.float32 [H,W,3] in [0,1], (H, W)).

    Shortest side resized to target_size (bilinear), then center-cropped so
    both sides are multiples of 64 (run_gradio.py:663-689)."""
    from PIL import Image
    if not hasattr(image, "resize"):
        image = Image.fromarray(np.asarray(image))
    raw_w, raw_h = image.size
    ratio = target_size / min(raw_w, raw_h)
    image = image.resize((round(raw_w * ratio), round(raw_h * ratio)),
                         Image.BILINEAR)
    new_w, new_h = image.size
    crop_w, crop_h = new_w - new_w % 64, new_h - new_h % 64
    left = round((new_w - crop_w) / 2.0)
    top = round((new_h - crop_h) / 2.0)
    image = image.convert("RGB").crop((left, top, left + crop_w, top + crop_h))
    arr = np.asarray(image, np.float32) / 255.0
    return arr, (crop_h, crop_w)


def divide_points_afterinterpolate(points: np.ndarray,
                                   motion_brush_mask: np.ndarray):
    """points [K, N, 2] (x, y); mask [H, W] with 255 inside the brush.
    Returns (in_tracks, out_tracks)."""
    in_m, out_m = [], []
    for k in range(points.shape[0]):
        x, y = int(points[k, 0, 1]), int(points[k, 0, 0])
        (in_m if motion_brush_mask[x][y] == 255 else out_m).append(points[k])
    return np.array(in_m), np.array(out_m)


def prepare_trajectory_flow(tracks: Sequence[Sequence[tuple]],
                            model_length: int, height: int, width: int,
                            raster_size: int = 384):
    """User click tracks -> (sparse_flow [T-1, 384, 384, 2],
    mask [T-1, 384, 384]); tracks are PCHIP-resampled to model_length and
    scaled from (height, width) to the 384^2 CMP canvas."""
    resized = []
    for tr in tracks:
        if len(tr) < 2:
            continue
        pts = interpolate_trajectory(tr, model_length)
        pts = np.asarray(pts, np.float64)
        pts[:, 0] *= raster_size / width
        pts[:, 1] *= raster_size / height
        resized.append(pts)
    if not resized:
        t = model_length - 1
        return (np.zeros((t, raster_size, raster_size, 2), np.float32),
                np.zeros((t, raster_size, raster_size), np.float32))
    arr = np.stack(resized)  # [K, model_length, 2]
    s_flow, mask = rasterize_trajectories(
        arr, model_length - 1, raster_size, raster_size)
    return s_flow.astype(np.float32), mask.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("cmp",))
def _cmp_apply_jit(cmp, params, image, sparse, mask):
    """One compiled program for the CMP forward (module static — flax
    modules are frozen dataclasses; params as ARGS so jit never bakes the
    resnet50 weights in as constants, CLAUDE.md rule)."""
    return cmp.apply(params, image, sparse, mask)


class DragFlowEngine:
    """CMP sparse-to-dense completion + resize/scale, as one jit program."""

    def __init__(self, cmp_params, cmp_cfg=None):
        self.cmp = CMP(cmp_cfg) if cmp_cfg is not None else CMP()
        self.cmp_params = cmp_params

    def get_cmp_flow(self, frames01: jnp.ndarray, sparse_flow: jnp.ndarray,
                     mask: jnp.ndarray,
                     brush_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """frames01 [b, t, 384, 384, 3] in (0,1); sparse_flow [b, t, 384, 384, 2];
        mask [b, t, 384, 384, 2] -> dense flow [b, t, 384, 384, 2]
        (run_gradio.py:236-258)."""
        b, t = frames01.shape[:2]
        flat = lambda x: x.reshape((b * t,) + x.shape[2:])
        flow = _cmp_apply_jit(self.cmp, self.cmp_params,
                              cmp_preprocess(flat(frames01)),
                              flat(sparse_flow), flat(mask))
        if brush_mask is not None:
            flow = flow * brush_mask[None, :, :, None]
        return flow.reshape((b, t) + flow.shape[1:])

    def get_flow(self, first_frame01_384: jnp.ndarray,
                 sparse_flow_384: jnp.ndarray, mask_384: jnp.ndarray,
                 height: int, width: int,
                 brush_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """first_frame01_384 [b, 384, 384, 3]; sparse/mask [b, t, 384, 384, 2]
        -> controlnet flow [b, t, height, width, 2] (run_gradio.py:261-277)."""
        t = sparse_flow_384.shape[1]
        frames = jnp.repeat(first_frame01_384[:, None], t, axis=1)
        flow = self.get_cmp_flow(frames, sparse_flow_384, mask_384, brush_mask)
        if (height, width) != flow.shape[2:4]:
            flow = rescale_flow(flow, height, width)
        return flow

    def get_drag_flow_with_brush(self, first_frame01_384, s_flow_in, mask_in,
                                 s_flow_out, mask_out, brush_mask_384,
                                 height: int, width: int) -> jnp.ndarray:
        """In-brush and out-brush flows completed separately then merged by
        nonzero-ness (run_gradio.py:315-333)."""
        f_in = self.get_flow(first_frame01_384, s_flow_in, mask_in,
                             height, width, brush_mask=brush_mask_384)
        f_out = self.get_flow(first_frame01_384, s_flow_out, mask_out,
                              height, width,
                              brush_mask=1.0 - brush_mask_384)
        return merge_flows(f_in, f_out)


def visualize_drag(background01: np.ndarray, tracks, width: int = 4) -> np.ndarray:
    """Draw drag trajectories as arrowed polylines on a copy of the image
    (visualize_drag_v2, run_gradio.py:180-212). background01 [H, W, 3] in
    (0,1); tracks: list of [N, 2] (x, y). Returns uint8 RGBA hint image."""
    import cv2
    h, w = background01.shape[:2]
    canvas = np.zeros((h, w, 4), np.uint8)
    for tr in tracks:
        tr = np.asarray(tr)
        if len(tr) < 2:
            continue
        for a, b in zip(tr[:-1], tr[1:]):
            cv2.line(canvas, (int(a[0]), int(a[1])), (int(b[0]), int(b[1])),
                     (255, 0, 0, 255), width)
        end, prev = tr[-1], tr[-2]
        cv2.arrowedLine(canvas, (int(prev[0]), int(prev[1])),
                        (int(end[0]), int(end[1])), (255, 0, 0, 255), width,
                        tipLength=0.5)
    alpha = canvas[..., 3:4].astype(np.float32) / 255.0
    rgb = (background01 * 255).astype(np.float32)
    out = rgb * (1 - alpha) + canvas[..., :3].astype(np.float32) * alpha
    return out.astype(np.uint8)
