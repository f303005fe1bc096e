"""Landmark-workload preprocessing: raster drawing + landmark->flow.

Host-side replica of the Hybrid/Keypoint landmark machinery
(/root/reference/MOFA-Video-Hybrid/run_gradio_audio_driven.py):

- `PARTS` / `draw_landmarks`: 15-part 68-point connectivity raster with the
  reference's exact color scheme (run_gradio_audio_driven.py:120-152);
- `prepare_landmark_flow`: landmark sequence -> sparse flow + mask at the
  working res and at the 384^2 CMP canvas (sample_inputs_face,
  run_gradio_audio_driven.py:91-117), including the reference's
  (row=y clip h, col=x clip w) scatter;
- `LandmarkFlowEngine.get_cmp_flow_landmarks`: per-frame CMP completion
  (run_gradio_audio_driven.py:654-671) — batched on TPU instead of the
  reference's python loop over b*t.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mofa_tpu.ops.rasterize import landmarks_to_sparse_flow

PARTS = [
    ("FACE", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17], (10, 200, 10)),
    ("LEFT_EYE", [43, 44, 45, 46, 47, 48, 43], (180, 200, 10)),
    ("LEFT_EYEBROW", [23, 24, 25, 26, 27], (180, 220, 10)),
    ("RIGHT_EYE", [37, 38, 39, 40, 41, 42, 37], (10, 200, 180)),
    ("RIGHT_EYEBROW", [18, 19, 20, 21, 22], (10, 220, 180)),
    ("NOSE_UP", [28, 29, 30, 31], (10, 200, 250)),
    ("NOSE_DOWN", [32, 33, 34, 35, 36], (250, 200, 10)),
    ("LIPS_OUTER_BOTTOM_LEFT", [55, 56, 57, 58], (10, 180, 20)),
    ("LIPS_OUTER_BOTTOM_RIGHT", [49, 60, 59, 58], (20, 10, 180)),
    ("LIPS_INNER_BOTTOM_LEFT", [65, 66, 67], (100, 100, 30)),
    ("LIPS_INNER_BOTTOM_RIGHT", [61, 68, 67], (100, 150, 50)),
    ("LIPS_OUTER_TOP_LEFT", [52, 53, 54, 55], (20, 80, 100)),
    ("LIPS_OUTER_TOP_RIGHT", [52, 51, 50, 49], (80, 100, 20)),
    ("LIPS_INNER_TOP_LEFT", [63, 64, 65], (120, 100, 200)),
    ("LIPS_INNER_TOP_RIGHT", [63, 62, 61], (150, 120, 100)),
]


def draw_landmarks(keypoints: np.ndarray, h: int, w: int) -> np.ndarray:
    """68-pt (x, y) -> [h, w, 3] float raster (0-255 color values), cv2
    2px polylines per facial part (run_gradio_audio_driven.py:139-152)."""
    import cv2
    image = np.zeros((h, w, 3))
    for _name, indices, color in PARTS:
        pts = keypoints[np.asarray(indices) - 1]
        for i in range(len(indices) - 1):
            x1, y1 = pts[i]
            x2, y2 = pts[i + 1]
            cv2.line(image, (int(x1), int(y1)), (int(x2), int(y2)), color,
                     thickness=2)
    return image


def draw_landmark_sequence(landmarks: np.ndarray, h: int, w: int,
                           raster: int = 320) -> np.ndarray:
    """[T, 68, 2] -> [T, h, w, 3] in [0,1]: draw at raster^2 then bilinear
    resize to (h, w) (mofa_keypoint.py:309-316 draws at 320^2)."""
    import cv2
    t = landmarks.shape[0]
    out = np.zeros((t, h, w, 3), np.float32)
    for i in range(t):
        pts = landmarks[i].astype(np.float64).copy()
        pts[:, 0] *= raster / w
        pts[:, 1] *= raster / h
        img = draw_landmarks(pts, raster, raster)
        out[i] = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR) / 255.0
    return out


def prepare_landmark_flow(landmarks: np.ndarray, h: int, w: int):
    """landmarks [b, t, 68, 2] (x, y) at working res (h, w).

    Returns dict with channel-LAST tensors:
      sparse_flow     [b, t-1, h, w, 2], mask [b, t-1, h, w, 2]
      sparse_flow_384 [b, t-1, 384, 384, 2], mask_384 [...]
      landmarks_384   [b, t, 68, 2]
    (sample_inputs_face, run_gradio_audio_driven.py:91-117)."""
    def to_last(x):  # [b, t-1, 2, h, w] -> [b, t-1, h, w, 2]
        return np.moveaxis(x, 2, -1)

    sparse, mask = landmarks_to_sparse_flow(landmarks, h, w)
    out = {"sparse_flow": to_last(sparse), "mask": to_last(mask)}
    if (h, w) != (384, 384):
        lm384 = landmarks.astype(np.float64).copy()
        lm384[..., 0] *= 384.0 / w
        lm384[..., 1] *= 384.0 / h
        s384, m384 = landmarks_to_sparse_flow(lm384, 384, 384)
        out["landmarks_384"] = lm384
        out["sparse_flow_384"] = to_last(s384)
        out["mask_384"] = to_last(m384)
    else:
        out["landmarks_384"] = landmarks
        out["sparse_flow_384"] = out["sparse_flow"]
        out["mask_384"] = out["mask"]
    return out


class LandmarkFlowEngine:
    """CMP completion for landmark-driven flow; batched over frames."""

    def __init__(self, cmp_params, cmp_cfg=None):
        from mofa_tpu.models.cmp.model import CMP
        self.cmp = CMP(cmp_cfg) if cmp_cfg is not None else CMP()
        self.cmp_params = cmp_params

    def get_cmp_flow_landmarks(self, frames01_384: jnp.ndarray,
                               sparse_384: jnp.ndarray,
                               mask_384: jnp.ndarray, height: int,
                               width: int) -> jnp.ndarray:
        """frames01_384 [b, t, 384, 384, 3]; sparse/mask [b, t, 384, 384, 2]
        -> dense flow [b, t, height, width, 2]. The reference loops b*t
        single-frame CMP calls (run_gradio_audio_driven.py:654-671); here
        the whole clip is one batched MXU-friendly forward."""
        from mofa_tpu.models.cmp.model import cmp_preprocess
        from mofa_tpu.ops.flow import rescale_flow
        from mofa_tpu.preprocess.traj import _cmp_apply_jit
        b, t = frames01_384.shape[:2]
        flat = lambda x: x.reshape((b * t,) + x.shape[2:])
        flow = _cmp_apply_jit(self.cmp, self.cmp_params,
                              cmp_preprocess(flat(frames01_384)),
                              flat(sparse_384), flat(mask_384))
        flow = flow.reshape((b, t) + flow.shape[1:])
        if (height, width) != flow.shape[2:4]:
            flow = rescale_flow(flow, height, width)
        return flow
