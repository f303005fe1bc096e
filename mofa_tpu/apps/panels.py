"""Side-by-side diagnostic panel videos.

Replicates the reference's composite outputs: the keypoint CLI's
5-panel video [first frame | flow viz | landmark raster | output with
landmark dots | output] (MOFA-Video-Keypoint/mofa_keypoint.py:369-408)
and the hybrid app's save_video composite that additionally shows the
drag-flow column (MOFA-Video-Hybrid/run_gradio_audio_driven.py:485-533).
All inputs are [0,1] float RGB except landmarks (pixel coords).
"""

from __future__ import annotations

import numpy as np

from mofa_tpu.ops.flow_viz import flow_to_image


def overlay_landmarks(frames01: np.ndarray, landmarks: np.ndarray) -> np.ndarray:
    """draw_landmarks_cv2 (run_gradio_audio_driven.py:43-46): red dots of
    radius 2 on each frame. frames01 [T, H, W, 3] in [0,1]; landmarks
    [T, K, 2] (x, y) pixels."""
    import cv2

    out = (np.asarray(frames01) * 255).clip(0, 255).astype(np.uint8).copy()
    t = min(out.shape[0], landmarks.shape[0])
    for k in range(t):
        for x, y in landmarks[k]:
            cv2.circle(out[k], (int(x), int(y)), 2, (255, 0, 0), -1)
    return out.astype(np.float32) / 255.0


def flow_video(flow: np.ndarray) -> np.ndarray:
    """[T-1, H, W, 2] -> [T, H, W, 3] in [0,1]: Middlebury colors with a
    white frame prepended (mofa_keypoint.py:385-390)."""
    flow = np.asarray(flow, np.float32)
    vizs = [flow_to_image(f) for f in flow]
    vizs = [np.full_like(vizs[-1], 255)] + vizs
    return np.stack(vizs).astype(np.float32) / 255.0


def compose_panels(columns) -> np.ndarray:
    """Concatenate [T, H, W, 3] float columns along width; single-image
    columns ([H, W, 3]) are tiled over time (the reference's stacked
    first-frame column)."""
    columns = [np.asarray(c, np.float32) for c in columns]
    t = max(c.shape[0] for c in columns if c.ndim == 4)
    cols = []
    for c in columns:
        if c.ndim == 3:
            c = np.repeat(c[None], t, axis=0)
        assert c.shape[0] == t, (c.shape, t)
        cols.append(c)
    return np.concatenate(cols, axis=2)


def keypoint_panel(first_frame01, controlnet_flow, ldmk_imgs01, frames01,
                   landmarks) -> np.ndarray:
    """mofa_keypoint.py:401-403 column order: first frame, flow viz,
    landmark raster, output overlaid with landmark dots, output."""
    return compose_panels([
        first_frame01,
        flow_video(controlnet_flow),
        ldmk_imgs01,
        overlay_landmarks(frames01, landmarks),
        frames01,
    ])


def hybrid_panel(first_frame01, drag_flow, face_flow, ldmk_imgs01, frames01,
                 landmarks, hint01=None) -> np.ndarray:
    """run_gradio_audio_driven.py:520-522 column order: first frame,
    [hint], drag-flow viz, face-flow viz, landmark raster, output with
    landmark dots, output. The gradio hint image is optional here (the
    CLI has no click canvas)."""
    cols = [first_frame01]
    if hint01 is not None:
        cols.append(hint01)
    cols += [
        flow_video(drag_flow),
        flow_video(face_flow),
        ldmk_imgs01,
        overlay_landmarks(frames01, landmarks),
        frames01,
    ]
    return compose_panels(cols)
