"""Per-frame driving-video 3DMM fitter — the in-framework replacement for
the reference's sadtalker_video2pose preprocessing chain:

  * face detection per frame          (facexlib RetinaFace ->
                                       BlazeFace, models/mp_face.py)
  * 68-pt alignment per frame         (facexlib AWing FAN,
                                       extract_kp_videos_safe.py:41-93 ->
                                       models/face_alignment.py, BATCHED)
  * 3DMM fit per frame                (Deep3DFaceRecon ReconNet,
                                       preprocess_fromvideo.py:150-186 ->
                                       models/audio/face3d_fit.py, BATCHED)
  * pose smoothing                    (smooth_3dmm_params,
                                       preprocess_fromvideo.py:23-37)

Output: coeff_3dmm [T, 70] = exp(64) + angle(3) + trans(3) per frame — the
driving track consumed by sadtalker_video_to_landmarks (the reference's
`--ref_pose` flow, inference.py:79-107).

TPU-first redesign: the reference runs FAN and ReconNet frame-by-frame in
a python loop; here all T crops are stacked and each network runs as ONE
batched device program. Host work is only decode / crop / NMS.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp


def read_video_frames(path: str, max_frames: Optional[int] = None,
                      stride: int = 1):
    """mp4 -> ([T, H, W, 3] uint8 RGB, fps). cv2 decode
    (extract_kp_videos_safe.py:96-108 / preprocess_fromvideo.py:98-108)."""
    import cv2

    cap = cv2.VideoCapture(path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    frames = []
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % stride == 0:
            frames.append(frame[..., ::-1].copy())   # BGR -> RGB
        i += 1
        if max_frames is not None and len(frames) >= max_frames:
            break
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return np.stack(frames), float(fps)


def detect_video_boxes(frames: np.ndarray, det_fn, det_params,
                       pad: float = 0.15) -> np.ndarray:
    """Per-frame BlazeFace box in pixel coords [T, 4] (x1, y1, x2, y2),
    padded by `pad`x the box size for the FAN crop. A frame with no
    detection reuses the previous frame's box (the reference reuses the
    previous keypoints, extract_kp_videos_safe.py:52-55); if the FIRST
    frame misses, the full frame is used."""
    from mofa_tpu.models.mp_face import detect_face

    t, h, w = frames.shape[:3]
    boxes = np.zeros((t, 4), np.float32)
    last = np.array([0, 0, w, h], np.float32)
    for i in range(t):
        det = detect_face(det_fn, det_params, frames[i].astype(np.float32)
                          / 255.0)
        if det is not None:
            b = det[0] * np.array([w, h, w, h], np.float32)
            dx, dy = (b[2] - b[0]) * pad, (b[3] - b[1]) * pad
            last = np.array([max(b[0] - dx, 0), max(b[1] - dy, 0),
                             min(b[2] + dx, w), min(b[3] + dy, h)],
                            np.float32)
        boxes[i] = last
    return boxes


def video_keypoints(frames: np.ndarray, boxes: np.ndarray,
                    fan_apply, fan_params) -> np.ndarray:
    """[T, H, W, 3] + boxes -> [T, 68, 2] keypoints (y down, frame pixel
    coords): crop to box, batched AWing FAN, 98->68, shift back
    (extract_kp_videos_safe.py:64-77)."""
    from mofa_tpu.models.face_alignment import (get_landmarks_batch,
                                                landmark_98_to_68)

    crops = []
    for f, b in zip(frames, boxes.astype(np.int32)):
        x1, y1, x2, y2 = b
        crops.append(f[y1:max(y2, y1 + 2), x1:max(x2, x1 + 2)])
    lm98 = get_landmarks_batch(fan_apply, fan_params, crops)
    kp = np.stack([landmark_98_to_68(l) for l in lm98])
    kp[:, :, 0] += boxes[:, None, 0]
    kp[:, :, 1] += boxes[:, None, 1]
    return kp.astype(np.float32)


def smooth_3dmm_params(params: np.ndarray, window_size: int = 3):
    """preprocess_fromvideo.py:23-37: per-column 'same' moving average."""
    out = np.zeros_like(params)
    window = np.ones(int(window_size)) / float(window_size)
    for i in range(params.shape[1]):
        out[:, i] = np.convolve(params[:, i], window, "same")
    return out


def fit_video_coeffs(frames_pil: List, kp68: np.ndarray, recon, recon_params,
                     lm3d_std: np.ndarray, smooth_pose: bool = True):
    """T aligned frames + keypoints -> (coeff_3dmm [T, 70],
    full_3dmm_first [1, 257], trans_params_first [8]).

    The reference loop (preprocess_fromvideo.py:150-186) aligns each frame
    with align_img then fits one-by-one; here alignment stays on host and
    the T 224-crops run through ReconNet as one batch."""
    from mofa_tpu.models.audio.face3d_fit import align_img

    ims, tps = [], []
    for img_pil, lm in zip(frames_pil, kp68):
        w, h = img_pil.size
        lm_up = lm.astype(np.float32).copy()
        lm_up[:, -1] = h - 1 - lm_up[:, -1]        # y down -> y up
        tp, im224, _ = align_img(img_pil, lm_up, lm3d_std)
        ims.append(np.asarray(im224, np.float32) / 255.0)
        tps.append(np.array([float(np.asarray(x).reshape(-1)[0])
                             for x in tp], np.float32))
    batch = jnp.asarray(np.stack(ims))
    full = np.asarray(recon.apply(recon_params, batch))   # [T, 257]
    coeff70 = np.concatenate([full[:, 80:144], full[:, 224:227],
                              full[:, 254:257]], axis=1)
    if smooth_pose:
        coeff70[:, -6:] = smooth_3dmm_params(coeff70[:, -6:], window_size=3)
    return coeff70, full[:1], tps[0]


def fit_driving_video(video_path: str, det_fn, det_params, fan_apply,
                      fan_params, recon, recon_params,
                      lm3d_std: np.ndarray, pic_size: int = 256,
                      max_frames: Optional[int] = None,
                      smooth_pose: bool = True) -> Tuple[np.ndarray, float]:
    """mp4 -> (coeff_3dmm [T, 70], fps): the full automatic chain the
    reference runs per driving-video frame (inference.py:79-92 ->
    preprocess_fromvideo.generate with if_smooth=True). Frames are resized
    to pic_size squares like the reference's `resize` preprocess mode."""
    from PIL import Image

    frames, fps = read_video_frames(video_path, max_frames=max_frames)
    # resize-mode preprocessing (preprocess_fromvideo.py:130-135)
    frames_rs = np.stack([
        np.asarray(Image.fromarray(f).resize((pic_size, pic_size),
                                             Image.BILINEAR))
        for f in frames])
    boxes = detect_video_boxes(frames_rs, det_fn, det_params)
    kp68 = video_keypoints(frames_rs, boxes, fan_apply, fan_params)
    pil_frames = [Image.fromarray(f) for f in frames_rs]
    coeff70, _, _ = fit_video_coeffs(pil_frames, kp68, recon, recon_params,
                                     lm3d_std, smooth_pose=smooth_pose)
    return coeff70, fps
