"""Tests for the per-frame driving-video fitter
(mofa_tpu/preprocess/video_fit.py) — the in-framework replacement of
/root/reference/MOFA-Video-Hybrid/sadtalker_video2pose preprocessing
(extract_kp_videos_safe.py:41-93, preprocess_fromvideo.py:23-37,150-186),
plus the `--engine video --driving_video` CLI path.
"""

import os
import wave

import numpy as np
import pytest
import jax

from mofa_tpu.preprocess import video_fit

TASK = ("/root/reference/MOFA-Video-Hybrid/aniportrait/src/utils/mp_models/"
        "face_landmarker_v2_with_blendshapes.task")
DEMO_FACE = "/root/reference/MOFA-Video-Keypoint/demo/images/000001.jpg"


def test_smooth_3dmm_params_matches_reference_math():
    # preprocess_fromvideo.py:23-37: per-column np.convolve 'same' average.
    rng = np.random.default_rng(0)
    x = rng.standard_normal((7, 4)).astype(np.float32)
    got = video_fit.smooth_3dmm_params(x, window_size=3)
    for c in range(4):
        want = np.convolve(x[:, c], np.ones(3) / 3.0, "same")
        np.testing.assert_allclose(got[:, c], want, rtol=1e-6)
    # interior element is the plain 3-window mean
    np.testing.assert_allclose(got[2, 1], x[1:4, 1].mean(), rtol=1e-5)


def _write_video(path, frames):
    import cv2
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (w, h))
    for f in frames:
        vw.write(f[..., ::-1])  # RGB -> BGR
    vw.release()


def test_read_video_frames_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    frames = (rng.random((4, 64, 80, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "v.mp4")
    _write_video(p, frames)
    got, fps = video_fit.read_video_frames(p)
    assert got.shape == (4, 64, 80, 3)
    assert 24 <= fps <= 26
    got2, _ = video_fit.read_video_frames(p, max_frames=2)
    assert got2.shape[0] == 2


def test_fit_video_coeffs_matches_per_frame_fit_image():
    # The batched ReconNet path must equal the reference-shaped per-frame
    # fit (models/audio/face3d_fit.fit_image) frame by frame.
    from PIL import Image
    from mofa_tpu.models.audio.face3d_fit import ReconNet, fit_image

    rng = np.random.default_rng(2)
    net = ReconNet(layers=(1, 1, 1, 1), width=8)
    params = net.init(jax.random.PRNGKey(0),
                      np.zeros((1, 224, 224, 3), np.float32))
    lm3d = rng.standard_normal((5, 3)).astype(np.float32)

    frames = [(rng.random((256, 256, 3)) * 255).astype(np.uint8)
              for _ in range(3)]
    kps = np.stack([
        np.stack([rng.uniform(60, 200, 68), rng.uniform(60, 200, 68)], -1)
        for _ in range(3)]).astype(np.float32)

    pil = [Image.fromarray(f) for f in frames]
    coeff70, full_first, tp_first = video_fit.fit_video_coeffs(
        pil, kps, net, params, lm3d, smooth_pose=False)

    assert coeff70.shape == (3, 70)
    for i in range(3):
        full, _, tp = fit_image(net, params, pil[i], kps[i], lm3d)
        want = np.concatenate([full[0, 80:144], full[0, 224:227],
                               full[0, 254:257]])
        np.testing.assert_allclose(coeff70[i], want, atol=2e-5)
        if i == 0:
            np.testing.assert_allclose(full_first[0], full[0], atol=2e-5)
            np.testing.assert_allclose(tp_first, tp, rtol=1e-5)


def test_video_keypoints_batched_matches_single():
    from mofa_tpu.models.face_alignment import (FAN, get_landmarks,
                                                landmark_98_to_68)
    rng = np.random.default_rng(3)
    net = FAN(num_modules=1)
    params = net.init(jax.random.PRNGKey(0),
                      np.zeros((1, 256, 256, 3), np.float32))
    frames = (rng.random((2, 128, 160, 3)) * 255).astype(np.uint8)
    boxes = np.array([[10, 8, 110, 120], [20, 4, 140, 124]], np.float32)

    got = video_fit.video_keypoints(frames, boxes, net.apply, params)
    assert got.shape == (2, 68, 2)
    for i in range(2):
        x1, y1, x2, y2 = boxes[i].astype(int)
        crop = frames[i][y1:y2, x1:x2]
        want = landmark_98_to_68(get_landmarks(net.apply, params, crop))
        want[:, 0] += x1
        want[:, 1] += y1
        np.testing.assert_allclose(got[i], want, atol=1e-3)


@pytest.mark.skipif(not os.path.exists(TASK),
                    reason="reference mp_models not mounted")
def test_detect_video_boxes_reuses_last_on_miss():
    from PIL import Image
    from mofa_tpu.models.mp_face import load_face_detector
    det_fn, det_params = load_face_detector(TASK)
    face = np.asarray(Image.open(DEMO_FACE).convert("RGB"))
    black = np.zeros_like(face)
    frames = np.stack([face, black, face])
    boxes = video_fit.detect_video_boxes(frames, det_fn, det_params)
    assert boxes.shape == (3, 4)
    # frame 1 (no face) reuses frame 0's box
    np.testing.assert_array_equal(boxes[1], boxes[0])
    # detected box is a proper sub-rectangle around the centered face
    assert boxes[0, 2] - boxes[0, 0] > 50
    assert boxes[0, 2] - boxes[0, 0] < face.shape[1]


@pytest.mark.skipif(not os.path.exists(TASK),
                    reason="reference mp_models not mounted")
def test_video_engine_cli_from_raw_mp4(tmp_path):
    """opendomain-style one-process video-driven run: raw driving .mp4 ->
    landmarks.npy with no --driving_coeffs_npz (VERDICT r2 item 2; matches
    sadtalker_video2pose/inference.py automatic per-frame fitting)."""
    from PIL import Image
    from scipy.io import savemat
    from mofa_tpu.apps.audio2ldmk_app import main
    from tests.test_audio2ldmk_cli import _write_bfm_mat

    face = np.asarray(Image.open(DEMO_FACE).convert("RGB"))
    video = str(tmp_path / "drive.mp4")
    # 3 frames with slight brightness drift (keeps detection stable)
    _write_video(video, [np.clip(face.astype(np.int32) + 5 * i, 0, 255)
                         .astype(np.uint8) for i in range(3)])

    mat = str(tmp_path / "bfm.mat")
    _write_bfm_mat(mat)
    lm3d_mat = str(tmp_path / "lm3d.mat")
    rng = np.random.RandomState(0)
    savemat(lm3d_mat, {"lm": rng.randn(68, 3).astype(np.float64)})

    coeff = str(tmp_path / "coeff.npz")
    np.savez(coeff,
             full_3dmm=(rng.randn(1, 257) * 0.1).astype(np.float32),
             trans_params=np.array([256, 256, 1.0, 0, 0, 10, 12, 200],
                                   np.float32))
    save_dir = str(tmp_path / "out")
    main(["--ref_image_path", DEMO_FACE, "--audio_path", "unused",
          "--save_dir", save_dir, "--engine", "video",
          "--coeff_npz", coeff, "--bfm_mat", mat,
          "--driving_video", video, "--task", TASK,
          "--fan_tiny", "--recon_tiny", "--lm3d_mat", lm3d_mat])
    lm = np.load(os.path.join(save_dir, "landmarks.npy"))
    assert lm.ndim == 3 and lm.shape[1:] == (68, 2) and lm.shape[0] == 4
    assert np.isfinite(lm).all()
