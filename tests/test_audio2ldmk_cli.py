"""CLI drive of the SadTalker engine incl. --face3dvis artifacts
(inference.py --face3dvis contract: landmarks.npy + 3dface.mp4 + dot video)."""

import os
import wave

import numpy as np
import pytest
from scipy.io import savemat

from mofa_tpu.apps.audio2ldmk_app import main


def _write_wav(path, seconds=0.3, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    pcm = (np.sin(2 * np.pi * 220 * t) * 12000).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def _write_bfm_mat(path, n=40, f=60, seed=0):
    rng = np.random.RandomState(seed)
    tri = rng.randint(1, n + 1, (f, 3))          # 1-based like BFM09
    point_buf = np.full((n, 8), f + 1)
    for v in range(n):
        owners = np.nonzero((tri == v + 1).any(axis=1))[0][:8] + 1
        point_buf[v, :len(owners)] = owners
    savemat(path, {
        "meanshape": rng.randn(1, n * 3).astype(np.float32),
        "idBase": (rng.randn(n * 3, 80) * 0.05).astype(np.float32),
        "exBase": (rng.randn(n * 3, 64) * 0.05).astype(np.float32),
        "keypoints": rng.randint(1, n + 1, (1, 68)).astype(np.float64),
        "texBase": (rng.randn(n * 3, 80) * 5).astype(np.float32),
        "meantex": (rng.rand(1, n * 3) * 255).astype(np.float32),
        "tri": tri.astype(np.float64),
        "point_buf": point_buf.astype(np.float64),
    })


def test_sadtalker_cli_face3dvis(tmp_path):
    from PIL import Image

    wav = str(tmp_path / "a.wav")
    _write_wav(wav)
    mat = str(tmp_path / "bfm.mat")
    _write_bfm_mat(mat)
    img = str(tmp_path / "ref.png")
    Image.fromarray(np.zeros((40, 48, 3), np.uint8)).save(img)

    rng = np.random.RandomState(1)
    coeff = str(tmp_path / "coeff.npz")
    np.savez(coeff,
             full_3dmm=(rng.randn(1, 257) * 0.1).astype(np.float32),
             trans_params=np.array([256, 256, 1.0, 0, 0, 10, 12, 200],
                                   np.float32))

    save_dir = str(tmp_path / "out")
    main(["--ref_image_path", img, "--audio_path", wav,
          "--face_npz", "unused", "--save_dir", save_dir,
          "--engine", "sadtalker", "--coeff_npz", coeff,
          "--bfm_mat", mat, "--face3dvis"])

    lm = np.load(os.path.join(save_dir, "landmarks.npy"))
    assert lm.ndim == 3 and lm.shape[1:] == (68, 2) and lm.shape[0] >= 2
    assert os.path.getsize(os.path.join(save_dir, "3dface.mp4")) > 0
    assert os.path.getsize(os.path.join(save_dir, "landmarks_vis.mp4")) > 0


TASK = ("/root/reference/MOFA-Video-Hybrid/aniportrait/src/utils/mp_models/"
        "face_landmarker_v2_with_blendshapes.task")
DEMO_FACE = "/root/reference/MOFA-Video-Keypoint/demo/images/000001.jpg"


@pytest.mark.skipif(not (os.path.exists(TASK) and os.path.exists(DEMO_FACE)),
                    reason="reference mp_models/demo not mounted")
def test_aniportrait_cli_in_framework_landmarker(tmp_path):
    """(image, wav) -> landmarks.npy with ZERO external stages: the --task
    path runs FaceLandmarkerJax in place of the reference's LMKExtractor
    (audio2ldmk.py:207/217-221)."""
    wav = str(tmp_path / "a.wav")
    _write_wav(wav, seconds=0.25)
    save_dir = str(tmp_path / "out")
    main(["--ref_image_path", DEMO_FACE, "--audio_path", wav,
          "--task", TASK, "--save_dir", save_dir,
          "--engine", "aniportrait", "--tiny"])
    lm = np.load(os.path.join(save_dir, "landmarks.npy"))
    assert lm.ndim == 3 and lm.shape[1:] == (68, 2) and lm.shape[0] >= 2
    # landmarks land inside the demo image
    assert (lm[..., 0] >= 0).all() and (lm[..., 0] <= 512).all()
    assert (lm[..., 1] >= 0).all() and (lm[..., 1] <= 512).all()
