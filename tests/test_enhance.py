"""paste-back + enhancer-stage contract (preprocess/enhance.py) vs the
reference paste_pic.py box math (sadtalker_audio2pose/src/utils/paste_pic.py)."""

import os

import numpy as np
import pytest

from mofa_tpu.preprocess.enhance import (crop_box, paste_back_frames,
                                         enhance_frames)


def _crop_info():
    # ((rw, rh), (clx, cly, crx, cry), (lx, ly, rx, ry))
    return ((64, 64), (10, 8, 58, 56), (4, 2, 40, 44))


def test_crop_box_matches_reference_math():
    ci = _crop_info()
    # paste_pic.py:55 — oy1, oy2, ox1, ox2 = cly+ly, cly+ry, clx+lx, clx+rx
    assert crop_box(ci) == (10 + 4, 8 + 2, 10 + 40, 8 + 44)
    # extended_crop=True uses the outer crop box (paste_pic.py:53)
    assert crop_box(ci, extended_crop=True) == (10, 8, 58, 56)


def test_paste_back_frames_blends_into_box():
    rng = np.random.RandomState(0)
    full = np.full((80, 90, 3), 40, np.uint8)
    crops = (rng.rand(3, 32, 32, 3) * 100 + 120).astype(np.uint8)
    out = paste_back_frames(crops, full, _crop_info())
    assert out.shape == (3, 80, 90, 3) and out.dtype == np.uint8
    ox1, oy1, ox2, oy2 = crop_box(_crop_info())
    # Poisson (NORMAL_CLONE) transfers the SOURCE GRADIENTS under the mask:
    # the noisy patch's texture appears inside the box while the flat
    # background stays flat
    inside_std = out[:, oy1 + 5:oy2 - 5, ox1 + 5:ox2 - 5].astype(np.float32).std()
    outside_std = out[:, :oy1 - 2, :].astype(np.float32).std()
    assert inside_std > 10.0 and outside_std < 1.0
    # far corner stays (within cv2's Poisson-solve rounding)
    diff = np.abs(out[:, :4, :4].astype(int) - full[:4, :4].astype(int))
    assert diff.max() <= 1, diff.max()


def test_paste_back_rejects_empty_box():
    with pytest.raises(ValueError):
        paste_back_frames(np.zeros((1, 8, 8, 3), np.uint8),
                          np.zeros((20, 20, 3), np.uint8),
                          ((64, 64), (5, 5, 6, 6), (3, 3, 1, 1)))


def test_enhance_frames_contract(tmp_path):
    frames = np.zeros((2, 16, 16, 3), np.uint8)
    assert enhance_frames(frames, "none") is frames

    enhanced = np.full((2, 16, 16, 3), 7, np.uint8)
    p = str(tmp_path / "enh.npz")
    np.savez(p, frames=enhanced)
    np.testing.assert_array_equal(enhance_frames(frames, "npz", p), enhanced)

    with pytest.raises(ValueError):
        enhance_frames(frames, "npz", None)
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, frames=np.zeros((5, 16, 16, 3), np.uint8))
    with pytest.raises(ValueError):
        enhance_frames(frames, "npz", bad)
    with pytest.raises(ValueError):
        enhance_frames(frames, "gfpgan")  # in-process GFPGAN is external


def test_facerender_cli_paste_back_and_enhancer(tmp_path):
    from PIL import Image
    from mofa_tpu.apps.facerender_app import main

    rng = np.random.RandomState(3)
    img = str(tmp_path / "src.png")
    Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)).save(img)
    full = str(tmp_path / "full.png")
    Image.fromarray((rng.rand(120, 100, 3) * 255).astype(np.uint8)).save(full)
    coeff = str(tmp_path / "first.npz")
    np.savez(coeff, full_3dmm=rng.randn(1, 257).astype(np.float32) * 0.1)
    drv = str(tmp_path / "drv.npz")
    np.savez(drv, coeff_3dmm=rng.randn(3, 70).astype(np.float32) * 0.1)
    ci = str(tmp_path / "ci.npz")
    np.savez(ci, crop_info=np.asarray([100, 120, 20, 30, 80, 100,
                                       5, 5, 50, 60], np.int64))
    enh = str(tmp_path / "enh.npz")
    np.savez(enh, frames=np.full((3, 32, 32, 3), 128, np.uint8))
    out = str(tmp_path / "out.mp4")
    main(["--image", img, "--coeff_npz", coeff, "--driving_coeffs_npz", drv,
          "--output", out, "--tiny", "--enhancer", "npz",
          "--enhanced_npz", enh, "--paste_back", "--full_image", full,
          "--crop_info_npz", ci])
    assert os.path.getsize(out) > 0
