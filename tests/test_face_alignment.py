"""AWing FAN golden vs torch transcription + heatmap decode + 98->68 map."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from mofa_tpu.models.face_alignment import (
    FAN, calculate_points, landmark_98_to_68, get_landmarks,
)
from mofa_tpu.models.weights import convert_fan_state_dict
from tests.torch_ref.awing_torch import FAN as FANTorch


def _randomize_bn_stats(tm, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.weight.copy_(torch.randn(m.num_features, generator=g) * 0.2 + 1)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)


def test_fan_golden_two_modules():
    torch.manual_seed(0)
    tm = FANTorch(num_modules=2, num_landmarks=98).eval()
    _randomize_bn_stats(tm)
    m = FAN(num_modules=2, num_landmarks=98)

    rng = np.random.RandomState(1)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_fan_state_dict(params, tm.state_dict())

    outs = m.apply(params, jnp.asarray(x))
    with torch.no_grad():
        refs = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    assert len(outs) == len(refs) == 2
    for got, ref in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(got),
                                   np.moveaxis(ref.numpy(), 1, -1),
                                   rtol=2e-3, atol=5e-4)


def test_calculate_points_decodes_peak():
    heat = np.zeros((1, 3, 64, 64), np.float32)
    heat[0, 0, 10, 20] = 1.0
    heat[0, 0, 10, 21] = 0.5      # gradient pulls +x
    heat[0, 1, 40, 5] = 1.0
    heat[0, 1, 39, 5] = 0.5       # gradient pulls -y
    heat[0, 2, 0, 0] = 1.0        # border peak: refinement stays finite
    pts = calculate_points(heat)
    np.testing.assert_allclose(pts[0, 0], [20.75, 10.5])
    np.testing.assert_allclose(pts[0, 1], [5.5, 40.25])  # 40 - 0.25 + 0.5
    assert np.all(np.isfinite(pts))


def test_landmark_98_to_68_structure():
    lm98 = np.arange(98 * 2, dtype=np.float32).reshape(98, 2)
    lm68 = landmark_98_to_68(lm98)
    assert lm68.shape == (68, 2)
    np.testing.assert_array_equal(lm68[0], lm98[0])       # jaw start
    np.testing.assert_array_equal(lm68[16], lm98[32])     # jaw end
    np.testing.assert_array_equal(lm68[27:36], lm98[51:60])   # nose
    np.testing.assert_array_equal(lm68[48:68], lm98[76:96])   # mouth
    np.testing.assert_array_equal(lm68[18], (lm98[34] + lm98[41]) / 2)
    np.testing.assert_array_equal(lm68[36], lm98[60])
    np.testing.assert_array_equal(lm68[45], lm98[72])


def test_face_fit_cli_with_fan(tmp_path):
    """face_fit_app with in-framework detection (--fan_tiny, no --kp)."""
    import os
    from PIL import Image
    from scipy.io import savemat
    from mofa_tpu.apps.face_fit_app import main

    rng = np.random.RandomState(4)
    img = str(tmp_path / "face.png")
    Image.fromarray((rng.rand(96, 96, 3) * 255).astype(np.uint8)).save(img)
    mat = str(tmp_path / "lm3d.mat")
    savemat(mat, {"lm": rng.randn(68, 3).astype(np.float64)})
    out = str(tmp_path / "fit.npz")
    main(["--image", img, "--fan_tiny", "--bbox", "8,8,88,88",
          "--lm3d_mat", mat, "--save", out, "--tiny"])
    data = np.load(out, allow_pickle=True)
    assert data["full_3dmm"].shape == (1, 257)
    assert np.all(np.isfinite(data["coeff_3dmm"]))


def test_face_fit_cli_task_autodetect(tmp_path):
    """face_fit_app fully automatic: BlazeFace box via --task (no --bbox,
    no --kp) -> FAN -> fit, on the reference's demo face."""
    import os
    import pytest
    from scipy.io import savemat
    from mofa_tpu.apps.face_fit_app import main

    task = ("/root/reference/MOFA-Video-Hybrid/aniportrait/src/utils/"
            "mp_models/face_landmarker_v2_with_blendshapes.task")
    demo = "/root/reference/MOFA-Video-Keypoint/demo/images/000001.jpg"
    if not (os.path.exists(task) and os.path.exists(demo)):
        pytest.skip("reference mp_models/demo face not mounted")
    rng = np.random.RandomState(4)
    mat = str(tmp_path / "lm3d.mat")
    savemat(mat, {"lm": rng.randn(68, 3).astype(np.float64)})
    out = str(tmp_path / "fit.npz")
    main(["--image", demo, "--fan_tiny", "--task", task,
          "--lm3d_mat", mat, "--save", out, "--tiny"])
    data = np.load(out, allow_pickle=True)
    assert data["full_3dmm"].shape == (1, 257)
    assert np.all(np.isfinite(data["coeff_3dmm"]))


def test_get_landmarks_end_to_end_smoke():
    m = FAN(num_modules=1, num_landmarks=98)
    rng = np.random.RandomState(2)
    img = (rng.rand(100, 80, 3) * 255).astype(np.uint8)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 256, 256, 3), jnp.float32))
    pred = get_landmarks(m.apply, params, img)
    assert pred.shape == (98, 2)
    assert np.all(np.isfinite(pred))
    # coords land inside the crop
    assert pred[:, 0].min() >= 0 and pred[:, 0].max() <= 80
    assert pred[:, 1].min() >= 0 and pred[:, 1].max() <= 100
    lm68 = landmark_98_to_68(pred)
    assert lm68.shape == (68, 2)
