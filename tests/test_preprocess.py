"""Preprocess layer: golden vs reference host-side functions (extracted via
AST from the gradio app files, which can't be imported — module-level model
loads), plus structural checks."""

import ast
import sys

import numpy as np
import pytest

from mofa_tpu.preprocess.traj import (
    preprocess_image, divide_points_afterinterpolate, prepare_trajectory_flow)
from mofa_tpu.preprocess.landmark import (
    PARTS, draw_landmarks, prepare_landmark_flow, draw_landmark_sequence)

HYBRID_APP = "/root/reference/MOFA-Video-Hybrid/run_gradio_audio_driven.py"
TRAJ_APP = "/root/reference/MOFA-Video-Traj/run_gradio.py"


def _extract(path, names, extra_globals=None):
    """Pull selected top-level defs/assigns out of a reference app file
    WITHOUT importing it (module level loads models)."""
    tree = ast.parse(open(path).read())
    keep = [n for n in tree.body
            if (isinstance(n, (ast.FunctionDef,)) and n.name in names)
            or (isinstance(n, ast.Assign) and
                any(getattr(t, "id", None) in names for t in n.targets))]
    mod = ast.Module(body=keep, type_ignores=[])
    ns = dict(extra_globals or {})
    exec(compile(mod, path, "exec"), ns)
    return ns


def test_draw_landmarks_golden():
    import cv2
    ns = _extract(HYBRID_APP, {"PARTS", "draw_landmarks"},
                  {"np": np, "cv2": cv2})
    assert [p[0] for p in ns["PARTS"]] == [p[0] for p in PARTS]
    rng = np.random.RandomState(0)
    kps = rng.rand(68, 2) * 300 + 10
    ref = ns["draw_landmarks"](kps, 320, 320)
    got = draw_landmarks(kps, 320, 320)
    np.testing.assert_array_equal(got, ref)
    assert got.sum() > 0


def test_landmark_sparse_flow_golden():
    torch = pytest.importorskip("torch")
    import cv2  # noqa: F401
    ns = _extract(HYBRID_APP, {"sample_optical_flow", "get_sparse_flow"},
                  {"np": np, "torch": torch})
    # strip the @torch.no_grad() behavior: call inside no_grad manually
    rng = np.random.RandomState(1)
    b, t, k, h, w = 1, 5, 68, 96, 128
    lm = rng.rand(b, t, k, 2).astype(np.float32)
    lm[..., 0] *= w - 1
    lm[..., 1] *= h - 1
    with torch.no_grad():
        ref_sparse, ref_mask = ns["get_sparse_flow"](
            torch.from_numpy(lm), h, w, t)
    out = prepare_landmark_flow(lm, h, w)
    np.testing.assert_allclose(out["sparse_flow"],
                               np.moveaxis(ref_sparse.numpy(), 2, -1),
                               atol=1e-6)
    np.testing.assert_allclose(out["mask"],
                               np.moveaxis(ref_mask.numpy().astype(np.float32),
                                           2, -1), atol=0)


def test_trajectory_flow_golden():
    ns = _extract(TRAJ_APP, {"get_sparseflow_and_mask_forward"}, {"np": np})
    tracks = [
        [(10.0, 20.0), (40.0, 60.0), (80.0, 90.0)],
        [(100.0, 110.0), (140.0, 100.0)],
    ]
    model_length = 6
    h = w = 384
    s_flow, mask = prepare_trajectory_flow(tracks, model_length, h, w)

    # reference path: interpolate then rasterize at 384 (identity rescale)
    from mofa_tpu.ops.trajectory import interpolate_trajectory
    pts = np.stack([np.asarray(interpolate_trajectory(tr, model_length))
                    for tr in tracks])
    ref_flow, ref_mask = ns["get_sparseflow_and_mask_forward"](
        pts, model_length - 1, h, w)
    np.testing.assert_allclose(s_flow, ref_flow, atol=1e-6)
    np.testing.assert_allclose(mask, ref_mask, atol=1e-6)


def test_preprocess_image_sizes():
    from PIL import Image
    img = Image.fromarray(
        (np.random.RandomState(0).rand(700, 1100, 3) * 255).astype(np.uint8))
    arr, (h, w) = preprocess_image(img, target_size=512)
    assert h % 64 == 0 and w % 64 == 0
    assert min(h, w) == 512
    assert arr.shape == (h, w, 3)
    assert arr.dtype == np.float32 and 0 <= arr.min() and arr.max() <= 1


def test_divide_points_split():
    mask = np.zeros((64, 64))
    mask[:32] = 255  # rows 0..31 inside brush
    pts = np.array([
        [[5.0, 10.0], [6.0, 11.0]],   # start (x=5, y=10) -> row 10 -> in
        [[5.0, 40.0], [6.0, 41.0]],   # row 40 -> out
    ])
    inside, outside = divide_points_afterinterpolate(pts, mask)
    assert inside.shape[0] == 1 and outside.shape[0] == 1
    assert inside[0, 0, 1] == 10.0 and outside[0, 0, 1] == 40.0


def test_draw_landmark_sequence_shape():
    rng = np.random.RandomState(2)
    lm = rng.rand(3, 68, 2) * 200 + 10
    seq = draw_landmark_sequence(lm, 128, 192)
    assert seq.shape == (3, 128, 192, 3)
    assert seq.max() <= 1.0 and seq.min() >= 0.0 and seq.sum() > 0
