"""Tests for the in-framework FaceLandmarker (mofa_tpu/models/mp_face.py) —
the LMKExtractor replacement for the reference's mediapipe stack
(/root/reference/MOFA-Video-Hybrid/aniportrait/src/utils/mp_utils.py:19-93).

Two layers:
  * synthetic-pose recovery for the geometry stage (_solve_pose): rigidly
    transform the canonical metric face, project it with the same
    weak-perspective camera, and require exact recovery of R / scale /
    metric landmarks;
  * an end-to-end run on the reference's own demo face
    (MOFA-Video-Keypoint/demo/images/000001.jpg) through the real .task
    weights, asserting the full mp_utils output contract.
"""

import os
import zipfile

import numpy as np
import pytest

TASK = ("/root/reference/MOFA-Video-Hybrid/aniportrait/src/utils/mp_models/"
        "face_landmarker_v2_with_blendshapes.task")
DEMO_FACE = "/root/reference/MOFA-Video-Keypoint/demo/images/000001.jpg"

pytestmark = pytest.mark.skipif(
    not os.path.exists(TASK), reason="reference mp_models not mounted")


@pytest.fixture(scope="module")
def geometry():
    from mofa_tpu.models.mp_face import parse_geometry_metadata
    with zipfile.ZipFile(TASK) as z:
        buf = z.read("geometry_pipeline_metadata_landmarks.binarypb")
    return parse_geometry_metadata(buf)


def test_geometry_metadata_parse(geometry):
    canonical, tris, weights = geometry
    assert canonical.shape == (468, 5)
    assert tris.shape[1] == 3 and tris.min() >= 0 and tris.max() < 468
    # mediapipe uses a sparse set of stable (rigid) landmarks for Procrustes
    assert (weights > 0).sum() > 10
    # canonical face is metric (cm scale): ~14cm interocular span region
    span = canonical[:, :3].max(0) - canonical[:, :3].min(0)
    assert 5.0 < span[0] < 30.0


def _project(runtime, aspect):
    """Invert _solve_pose's unprojection: metric -> normalized screen."""
    near = 1.0
    top = near * np.tan(np.radians(63.0 / 2))
    right = top * aspect
    l0 = (runtime[:, 0] / right + 1) / 2
    l1 = (-runtime[:, 1] / top + 1) / 2
    l2 = -runtime[:, 2] / right
    return np.stack([l0, l1, l2], -1).astype(np.float32)


def _rot(yaw, pitch, roll):
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cr, sr = np.cos(roll), np.sin(roll)
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    Rz = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
    return (Rz @ Rx @ Ry).astype(np.float64)


@pytest.mark.parametrize("yaw,pitch,roll", [
    (0.0, 0.0, 0.0),
    (0.3, -0.15, 0.2),
    (-0.5, 0.25, -0.1),
])
def test_solve_pose_synthetic_recovery(geometry, yaw, pitch, roll):
    # Build a FaceLandmarkerJax shell with only the geometry fields set —
    # _solve_pose touches canonical/proc_weights alone.
    from mofa_tpu.models.mp_face import FaceLandmarkerJax
    canonical, tris, weights = geometry
    lm = FaceLandmarkerJax(None, None, None, None, None, None,
                           canonical, tris, weights)

    R = _rot(yaw, pitch, roll)
    scale = 0.04                      # weak-perspective scale (face ~25 units away)
    t = np.array([0.01, -0.02, -0.5])  # in front of the camera (z < 0)
    runtime = scale * (canonical[:, :3] @ R.T) + t
    aspect = 1.25
    lmks = _project(runtime, aspect)

    trans, metric = lm._solve_pose(lmks, aspect)

    # rotation recovered exactly (rigid input, weighted Procrustes is exact)
    np.testing.assert_allclose(trans[:3, :3], R, atol=1e-4)
    # metric landmarks == canonical (pose removed, no expression deformation)
    np.testing.assert_allclose(metric, canonical[:, :3], atol=1e-3)
    # translation columns: t_xy/scale and depth -near/scale
    np.testing.assert_allclose(trans[0, 3], t[0] / scale, rtol=1e-4)
    np.testing.assert_allclose(trans[1, 3], t[1] / scale, rtol=1e-4)
    np.testing.assert_allclose(trans[2, 3], -1.0 / scale, rtol=1e-4)


def test_solve_pose_relative_consistency(geometry):
    # Downstream (AniPortrait retargeting) consumes RELATIVE poses:
    # trans_mat(pose2) @ inv(trans_mat(pose1)) must equal the true relative
    # rotation regardless of translation/scale.
    from mofa_tpu.models.mp_face import FaceLandmarkerJax
    canonical, tris, weights = geometry
    lm = FaceLandmarkerJax(None, None, None, None, None, None,
                           canonical, tris, weights)
    R1, R2 = _rot(0.1, 0.0, 0.05), _rot(0.4, -0.2, 0.05)
    out = []
    for R, s, t in ((R1, 0.05, (-0.02, 0.0, -0.6)),
                    (R2, 0.035, (0.03, 0.01, -0.45))):
        runtime = s * (canonical[:, :3] @ R.T) + np.asarray(t)
        trans, _ = lm._solve_pose(_project(runtime, 1.0), 1.0)
        out.append(trans)
    rel = out[1][:3, :3] @ out[0][:3, :3].T
    np.testing.assert_allclose(rel, R2 @ R1.T, atol=1e-4)


def test_blaze_anchors():
    from mofa_tpu.models.mp_face import blaze_anchors
    a = blaze_anchors()
    assert a.shape == (896, 2)
    # stride-8 grid contributes 16*16*2, stride-16 grid 8*8*6
    assert np.isclose(a[0], [0.5 / 16, 0.5 / 16]).all()
    assert (a > 0).all() and (a < 1).all()


def test_weighted_nms_blends_overlaps():
    from mofa_tpu.models.mp_face import weighted_nms
    boxes = np.array([[0.1, 0.1, 0.5, 0.5],
                      [0.12, 0.1, 0.52, 0.5],     # overlaps first
                      [0.7, 0.7, 0.9, 0.9]], np.float32)
    kps = np.tile(boxes[:, None, :2], (1, 6, 1))
    scores = np.array([0.9, 0.6, 0.8], np.float32)
    out = weighted_nms(boxes, kps, scores)
    assert len(out) == 2
    blended = out[0][0]
    want = (boxes[0] * 0.9 + boxes[1] * 0.6) / 1.5
    np.testing.assert_allclose(blended, want, atol=1e-6)


@pytest.mark.skipif(not os.path.exists(DEMO_FACE),
                    reason="keypoint demo image not mounted")
def test_end_to_end_demo_face():
    from PIL import Image
    from mofa_tpu.models.mp_face import load_face_landmarker
    lm = load_face_landmarker(TASK)
    img = np.asarray(Image.open(DEMO_FACE).convert("RGB"))
    out = lm(img)
    assert out is not None, "no face found in the reference demo image"

    lmks = out["lmks"]
    assert lmks.shape == (478, 3)
    # landmarks inside the image with margin
    assert (lmks[:, :2] > -0.1).all() and (lmks[:, :2] < 1.1).all()
    # face spans a substantial part of a portrait crop
    span = lmks[:, :2].max(0) - lmks[:, :2].min(0)
    assert (span > 0.15).all() and (span < 1.0).all()
    # mediapipe topology: landmark 33 (right eye outer) left of 263 (left eye)
    assert lmks[33, 0] < lmks[263, 0]
    # chin (152) below forehead (10)
    assert lmks[152, 1] > lmks[10, 1]

    assert out["lmks3d"].shape == (468, 3)
    assert np.isfinite(out["lmks3d"]).all()
    assert out["trans_mat"].shape == (4, 4)
    # rotation block orthonormal, det +1; face in front of the camera
    R = out["trans_mat"][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    assert np.linalg.det(R) > 0.9
    assert out["trans_mat"][2, 3] < 0
    # 51 blendshapes (neutral dropped), sigmoid range
    assert out["bs"].shape == (51,)
    assert (out["bs"] >= 0).all() and (out["bs"] <= 1).all()
    # faces are 1-based triangle indices (mp_utils contract)
    assert out["faces"].min() >= 1
