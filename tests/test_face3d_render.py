"""face3d render path: golden shading math vs the reference BFM class
(src/face3d/models/bfm.py, AST-extracted) + z-buffer rasterizer units."""

import ast

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from mofa_tpu.models.audio.sadtalker import BFMModel
from mofa_tpu.models.audio import face3d_render as fr

BFM_PY = ("/root/reference/MOFA-Video-Hybrid/sadtalker_audio2pose/"
          "src/face3d/models/bfm.py")


def _extract_classes(path, names, extra_globals):
    tree = ast.parse(open(path).read())
    keep = [n for n in tree.body
            if isinstance(n, (ast.ClassDef, ast.FunctionDef))
            and n.name in names]
    mod = ast.Module(body=keep, type_ignores=[])
    ns = dict(extra_globals)
    exec(compile(mod, path, "exec"), ns)
    return ns


def _synthetic_bfm(seed=0, n=50, f=80):
    rng = np.random.RandomState(seed)
    mean = rng.randn(n, 3).astype(np.float32)
    mean -= mean.mean(0, keepdims=True)
    tri = rng.randint(0, n, (f, 3)).astype(np.int64)
    point_buf = np.full((n, 8), f, np.int64)  # pad with the zero row id
    for v in range(n):
        owners = np.nonzero((tri == v).any(axis=1))[0][:8]
        point_buf[v, :len(owners)] = owners
    return BFMModel(
        mean_shape=mean.reshape(-1),
        id_base=(rng.randn(n * 3, 80) * 0.1).astype(np.float32),
        exp_base=(rng.randn(n * 3, 64) * 0.1).astype(np.float32),
        keypoints=rng.randint(0, n, 68).astype(np.int64),
        tex_base=(rng.randn(n * 3, 80) * 10).astype(np.float32),
        mean_tex=(rng.rand(n * 3) * 255).astype(np.float32),
        face_buf=tri,
        point_buf=point_buf,
    )


def _ref_facemodel(bfm):
    ns = _extract_classes(
        BFM_PY, {"SH", "ParametricFaceModel", "perspective_projection"},
        {"torch": torch, "F": F, "np": np})
    fm = ns["ParametricFaceModel"].__new__(ns["ParametricFaceModel"])
    fm.mean_shape = torch.tensor(bfm.mean_shape.reshape(-1, 1))
    fm.id_base = torch.tensor(bfm.id_base)
    fm.exp_base = torch.tensor(bfm.exp_base)
    fm.mean_tex = torch.tensor(bfm.mean_tex.reshape(1, -1))
    fm.tex_base = torch.tensor(bfm.tex_base)
    fm.face_buf = torch.tensor(bfm.face_buf)
    fm.point_buf = torch.tensor(bfm.point_buf)
    fm.keypoints = torch.tensor(bfm.keypoints)
    fm.camera_distance = bfm.camera_distance
    fm.persc_proj = torch.tensor(
        ns["perspective_projection"](bfm.focal, bfm.center))
    fm.SH = ns["SH"]()
    fm.init_lit = torch.tensor(fr.INIT_LIT.reshape(1, 1, 9))
    fm.device = "cpu"
    return fm


def test_shading_golden_vs_reference():
    bfm = _synthetic_bfm()
    fm = _ref_facemodel(bfm)
    rng = np.random.RandomState(1)
    coeffs = rng.randn(3, 257).astype(np.float32) * 0.3

    verts, colors = fr.compute_for_render(bfm, coeffs)
    with torch.no_grad():
        rv, _, rc, _ = fm.compute_for_render(torch.tensor(coeffs))
    np.testing.assert_allclose(verts, rv.numpy(), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(colors, rc.numpy(), atol=2e-5, rtol=2e-5)


def test_rasterizer_coverage_and_occlusion():
    # two axis-aligned right triangles over the image center; the second
    # sits closer to the camera and must win the z-test where they overlap
    size, focal, center = 32, 32.0, 16.0
    z_far_tri, z_near_tri = 9.0, 7.0

    def cam(px, py, z):  # pixel coords -> camera coords at depth z
        x = (px - center) * z / focal
        y = ((size - py) - center) * z / focal  # row = size - (f*y/z + c)
        return [x, y, z]

    verts = np.array(
        [cam(4, 28, z_far_tri), cam(28, 28, z_far_tri), cam(4, 4, z_far_tri),
         cam(12, 24, z_near_tri), cam(26, 24, z_near_tri), cam(12, 8, z_near_tri)],
        np.float32)
    tri = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    colors = np.array([[1, 0, 0]] * 3 + [[0, 1, 0]] * 3, np.float32)

    img, mask = fr.rasterize_mesh(
        jnp.asarray(verts), jnp.asarray(tri), jnp.asarray(colors),
        size=size, focal=focal, center=center, face_chunk=2,
        mask_quirk=False)
    img, mask = np.asarray(img), np.asarray(mask)

    assert mask[20, 8]          # far triangle only
    np.testing.assert_allclose(img[20, 8], [1, 0, 0], atol=1e-5)
    assert mask[20, 16]         # overlap: near (green) triangle wins
    np.testing.assert_allclose(img[20, 16], [0, 1, 0], atol=1e-5)
    assert not mask[2, 30]      # outside both
    np.testing.assert_allclose(img[2, 30], [0, 0, 0], atol=0)

    # pytorch3d mask quirk: face 0 treated as background
    img_q, mask_q = fr.rasterize_mesh(
        jnp.asarray(verts), jnp.asarray(tri), jnp.asarray(colors),
        size=size, focal=focal, center=center, face_chunk=2,
        mask_quirk=True)
    assert not np.asarray(mask_q)[20, 8]
    assert np.asarray(mask_q)[20, 16]


def test_rasterizer_interpolates_vertex_colors():
    size, focal, center = 32, 32.0, 16.0
    z = 8.0
    verts = np.array([[-3.0, -3.0, z], [3.0, -3.0, z], [0.0, 3.0, z]],
                     np.float32)
    tri = np.array([[0, 1, 2]], np.int32)
    colors = np.eye(3, dtype=np.float32)
    img, mask = fr.rasterize_mesh(
        jnp.asarray(verts), jnp.asarray(tri), jnp.asarray(colors),
        size=size, focal=focal, center=center, face_chunk=1,
        mask_quirk=False)
    img, mask = np.asarray(img), np.asarray(mask)
    assert mask.sum() > 20
    # constant depth -> barycentric sums to one, colors stay on the simplex
    probed = img[mask]
    np.testing.assert_allclose(probed.sum(-1), 1.0, atol=1e-4)
    assert (probed >= -1e-5).all()


def test_render_face_video_smoke():
    bfm = _synthetic_bfm(seed=2)
    rng = np.random.RandomState(3)
    coeffs = rng.randn(2, 257).astype(np.float32) * 0.2
    frames = fr.render_face_video(bfm, coeffs, size=48, face_chunk=32)
    assert frames.shape == (2, 48, 48, 3) and frames.dtype == np.uint8


def test_draw_landmark_video():
    lm = np.array([[[5.0, 7.0], [20.0, 3.0]]])
    frames = fr.draw_landmark_video(lm, 24, 32)
    assert frames.shape == (1, 24, 32, 3)
    assert tuple(frames[0, 7, 5]) == (0, 255, 0)
    assert tuple(frames[0, 3, 20]) == (0, 255, 0)
    assert tuple(frames[0, 23, 31]) == (255, 255, 255)
