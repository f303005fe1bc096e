"""BFM face rendering for the SadTalker `--face3dvis` debug video.

The reference rasterizes the Basel Face Model mesh with pytorch3d
(`sadtalker_audio2pose/src/face3d/util/nvdiffrast.py:32-126`, consumed by
`facerecon_model.py:129-132` and `visualize.py:99-117`) to produce the
`3dface.mp4` sanity video next to `landmarks.npy`. Here the whole path is
TPU-native: the shading math (`bfm.py:87-173`) is vectorized numpy on host
(it is tiny) and the rasterizer is a jitted JAX z-buffer whose inner edge
tests run as MXU matmuls over [pixels, faces] blocks.

Camera model (matches `facerecon_model.py:93` — fov = 2*atan(center/focal),
rasterize_size = 2*center, znear 5, zfar 15): a vertex at camera coords
(x, y, z) lands at column = focal*x/z + center, row = size - (focal*y/z +
center).  This is exactly pytorch3d's FoVPerspectiveCameras after the
renderer's x-negation (`nvdiffrast.py:68-69`) and agrees with the landmark
projection `to_image` + the y-flip in `visualize.py:86`.  Per-vertex colors
are interpolated perspective-correct; pytorch3d's `rast_out > 0` mask quirk
(face 0 is treated as background, `nvdiffrast.py:110`) is replicated behind
`mask_quirk`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# SH constants (bfm.py:19-23)
_SH_A = (np.pi, 2 * np.pi / np.sqrt(3.0), 2 * np.pi / np.sqrt(8.0))
_SH_C = (1 / np.sqrt(4 * np.pi), np.sqrt(3.0) / np.sqrt(4 * np.pi),
         3 * np.sqrt(5.0) / np.sqrt(12 * np.pi))
INIT_LIT = np.array([0.8, 0, 0, 0, 0, 0, 0, 0, 0], np.float32)


def compute_texture(tex_base: np.ndarray, mean_tex: np.ndarray,
                    tex_coeff: np.ndarray, normalize: bool = True) -> np.ndarray:
    """bfm.py:103-116 — [B, 80] tex coeffs -> [B, N, 3] RGB in (0, 1)."""
    tex = tex_coeff @ tex_base.T + mean_tex.reshape(1, -1)
    if normalize:
        tex = tex / 255.0
    return tex.reshape(len(tex_coeff), -1, 3)


def compute_norm(face_shape: np.ndarray, face_buf: np.ndarray,
                 point_buf: np.ndarray) -> np.ndarray:
    """bfm.py:118-139 — per-vertex normals: cross products of face edges,
    zero-padded row gathered through point_buf, twice normalized."""
    v1 = face_shape[:, face_buf[:, 0]]
    v2 = face_shape[:, face_buf[:, 1]]
    v3 = face_shape[:, face_buf[:, 2]]
    face_norm = np.cross(v1 - v2, v2 - v3)
    face_norm = face_norm / np.maximum(
        np.linalg.norm(face_norm, axis=-1, keepdims=True), 1e-12)
    face_norm = np.concatenate(
        [face_norm, np.zeros((face_norm.shape[0], 1, 3), face_norm.dtype)], axis=1)
    vertex_norm = face_norm[:, point_buf].sum(axis=2)
    return vertex_norm / np.maximum(
        np.linalg.norm(vertex_norm, axis=-1, keepdims=True), 1e-12)


def compute_color(face_texture: np.ndarray, face_norm: np.ndarray,
                  gamma: np.ndarray) -> np.ndarray:
    """bfm.py:141-173 — 2nd-order spherical-harmonics illumination.
    face_texture [B, N, 3] (0,1), face_norm [B, N, 3] rotated, gamma [B, 27]."""
    a, c = _SH_A, _SH_C
    b = gamma.shape[0]
    gamma = gamma.reshape(b, 3, 9) + INIT_LIT.reshape(1, 1, 9)
    gamma = gamma.transpose(0, 2, 1)  # [B, 9, 3]
    n = face_norm
    ones = np.ones_like(n[..., :1])
    y = np.concatenate([
        a[0] * c[0] * ones,
        -a[1] * c[1] * n[..., 1:2],
        a[1] * c[1] * n[..., 2:],
        -a[1] * c[1] * n[..., :1],
        a[2] * c[2] * n[..., :1] * n[..., 1:2],
        -a[2] * c[2] * n[..., 1:2] * n[..., 2:],
        0.5 * a[2] * c[2] / np.sqrt(3.0) * (3 * n[..., 2:] ** 2 - 1),
        -a[2] * c[2] * n[..., :1] * n[..., 2:],
        0.5 * a[2] * c[2] * (n[..., :1] ** 2 - n[..., 1:2] ** 2),
    ], axis=-1)                       # [B, N, 9]
    return np.einsum("bnk,bkc->bnc", y, gamma) * face_texture


def compute_for_render(bfm, coeffs257: np.ndarray):
    """bfm.py:275-300 — [B, 257] coeffs -> camera-space vertices [B, N, 3]
    and SH-lit per-vertex colors [B, N, 3].  `bfm` is a
    `sadtalker.BFMModel` loaded with render data (tex/tri/point bufs)."""
    from mofa_tpu.models.audio.sadtalker import _rotation

    idc, expc = coeffs257[:, :80], coeffs257[:, 80:144]
    texc, gamma = coeffs257[:, 144:224], coeffs257[:, 227:254]
    angles, trans = coeffs257[:, 224:227], coeffs257[:, 254:257]
    shape = (idc @ bfm.id_base.T + expc @ bfm.exp_base.T
             + bfm.mean_shape[None]).reshape(len(coeffs257), -1, 3)
    rot = _rotation(angles)
    verts = shape @ rot + trans[:, None]
    verts[..., -1] = bfm.camera_distance - verts[..., -1]

    tex = compute_texture(bfm.tex_base, bfm.mean_tex, texc)
    norm = compute_norm(shape, bfm.face_buf, bfm.point_buf)
    colors = compute_color(tex, np.einsum("bnd,bde->bne", norm, rot), gamma)
    return verts.astype(np.float32), colors.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("size", "face_chunk", "mask_quirk"))
def rasterize_mesh(verts, tri, colors, *, size: int = 224,
                   focal: float = 1015.0, center: float = 112.0,
                   znear: float = 5.0, zfar: float = 15.0,
                   face_chunk: int = 512, mask_quirk: bool = True):
    """Z-buffer rasterization of one mesh.

    verts [N, 3] camera coords (y up, +z away), tri [M, 3] int32,
    colors [N, 3] -> (image [size, size, 3], mask [size, size]).
    Edge functions for a whole face block are evaluated as one
    [pixels, 2] x [2, 3*chunk] matmul (MXU); a lax.scan over face blocks
    keeps the footprint at O(pixels * chunk).
    """
    n_faces = tri.shape[0]
    n_pad = -n_faces % face_chunk
    # pad with degenerate faces (vertex 0 thrice -> zero area, never hit)
    tri = jnp.concatenate(
        [tri, jnp.zeros((n_pad, 3), tri.dtype)], axis=0) if n_pad else tri

    z = verts[:, 2]
    col = focal * verts[:, 0] / z + center
    row = size - (focal * verts[:, 1] / z + center)
    pts = jnp.stack([col, row], axis=-1)                  # [N, 2] screen

    px = (jnp.arange(size * size) % size).astype(jnp.float32) + 0.5
    py = (jnp.arange(size * size) // size).astype(jnp.float32) + 0.5
    pix = jnp.stack([px, py], axis=-1)                    # [P, 2]

    tri_blocks = tri.reshape(-1, face_chunk, 3)
    first_valid = jnp.int32(1 if mask_quirk else 0)

    def block(carry, inp):
        zbuf, img, hit = carry
        tb, base = inp                                    # [C, 3], scalar
        v = pts[tb]                                       # [C, 3, 2]
        vz = z[tb]                                        # [C, 3]
        vc = colors[tb]                                   # [C, 3, 3]

        # edge function e_k(p) = cross(v_{k+1}-v_k, p - v_k); affine in p:
        # e_k(p) = (-a_y)*p_x + (a_x)*p_y + (a_y*v_x - a_x*v_y)
        a = v[:, (1, 2, 0)] - v                           # [C, 3, 2] edge vecs
        wmat = jnp.stack([-a[..., 1], a[..., 0]], axis=-1)      # [C, 3, 2]
        bias = a[..., 1] * v[..., 0] - a[..., 0] * v[..., 1]    # [C, 3]
        e = pix @ wmat.transpose(2, 0, 1).reshape(2, -1)        # [P, C*3] (MXU)
        e = e.reshape(-1, wmat.shape[0], 3) + bias[None]        # [P, C, 3]

        # signed 2*area = cross(v1-v0, v2-v0) = cross(a0, -a2)
        area = a[:, 0, 0] * (-a[:, 2, 1]) - a[:, 0, 1] * (-a[:, 2, 0])  # [C]
        inside = jnp.where(area[None] >= 0, (e >= 0).all(-1), (e <= 0).all(-1))
        inside &= jnp.abs(area)[None] > 1e-9                    # [P, C]

        # weight of vertex j is the opposite-edge function e_{(j+1)%3}
        bary = (e[..., (1, 2, 0)]
                / jnp.where(jnp.abs(area) > 1e-9, area, 1.0)[None, :, None])
        # perspective-correct attribute weights
        inv_z = 1.0 / vz                                        # [C, 3]
        denom = (bary * inv_z[None]).sum(-1)                    # [P, C]
        zc = 1.0 / jnp.where(denom != 0, denom, 1.0)            # camera z
        inside &= (zc >= znear) & (zc <= zfar)
        face_ids = base + jnp.arange(face_chunk)
        inside &= (face_ids >= first_valid)[None] & (face_ids < n_faces)[None]

        zc = jnp.where(inside, zc, jnp.inf)
        best = jnp.argmin(zc, axis=1)                           # [P]
        pidx = jnp.arange(zc.shape[0])
        best_z = zc[pidx, best]
        win = best_z < zbuf

        wpc = (bary * inv_z[None])[pidx, best] * best_z[:, None]  # [P, 3]
        color = jnp.einsum("pk,pkc->pc", wpc, vc[best])
        img = jnp.where(win[:, None], color, img)
        zbuf = jnp.where(win, best_z, zbuf)
        hit = hit | win
        return (zbuf, img, hit), None

    p = size * size
    init = (jnp.full((p,), jnp.inf, jnp.float32),
            jnp.zeros((p, 3), jnp.float32),
            jnp.zeros((p,), bool))
    bases = jnp.arange(tri_blocks.shape[0]) * face_chunk
    (zbuf, img, hit), _ = jax.lax.scan(block, init, (tri_blocks, bases))
    img = jnp.where(hit[:, None], img, 0.0)
    return img.reshape(size, size, 3), hit.reshape(size, size)


def render_face_video(bfm, coeffs257: np.ndarray, size: int = 224,
                      face_chunk: int = 512) -> np.ndarray:
    """visualize.py:99-117 — [B, 257] coeffs -> uint8 frames [B, H, W, 3]
    (RGB, black background), the reference's `pred_face` video."""
    verts, colors = compute_for_render(bfm, coeffs257)
    tri = jnp.asarray(bfm.face_buf.astype(np.int32))
    frames = []
    for b in range(len(verts)):
        img, _ = rasterize_mesh(jnp.asarray(verts[b]), tri,
                                jnp.asarray(colors[b]), size=size,
                                face_chunk=face_chunk)
        frames.append(np.clip(np.asarray(img), 0.0, 1.0))
    return (np.stack(frames) * 255.0).astype(np.uint8)


def draw_landmark_video(landmarks: np.ndarray, height: int, width: int,
                        radius: int = 2) -> np.ndarray:
    """visualize.py:119-126 — landmark dots on a white canvas (the index
    text overlay is dropped; dots carry the same information)."""
    t = len(landmarks)
    frames = np.full((t, height, width, 3), 255, np.uint8)
    yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    disk = (yy ** 2 + xx ** 2) <= radius ** 2
    dy, dx = np.nonzero(disk)
    dy, dx = dy - radius, dx - radius
    for k in range(t):
        for x, y in landmarks[k]:
            cy, cx = int(round(float(y))), int(round(float(x)))
            ys = np.clip(cy + dy, 0, height - 1)
            xs = np.clip(cx + dx, 0, width - 1)
            frames[k, ys, xs] = (0, 255, 0)
    return frames
