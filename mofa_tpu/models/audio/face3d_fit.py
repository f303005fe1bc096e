"""Deep3DFaceRecon 3DMM fitting — the SadTalker CropAndExtract core.

Reference: `sadtalker_audio2pose/src/face3d/models/networks.py:69-105`
(ReconNetWrapper: torchvision ResNet-50 backbone + seven 1x1 coefficient
heads -> 257-d BFM coeffs) and `src/face3d/util/preprocess.py:17-135`
(POS least-squares similarity fit of 5 landmarks to the standard 3-D
face, bicubic resize + crop to 224).  Consumed by
`src/utils/preprocess.py:46-175` (CropAndExtract.generate) to produce
`full_3dmm` / `coeff_3dmm` / `trans_params` — exactly the `--coeff_npz`
contract of audio2ldmk_app / facerender_app.

The 68-point keypoints come in-framework too (BlazeFace box via
models/mp_face.py + AWing FAN via models/face_alignment.py — see
`apps/face_fit_app.py`); precomputed `--kp` keypoints remain accepted.
This module runs the whole fit on TPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mofa_tpu.models.cmp.model import BatchNorm


# ---------------------------------------------------------------- network

class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        h = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.relu(BatchNorm(name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv2")(h)
        h = nn.relu(BatchNorm(name="bn2")(h))
        h = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(h)
        h = BatchNorm(name="bn3")(h)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               padding="VALID", use_bias=False,
                               name="downsample_conv")(x)
            identity = BatchNorm(name="downsample_bn")(identity)
        return nn.relu(h + identity)


# final_layers channel widths (networks.py:84-92): id/exp/tex/angle/gamma/
# (tx,ty)/tz — concatenated to the 257-d BFM coefficient vector
HEAD_DIMS = (80, 64, 80, 3, 27, 2, 1)


class ReconNet(nn.Module):
    """ReconNetWrapper(resnet50, use_last_fc=False): [B, 224, 224, 3] in
    (0, 1) -> [B, 257] coefficients."""
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64

    @nn.compact
    def __call__(self, x):
        w = self.width
        x = nn.Conv(w, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        x = nn.relu(BatchNorm(name="bn1")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for li, (blocks, planes, stride) in enumerate(zip(
                self.layers, (w, 2 * w, 4 * w, 8 * w), (1, 2, 2, 2))):
            for b in range(blocks):
                x = Bottleneck(planes, stride=stride if b == 0 else 1,
                               downsample=b == 0,
                               name=f"layer{li + 1}_{b}")(x)
        x = x.mean(axis=(1, 2), keepdims=True)        # [B, 1, 1, 2048]
        outs = [nn.Conv(d, (1, 1), name=f"head_{i}")(x)
                for i, d in enumerate(HEAD_DIMS)]
        return jnp.concatenate(outs, axis=-1).reshape(x.shape[0], -1)


# ---------------------------------------------------------------- align

def pos_similarity(xp: np.ndarray, x: np.ndarray):
    """preprocess.py:17-38 POS — least-squares (t, s) mapping the standard
    3-D landmarks x [3, N] onto image points xp [2, N]."""
    npts = xp.shape[1]
    a = np.zeros([2 * npts, 8])
    a[0:2 * npts - 1:2, 0:3] = x.transpose()
    a[0:2 * npts - 1:2, 3] = 1
    a[1:2 * npts:2, 4:7] = x.transpose()
    a[1:2 * npts:2, 7] = 1
    b = np.reshape(xp.transpose(), [2 * npts, 1])
    k, _, _, _ = np.linalg.lstsq(a, b, rcond=None)
    r1, r2 = k[0:3], k[4:7]
    s = (np.linalg.norm(r1) + np.linalg.norm(r2)) / 2
    t = np.stack([k[3], k[7]], axis=0)
    return t, s


def extract_5p(lm: np.ndarray) -> np.ndarray:
    """preprocess.py:96-102 — 68 -> 5 canonical points."""
    idx = np.array([31, 37, 40, 43, 46, 49, 55]) - 1
    lm5p = np.stack([lm[idx[0]], np.mean(lm[idx[[1, 2]]], 0),
                     np.mean(lm[idx[[3, 4]]], 0), lm[idx[5]], lm[idx[6]]],
                    axis=0)
    return lm5p[[1, 2, 0, 3, 4]]


def load_lm3d(mat_path: str) -> np.ndarray:
    """load_mats.py:105-116 — standard 5 landmarks from
    similarity_Lm3D_all.mat."""
    from scipy.io import loadmat
    lm3d = loadmat(mat_path)["lm"]
    idx = np.array([31, 37, 40, 43, 46, 49, 55]) - 1
    lm3d = np.stack([lm3d[idx[0]], np.mean(lm3d[idx[[1, 2]]], 0),
                     np.mean(lm3d[idx[[3, 4]]], 0), lm3d[idx[5]],
                     lm3d[idx[6]]], axis=0)
    return lm3d[[1, 2, 0, 3, 4]]


def align_img(img, lm: np.ndarray, lm3d_std: np.ndarray,
              target_size: float = 224.0, rescale_factor: float = 102.0):
    """preprocess.py:105-135 — returns (trans_params [8], img224 PIL,
    lm_new). `img` is a PIL image; `lm` is [68, 2] with y UP (the caller
    flips, preprocess.py:147)."""
    from PIL import Image

    w0, h0 = img.size
    lm5p = extract_5p(lm) if lm.shape[0] != 5 else lm
    t, s = pos_similarity(lm5p.transpose(), lm3d_std.transpose())
    s = rescale_factor / s

    w = (w0 * s).astype(np.int32)
    h = (h0 * s).astype(np.int32)
    left = np.round(w / 2 - target_size / 2
                    + float((t[0] - w0 / 2) * s)).astype(np.int32)
    up = np.round(h / 2 - target_size / 2
                  + float((h0 / 2 - t[1]) * s)).astype(np.int32)
    img_new = img.resize((int(w), int(h)), resample=Image.BICUBIC)
    img_new = img_new.crop((int(left), int(up), int(left + target_size),
                            int(up + target_size)))
    lm_new = np.stack([lm[:, 0] - t[0] + w0 / 2,
                       lm[:, 1] - t[1] + h0 / 2], axis=1) * s
    lm_new = lm_new - np.array([[w / 2 - target_size / 2,
                                 h / 2 - target_size / 2]])
    trans_params = np.array([w0, h0, s, t[0], t[1], left, up, target_size],
                            dtype=object)
    return trans_params, img_new, lm_new


def fit_image(recon: ReconNet, params, img_pil, lm68_ydown: np.ndarray,
              lm3d_std: np.ndarray):
    """CropAndExtract.generate inner loop (utils/preprocess.py:135-168):
    PIL image + 68 keypoints (y down) -> (full_3dmm [1, 257],
    coeff_track [1, 76] (exp+angle+trans+trans_params[2:]),
    trans_params [8])."""
    w, h = img_pil.size
    lm = lm68_ydown.astype(np.float32).copy()
    lm[:, -1] = h - 1 - lm[:, -1]
    trans_params, im224, _ = align_img(img_pil, lm, lm3d_std)
    im = jnp.asarray(np.asarray(im224, np.float32) / 255.0)[None]
    full = np.asarray(recon.apply(params, im))        # [1, 257]
    tp = np.array([float(np.asarray(x).reshape(-1)[0]) for x in trans_params],
                  np.float32)
    coeff = np.concatenate([full[:, 80:144], full[:, 224:227],
                            full[:, 254:257], tp[None, 2:]], axis=1)
    return full, coeff, tp
