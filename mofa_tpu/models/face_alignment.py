"""AWing FAN 98-point face alignment (Flax, NHWC) + 98->68 mapping.

In-framework replacement for the last external landmark dependency: the
reference's facexlib `init_alignment_model('awing_fan')` + `get_landmarks`
+ `landmark_98_to_68` chain
(/root/reference/MOFA-Video-Hybrid/sadtalker_audio2pose/src/face3d/
extract_kp_videos_safe.py:18-80). Architecture re-derived from facexlib's
public `awing_arch.py` (4 stacked hourglasses, CoordConv with boundary
channels, 98+1 heatmaps at 64x64); weights load from the facexlib
`alignment_WFLW_4HG.pth` checkpoint via
`models.weights.convert_fan_state_dict`.

Face DETECTION runs in-framework via BlazeFace (models/mp_face.py
`detect_face`, `--task`); a manual `--bbox` stays as an override. The
reference's retinaface detector itself is not transcribed (README
"Deliberate omissions") — BlazeFace fills its role.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from mofa_tpu.models.cmp.model import BatchNorm


def _conv(features, k, stride=1, bias=True, name=None):
    return nn.Conv(features, (k, k), strides=(stride, stride),
                   padding=[(k // 2, k // 2)] * 2, use_bias=bias, name=name)


class ConvBlock(nn.Module):
    """awing ConvBlock: three bn-relu-conv stages concatenated (out/2,
    out/4, out/4) + (bn-relu-1x1) shortcut when channels change."""

    out_planes: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        o2, o4 = self.out_planes // 2, self.out_planes // 4
        out1 = _conv(o2, 3, bias=False, name="conv1")(
            nn.relu(BatchNorm(name="bn1")(x)))
        out2 = _conv(o4, 3, bias=False, name="conv2")(
            nn.relu(BatchNorm(name="bn2")(out1)))
        out3 = _conv(o4, 3, bias=False, name="conv3")(
            nn.relu(BatchNorm(name="bn3")(out2)))
        out = jnp.concatenate([out1, out2, out3], axis=-1)
        if cin != self.out_planes:
            x = _conv(self.out_planes, 1, bias=False, name="downsample_conv")(
                nn.relu(BatchNorm(name="downsample_bn")(x)))
        return out + x


def add_coords(x, with_r: bool, boundary=None):
    """awing AddCoordsTh: append [-1,1] row/col coords (+radius, +masked
    boundary coords). x [B, H, W, C]; boundary [B, H, W, 1] heatmap."""
    b, h, w, _ = x.shape
    xx = jnp.broadcast_to(
        (jnp.arange(h, dtype=jnp.float32) / (h - 1) * 2 - 1)[None, :, None, None],
        (b, h, w, 1))
    yy = jnp.broadcast_to(
        (jnp.arange(w, dtype=jnp.float32) / (w - 1) * 2 - 1)[None, None, :, None],
        (b, h, w, 1))
    parts = [x, xx.astype(x.dtype), yy.astype(x.dtype)]
    if with_r:
        rr = jnp.sqrt(xx ** 2 + yy ** 2)
        rr = rr / jnp.max(rr)
        parts.append(rr.astype(x.dtype))
    if boundary is not None:
        bnd = jnp.clip(boundary, 0.0, 1.0)
        keep = bnd > 0.05
        parts.append(jnp.where(keep, xx, 0.0).astype(x.dtype))
        parts.append(jnp.where(keep, yy, 0.0).astype(x.dtype))
    return jnp.concatenate(parts, axis=-1)


class CoordConvTh(nn.Module):
    out_channels: int
    kernel_size: int
    stride: int = 1
    with_r: bool = True
    with_boundary: bool = False

    @nn.compact
    def __call__(self, x, heatmap=None):
        boundary = None
        if self.with_boundary and heatmap is not None:
            boundary = heatmap[..., -1:]
        ret = add_coords(x, self.with_r, boundary)
        last_channel = ret[..., -2:]
        out = _conv(self.out_channels, self.kernel_size, self.stride,
                    name="conv")(ret)
        return out, last_channel


class HourGlass(nn.Module):
    depth: int = 4
    features: int = 256
    first_one: bool = False

    def setup(self):
        self.coordconv = CoordConvTh(self.features, 1, with_r=True,
                                     with_boundary=True, name="coordconv")
        blocks = {}
        for level in range(self.depth, 0, -1):
            blocks[f"b1_{level}"] = ConvBlock(self.features, name=f"b1_{level}")
            blocks[f"b2_{level}"] = ConvBlock(self.features, name=f"b2_{level}")
            if level == 1:
                blocks[f"b2_plus_{level}"] = ConvBlock(self.features,
                                                       name=f"b2_plus_{level}")
            blocks[f"b3_{level}"] = ConvBlock(self.features, name=f"b3_{level}")
        self.blocks = blocks

    def _recurse(self, level, inp):
        up1 = self.blocks[f"b1_{level}"](inp)
        low1 = nn.avg_pool(inp, (2, 2), strides=(2, 2))
        low1 = self.blocks[f"b2_{level}"](low1)
        if level > 1:
            low2 = self._recurse(level - 1, low1)
        else:
            low2 = self.blocks[f"b2_plus_{level}"](low1)
        low3 = self.blocks[f"b3_{level}"](low2)
        up2 = jnp.repeat(jnp.repeat(low3, 2, axis=1), 2, axis=2)  # nearest x2
        return up1 + up2

    def __call__(self, x, heatmap=None):
        x, last_channel = self.coordconv(x, heatmap)
        return self._recurse(self.depth, x), last_channel


class FAN(nn.Module):
    """awing FAN: returns the list of per-module (landmarks+1)-channel
    heatmaps at 64x64 ([B, 64, 64, L+1], NHWC)."""

    num_modules: int = 4
    num_landmarks: int = 98

    @nn.compact
    def __call__(self, x):
        # x [B, 256, 256, 3] in [0,1] (BGR order, facexlib convention)
        x, _ = CoordConvTh(64, 7, stride=2, with_r=True,
                           with_boundary=False, name="conv1")(x)
        x = nn.relu(BatchNorm(name="bn1")(x))
        x = ConvBlock(128, name="conv2")(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(128, name="conv3")(x)
        x = ConvBlock(256, name="conv4")(x)

        previous, tmp_out = x, None
        outputs = []
        for i in range(self.num_modules):
            hg, _ = HourGlass(first_one=(i == 0), name=f"m{i}")(previous, tmp_out)
            ll = ConvBlock(256, name=f"top_m_{i}")(hg)
            ll = nn.relu(BatchNorm(name=f"bn_end{i}")(
                _conv(256, 1, name=f"conv_last{i}")(ll)))
            tmp_out = _conv(self.num_landmarks + 1, 1, name=f"l{i}")(ll)
            outputs.append(tmp_out)
            if i < self.num_modules - 1:
                previous = (previous + _conv(256, 1, name=f"bl{i}")(ll)
                            + _conv(256, 1, name=f"al{i}")(tmp_out))
        return outputs


def calculate_points(heatmaps: np.ndarray) -> np.ndarray:
    """Heatmaps [B, N, H, W] -> landmark coords [B, N, 2] (x, y) in heatmap
    pixels: argmax + 0.25-pixel gradient-sign refinement + 0.5 offset
    (facexlib awing_arch.calculate_points)."""
    B, N, H, W = heatmaps.shape
    hw = H * W
    line = heatmaps.reshape(B * N, hw)
    idx = np.argmax(line, axis=1)
    preds = np.stack([idx % W, idx // W], axis=1).astype(np.float32)

    r = np.arange(B * N)
    x_up = line[r, np.clip(idx + 1, 0, hw - 1)]
    x_down = line[r, np.clip(idx - 1, 0, hw - 1)]
    y_up = line[r, np.clip(idx + W, 0, hw - 1)]
    y_down = line[r, np.clip(idx - W, 0, hw - 1)]
    diff = np.sign(np.stack([x_up - x_down, y_up - y_down], axis=1))
    preds += 0.25 * diff
    preds += 0.5
    return preds.reshape(B, N, 2)


def landmark_98_to_68(lm98: np.ndarray) -> np.ndarray:
    """WFLW 98-point -> ibug 68-point (facexlib alignment.landmark_98_to_68:
    jaw every-2nd, eyebrow two-row midpoints, nose/mouth direct, 6-of-8 eye
    points)."""
    lm68 = np.zeros((68, 2), np.float32)
    for i in range(0, 33, 2):                      # jaw
        lm68[i // 2] = lm98[i]
    lm68[17] = lm98[33]                            # left eyebrow
    lm68[18] = (lm98[34] + lm98[41]) / 2
    lm68[19] = (lm98[35] + lm98[40]) / 2
    lm68[20] = (lm98[36] + lm98[39]) / 2
    lm68[21] = (lm98[37] + lm98[38]) / 2
    lm68[22] = (lm98[42] + lm98[50]) / 2           # right eyebrow
    lm68[23] = (lm98[43] + lm98[49]) / 2
    lm68[24] = (lm98[44] + lm98[48]) / 2
    lm68[25] = (lm98[45] + lm98[47]) / 2
    lm68[26] = lm98[46]
    lm68[27:36] = lm98[51:60]                      # nose
    for dst, src in zip(range(36, 42), (60, 61, 63, 64, 65, 67)):  # left eye
        lm68[dst] = lm98[src]
    for dst, src in zip(range(42, 48), (68, 69, 71, 72, 73, 75)):  # right eye
        lm68[dst] = lm98[src]
    lm68[48:68] = lm98[76:96]                      # mouth
    return lm68


def get_landmarks_batch(apply_fn, params, crops_rgb) -> np.ndarray:
    """Batched FAN over T face crops (one device program instead of the
    reference's per-frame loop, extract_kp_videos_safe.py:49-56): each crop
    resized to 256 on host, stacked, single apply. Returns [T, 98, 2] in
    each crop's own pixel coordinates."""
    import cv2

    sizes = [c.shape[:2] for c in crops_rgb]
    inp = np.stack([
        cv2.resize(np.asarray(c), (256, 256))[..., ::-1].astype(np.float32)
        / 255.0 for c in crops_rgb])
    outs = apply_fn(params, jnp.asarray(inp))
    heat = np.asarray(outs[-1])[..., :-1]                # drop boundary ch
    heat = np.moveaxis(heat, -1, 1)                      # [T, N, H, W]
    pred = calculate_points(heat)                        # [T, 98, 2]
    for i, (h, w) in enumerate(sizes):
        pred[i, :, 0] *= w / 64.0
        pred[i, :, 1] *= h / 64.0
    return pred


def get_landmarks(apply_fn, params, img_rgb: np.ndarray) -> np.ndarray:
    """facexlib FAN.get_landmarks: resize crop to 256, RGB->BGR, /255,
    decode last module's 98 heatmaps, rescale to crop coords. Returns
    [98, 2] (x, y) in `img_rgb` pixel coordinates."""
    import cv2

    h, w = img_rgb.shape[:2]
    inp = cv2.resize(np.asarray(img_rgb), (256, 256))
    inp = inp[..., ::-1].astype(np.float32) / 255.0      # BGR, [0,1]
    outs = apply_fn(params, jnp.asarray(inp)[None])
    heat = np.asarray(outs[-1])[..., :-1]                # drop boundary ch
    heat = np.moveaxis(heat, -1, 1)                      # [B, N, H, W]
    pred = calculate_points(heat).reshape(-1, 2)
    pred[:, 0] *= w / 64.0
    pred[:, 1] *= h / 64.0
    return pred
