"""GMFlow / UniMatch optical-flow teacher in JAX (NHWC, single jit).

Re-derivation of the flow path of
/root/reference/Training/train_utils/unimatch/unimatch/unimatch.py (config
gmflow-scale2-regrefine6: feature_channels=128, num_scales=2,
upsample_factor=4, 6 transformer layers, 6 regression-refine iters;
instantiated at Training/train_stage1.py:725-733):

  CNN pyramid (1/8, 1/4 via shared trident conv) ->
  per scale: swin-split feature transformer (self + cross + FFN, shifted on
  odd layers) -> correlation softmax (global at 1/8, radius-4 local at 1/4)
  -> self-attention flow propagation ->
  6x SepConvGRU regression refinement at 1/4 -> RAFT convex upsampling x4.

TPU-first restructuring vs the reference:
- the whole T-1 frame-pair batch runs as ONE program (train_stage1.py:113-143
  loops pairs sequentially on GPU — a major input-pipeline cost, SURVEY §3.4);
- the 6-iteration GRU refinement is a lax.scan;
- grid_sample is an explicit gather with bilinear weights (zeros padding,
  align_corners=True), so semantics match torch exactly.

InstanceNorm layers carry no parameters (torch affine=False default), so the
torch checkpoint maps 1:1 onto this tree via models/weights.py.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ----------------------------------------------------------------- config

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class GMFlowConfig:
    feature_channels: int = 128
    num_scales: int = 2
    upsample_factor: int = 4              # at the finest scale
    num_transformer_layers: int = 6
    ffn_dim_expansion: int = 4
    attn_splits: Sequence[int] = (2, 8)
    corr_radius: Sequence[int] = (-1, 4)
    prop_radius: Sequence[int] = (-1, 1)
    num_reg_refine: int = 6


TINY_GMFLOW_CONFIG = GMFlowConfig(
    feature_channels=32, num_transformer_layers=2, num_reg_refine=2)


# ----------------------------------------------------------------- helpers

def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-sample, per-channel spatial normalization (torch InstanceNorm2d,
    affine=False)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def split_windows(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*k*k, H/k, W/k, C] (reference split_feature order:
    (b, kh, kw, h', w', c))."""
    b, h, w, c = x.shape
    x = x.reshape(b, k, h // k, k, w // k, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * k * k, h // k, w // k, c)


def merge_windows(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inverse of split_windows."""
    bkk, hk, wk, c = x.shape
    b = bkk // (k * k)
    x = x.reshape(b, k, k, hk, wk, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, k * hk, k * wk, c)


def position_embedding_sine(h: int, w: int, num_pos_feats: int,
                            temperature: float = 10000.0) -> np.ndarray:
    """[h, w, 2*num_pos_feats] with cat(pos_y, pos_x) channel order
    (unimatch/position.py:26-46)."""
    scale = 2 * math.pi
    eps = 1e-6
    y = np.cumsum(np.ones((h, w), np.float32), axis=0)
    x = np.cumsum(np.ones((h, w), np.float32), axis=1)
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])], -1).reshape(h, w, -1)
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])], -1).reshape(h, w, -1)
    return np.concatenate([py, px], axis=-1)


def shift_window_attn_mask(h: int, w: int, k: int) -> np.ndarray:
    """[k*k, hw', hw'] additive mask for shifted-window attention
    (unimatch/utils.py:84-108)."""
    wh, ww = h // k, w // k
    sh, sw = wh // 2, ww // 2
    img = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -wh), slice(-wh, -sh), slice(-sh, None)):
        for ws in (slice(0, -ww), slice(-ww, -sw), slice(-sw, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    win = img.reshape(1, k, wh, k, ww, 1).transpose(0, 1, 3, 2, 4, 5)
    win = win.reshape(k * k, wh * ww)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def coords_grid(h: int, w: int) -> jnp.ndarray:
    """[h, w, 2] (x, y) pixel coordinates."""
    y, x = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return jnp.stack([x, y], axis=-1)


def bilinear_sample(feature: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """grid_sample(align_corners=True, padding_mode='zeros') on pixel coords.

    feature [B, H, W, C]; coords [B, ..., 2] (x, y) -> [B, ..., C]."""
    b, h, w, c = feature.shape
    lead = coords.shape[1:-1]
    xy = coords.reshape(b, -1, 2)
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    flat = feature.reshape(b, h * w, c)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w + \
            jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * valid[..., None]

    out = (tap(y0, x0) * ((1 - wy) * (1 - wx))[..., None]
           + tap(y0, x0 + 1) * ((1 - wy) * wx)[..., None]
           + tap(y0 + 1, x0) * (wy * (1 - wx))[..., None]
           + tap(y0 + 1, x0 + 1) * (wy * wx)[..., None])
    return out.reshape((b,) + lead + (c,))


def flow_warp(feature: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp feature [B,H,W,C] by flow [B,H,W,2]."""
    h, w = feature.shape[1:3]
    return bilinear_sample(feature, coords_grid(h, w)[None] + flow)


def upsample_flow_with_mask(flow: jnp.ndarray, up_mask: jnp.ndarray,
                            factor: int) -> jnp.ndarray:
    """RAFT convex upsampling (unimatch/utils.py:134-152), NHWC.

    flow [B, h, w, 2]; up_mask [B, h, w, 9*factor^2] -> [B, h*f, w*f, 2]."""
    b, h, w, _ = flow.shape
    mask = up_mask.reshape(b, h, w, 9, factor, factor)
    mask = jax.nn.softmax(mask, axis=3)

    scaled = flow * factor
    pad = jnp.pad(scaled, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 3x3 neighborhood stack, (dy, dx) row-major to match F.unfold
    taps = [pad[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)]
    neigh = jnp.stack(taps, axis=3)                      # [B, h, w, 9, 2]

    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", mask, neigh)  # [B, h, w, f, f, 2]
    up = up.transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(b, h * factor, w * factor, 2)


# ----------------------------------------------------------------- matching

def global_correlation_softmax(f0: jnp.ndarray, f1: jnp.ndarray):
    """[B, H, W, C] x2 -> flow [B, H, W, 2] (unimatch/matching.py:7-37)."""
    b, h, w, c = f0.shape
    q = f0.reshape(b, h * w, c)
    k = f1.reshape(b, h * w, c)
    corr = jnp.einsum("bic,bjc->bij", q, k) / (c ** 0.5)
    prob = jax.nn.softmax(corr, axis=-1)
    grid = coords_grid(h, w).reshape(1, h * w, 2)
    correspondence = jnp.einsum("bij,njc->bic", prob, grid)
    return (correspondence - grid).reshape(b, h, w, 2)


def local_correlation_softmax(f0: jnp.ndarray, f1: jnp.ndarray, radius: int):
    """Radius-r local matching via shifted products (matching.py:40-85)."""
    b, h, w, c = f0.shape
    k = 2 * radius + 1
    pad = jnp.pad(f1, ((0, 0), (radius, radius), (radius, radius), (0, 0)))
    grid = coords_grid(h, w)

    corrs, valids, offs = [], [], []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            shifted = pad[:, dy + radius:dy + radius + h,
                          dx + radius:dx + radius + w]
            corrs.append(jnp.einsum("bhwc,bhwc->bhw", f0, shifted))
            coords = grid + jnp.asarray([dx, dy], jnp.float32)
            valids.append((coords[..., 0] >= 0) & (coords[..., 0] < w)
                          & (coords[..., 1] >= 0) & (coords[..., 1] < h))
            offs.append([dx, dy])
    corr = jnp.stack(corrs, axis=-1) / (c ** 0.5)         # [B, H, W, k*k]
    valid = jnp.stack([jnp.asarray(v, jnp.float32) for v in valids], axis=-1)
    corr = jnp.where(valid > 0, corr, -1e4)
    prob = jax.nn.softmax(corr, axis=-1)
    offsets = jnp.asarray(offs, jnp.float32)              # [k*k, 2] (dx, dy)
    sample = grid[None, :, :, None, :] + offsets[None, None, None]
    correspondence = jnp.einsum("bhwk,bhwkc->bhwc", prob, sample)
    del k
    return correspondence - grid[None]


def local_correlation_with_flow(f0: jnp.ndarray, f1: jnp.ndarray,
                                flow: jnp.ndarray, radius: int):
    """[B, H, W, (2r+1)^2] correlation at flow-displaced fractional windows
    (matching.py:88-131); zeros padding via masked bilinear taps."""
    b, h, w, c = f0.shape
    base = coords_grid(h, w)[None] + flow
    corrs = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            sampled = bilinear_sample(f1, base + jnp.asarray(
                [dx, dy], jnp.float32))
            corrs.append(jnp.einsum("bhwc,bhwc->bhw", f0, sampled))
    return jnp.stack(corrs, axis=-1) / (c ** 0.5)


# ----------------------------------------------------------------- modules

class Conv(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    padding: int | None = None

    @nn.compact
    def __call__(self, x):
        pad = self.padding if self.padding is not None else \
            self.dilation * (self.kernel - 1) // 2
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       kernel_dilation=(self.dilation, self.dilation),
                       padding=[(pad, pad)] * 2, use_bias=self.use_bias,
                       dtype=x.dtype)(x)


class ResidualBlockIN(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.relu(instance_norm(Conv(self.features, 3, self.stride,
                                       self.dilation, use_bias=False,
                                       name="conv1")(x)))
        y = nn.relu(instance_norm(Conv(self.features, 3, 1, self.dilation,
                                       use_bias=False, name="conv2")(y)))
        if self.stride != 1 or x.shape[-1] != self.features:
            x = instance_norm(Conv(self.features, 1, self.stride,
                                   name="downsample_0")(x))
        return nn.relu(x + y)


class CNNEncoder(nn.Module):
    cfg: GMFlowConfig

    @nn.compact
    def __call__(self, x):
        """[N, H, W, 3] -> [f_1/8, f_1/4] (low to high resolution)."""
        c = self.cfg.feature_channels
        x = Conv(64, 7, 2, use_bias=False, name="conv1")(x)
        x = nn.relu(instance_norm(x))
        x = ResidualBlockIN(64, name="layer1_0")(x)
        x = ResidualBlockIN(64, name="layer1_1")(x)
        x = ResidualBlockIN(96, stride=2, name="layer2_0")(x)
        x = ResidualBlockIN(96, name="layer2_1")(x)
        x = ResidualBlockIN(128, stride=1, name="layer3_0")(x)   # stays 1/4
        x = ResidualBlockIN(128, name="layer3_1")(x)
        x = Conv(c, 1, padding=0, name="conv2")(x)
        # shared-weight trident conv at strides (1, 2) -> 1/4 and 1/8
        kernel = self.param("trident_conv_weight",
                            nn.initializers.kaiming_normal(), (3, 3, c, c))
        quarter = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        eighth = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return [eighth, quarter]


class TransformerLayer(nn.Module):
    cfg: GMFlowConfig
    no_ffn: bool = False

    @nn.compact
    def __call__(self, source, target, h, w, k, with_shift, attn_mask):
        """source/target [B, H*W, C] -> [B, H*W, C]."""
        c = self.cfg.feature_channels
        q = nn.Dense(c, use_bias=False, dtype=source.dtype, name="q_proj")(source)
        key = nn.Dense(c, use_bias=False, dtype=source.dtype, name="k_proj")(target)
        v = nn.Dense(c, use_bias=False, dtype=source.dtype, name="v_proj")(target)

        b = q.shape[0]
        if k > 1:
            qw = q.reshape(b, h, w, c)
            kw = key.reshape(b, h, w, c)
            vw = v.reshape(b, h, w, c)
            if with_shift:
                sh, sw = (h // k) // 2, (w // k) // 2
                roll = lambda t: jnp.roll(t, (-sh, -sw), axis=(1, 2))
                qw, kw, vw = roll(qw), roll(kw), roll(vw)
            qs = split_windows(qw, k).reshape(b * k * k, -1, c)
            ks = split_windows(kw, k).reshape(b * k * k, -1, c)
            vs = split_windows(vw, k).reshape(b * k * k, -1, c)
            scores = jnp.einsum("bic,bjc->bij", qs, ks) / (c ** 0.5)
            if with_shift:
                scores = scores + jnp.tile(attn_mask, (b, 1, 1)).astype(scores.dtype)
            attn = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bij,bjc->bic", attn, vs)
            out = merge_windows(out.reshape(b * k * k, h // k, w // k, c), k)
            if with_shift:
                out = jnp.roll(out, (sh, sw), axis=(1, 2))
            message = out.reshape(b, h * w, c)
        else:
            scores = jnp.einsum("bic,bjc->bij", q, key) / (c ** 0.5)
            attn = jax.nn.softmax(scores, axis=-1)
            message = jnp.einsum("bij,bjc->bic", attn, v)

        message = nn.Dense(c, use_bias=False, dtype=source.dtype,
                           name="merge")(message)
        message = nn.LayerNorm(dtype=message.dtype, name="norm1")(message)
        if not self.no_ffn:
            hcat = jnp.concatenate([source, message], axis=-1)
            hcat = nn.Dense(2 * c * self.cfg.ffn_dim_expansion, use_bias=False,
                            dtype=hcat.dtype, name="mlp_0")(hcat)
            hcat = nn.gelu(hcat, approximate=False)
            message = nn.Dense(c, use_bias=False, dtype=hcat.dtype,
                               name="mlp_2")(hcat)
            message = nn.LayerNorm(dtype=message.dtype, name="norm2")(message)
        return source + message


class TransformerBlock(nn.Module):
    cfg: GMFlowConfig

    @nn.compact
    def __call__(self, source, target, h, w, k, with_shift, attn_mask):
        source = TransformerLayer(self.cfg, no_ffn=True, name="self_attn")(
            source, source, h, w, k, with_shift, attn_mask)
        source = TransformerLayer(self.cfg, name="cross_attn_ffn")(
            source, target, h, w, k, with_shift, attn_mask)
        return source


class FeatureTransformer(nn.Module):
    cfg: GMFlowConfig

    @nn.compact
    def __call__(self, f0, f1, k):
        """f0/f1 [B, H, W, C]; k = attn splits."""
        b, h, w, c = f0.shape
        mask = jnp.asarray(shift_window_attn_mask(h, w, k)) if k > 1 else None
        s = f0.reshape(b, h * w, c)
        t = f1.reshape(b, h * w, c)
        # concat0 trick: process (source=cat(f0,f1), target=cat(f1,f0)) so
        # both directions share weights in one pass
        src = jnp.concatenate([s, t], axis=0)
        tgt = jnp.concatenate([t, s], axis=0)
        for i in range(self.cfg.num_transformer_layers):
            with_shift = k > 1 and i % 2 == 1
            src = TransformerBlock(self.cfg, name=f"layers_{i}")(
                src, tgt, h, w, k, with_shift, mask)
            tgt = jnp.concatenate(
                [src[b:], src[:b]], axis=0)
        f0n, f1n = src[:b], src[b:]
        return f0n.reshape(b, h, w, c), f1n.reshape(b, h, w, c)


class SelfAttnPropagation(nn.Module):
    cfg: GMFlowConfig

    @nn.compact
    def __call__(self, feature, flow, local_radius: int):
        """feature [B, H, W, C]; flow [B, H, W, 2]; radius<=0 => global."""
        b, h, w, c = feature.shape
        q_proj = nn.Dense(c, dtype=feature.dtype, name="q_proj")
        k_proj = nn.Dense(c, dtype=feature.dtype, name="k_proj")
        q = q_proj(feature.reshape(b, h * w, c))
        # reference quirk: the GLOBAL branch chains k_proj(q_proj(x))
        # (attention.py:198-205) while the LOCAL branch projects the raw
        # feature (attention.py:227-232)
        k = k_proj(q) if local_radius <= 0 else \
            k_proj(feature.reshape(b, h * w, c))
        if local_radius <= 0:
            scores = jnp.einsum("bic,bjc->bij", q, k) / (c ** 0.5)
            prob = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bij,bjc->bic", prob,
                             flow.reshape(b, h * w, 2))
            return out.reshape(b, h, w, 2)
        # local window (radius 1 -> 3x3) via shifted stacks; zeros padding
        r = local_radius
        qs = q.reshape(b, h, w, c)
        ks = k.reshape(b, h, w, c)
        kpad = jnp.pad(ks, ((0, 0), (r, r), (r, r), (0, 0)))
        fpad = jnp.pad(flow, ((0, 0), (r, r), (r, r), (0, 0)))
        scores, values = [], []
        for dy in range(2 * r + 1):
            for dx in range(2 * r + 1):
                kn = kpad[:, dy:dy + h, dx:dx + w]
                scores.append(jnp.einsum("bhwc,bhwc->bhw", qs, kn))
                values.append(fpad[:, dy:dy + h, dx:dx + w])
        scores = jnp.stack(scores, axis=-1) / (c ** 0.5)   # [B,H,W,kk]
        prob = jax.nn.softmax(scores, axis=-1)
        vals = jnp.stack(values, axis=3)                   # [B,H,W,kk,2]
        return jnp.einsum("bhwk,bhwkc->bhwc", prob, vals)


class BasicUpdateBlock(nn.Module):
    cfg: GMFlowConfig

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        # motion encoder (reg_refine.py:56-77)
        cor = nn.relu(Conv(256, 1, padding=0, name="encoder_convc1")(corr))
        cor = nn.relu(Conv(192, 3, name="encoder_convc2")(cor))
        flo = nn.relu(Conv(128, 7, name="encoder_convf1")(flow))
        flo = nn.relu(Conv(64, 3, name="encoder_convf2")(flo))
        out = nn.relu(Conv(126, 3, name="encoder_conv")(
            jnp.concatenate([cor, flo], axis=-1)))
        motion = jnp.concatenate([out, flow], axis=-1)     # 128

        x = jnp.concatenate([inp, motion], axis=-1)        # 256

        # SepConvGRU (reg_refine.py:22-53)
        def gru_pass(h_state, x_in, axis_kernel, suffix):
            hx = jnp.concatenate([h_state, x_in], axis=-1)
            kz = (1, 5) if axis_kernel == "h" else (5, 1)
            padz = [(0, 0), (2, 2)] if axis_kernel == "h" else [(2, 2), (0, 0)]
            conv = lambda nm: nn.Conv(128, kz, padding=padz, dtype=hx.dtype,
                                      name=f"gru_conv{nm}{suffix}")
            z = nn.sigmoid(conv("z")(hx))
            rr = nn.sigmoid(conv("r")(hx))
            q = nn.tanh(conv("q")(
                jnp.concatenate([rr * h_state, x_in], axis=-1)))
            return (1 - z) * h_state + z * q

        net = gru_pass(net, x, "h", "1")
        net = gru_pass(net, x, "v", "2")

        delta = Conv(2, 3, name="flow_head_conv2")(
            nn.relu(Conv(256, 3, name="flow_head_conv1")(net)))
        mask = Conv(self.cfg.upsample_factor ** 2 * 9, 1, padding=0,
                    name="mask_2")(
            nn.relu(Conv(256, 3, name="mask_0")(net)))
        return net, mask, delta


class GMFlow(nn.Module):
    """Full flow model; forward(img0, img1) on [B, H, W, 3] in [0, 255]."""

    cfg: GMFlowConfig = GMFlowConfig()

    @nn.compact
    def __call__(self, img0, img1, return_preds: bool = False):
        """With return_preds (training mode, unimatch.py:226-358) also
        returns the intermediate full-resolution predictions consumed by
        the sequence loss: a bilinear upsample after each scale's
        propagation and a mask-upsample after every refinement step."""
        cfg = self.cfg
        preds = []
        c = cfg.feature_channels
        mean = jnp.asarray(IMAGENET_MEAN, img0.dtype)
        std = jnp.asarray(IMAGENET_STD, img0.dtype)
        img0 = (img0 / 255.0 - mean) / std
        img1 = (img1 / 255.0 - mean) / std

        feats = CNNEncoder(cfg, name="backbone")(
            jnp.concatenate([img0, img1], axis=0))
        b = img0.shape[0]
        f0_list = [f[:b] for f in feats]
        f1_list = [f[b:] for f in feats]

        transformer = FeatureTransformer(cfg, name="transformer")
        flow_prop = SelfAttnPropagation(cfg, name="feature_flow_attn")

        flow = None
        for scale_idx in range(cfg.num_scales):
            f0, f1 = f0_list[scale_idx], f1_list[scale_idx]
            f0_ori, f1_ori = f0, f1
            if scale_idx > 0:
                h2, w2 = f0.shape[1:3]
                from mofa_tpu.ops.resize import resize_nhwc
                flow = resize_nhwc(flow, (h2, w2), "bilinear",
                                   align_corners=True) * 2.0
                flow = jax.lax.stop_gradient(flow)
                f1 = flow_warp(f1, flow)

            k = cfg.attn_splits[scale_idx]
            # windowed sine position embedding (feature_add_position)
            h, w = f0.shape[1:3]
            pos = jnp.asarray(position_embedding_sine(h // k, w // k, c // 2))
            posf = merge_windows(jnp.tile(pos[None], (k * k, 1, 1, 1)), k)
            f0 = f0 + posf.astype(f0.dtype)
            f1 = f1 + posf.astype(f1.dtype)

            f0, f1 = transformer(f0, f1, k)

            radius = cfg.corr_radius[scale_idx]
            if radius == -1:
                flow_pred = global_correlation_softmax(f0, f1)
            else:
                flow_pred = local_correlation_softmax(f0, f1, radius)
            flow = flow_pred if flow is None else flow + flow_pred

            flow = flow_prop(f0, jax.lax.stop_gradient(flow),
                             cfg.prop_radius[scale_idx])

            if return_preds:
                # bilinear upsample to image res (unimatch.py:230-232 /
                # :271-274): interpolate(align_corners=True) * factor
                from mofa_tpu.ops.resize import resize_nhwc
                factor = cfg.upsample_factor * (
                    2 ** (cfg.num_scales - 1 - scale_idx))
                hh, ww = flow.shape[1:3]
                preds.append(resize_nhwc(flow, (hh * factor, ww * factor),
                                         "bilinear", align_corners=True)
                             * factor)

            if scale_idx == cfg.num_scales - 1:
                # regression refinement (unimatch.py:276-357)
                proj = Conv(256, 1, padding=0, name="refine_proj")(f0)
                net0, inp = jnp.split(proj, 2, axis=-1)
                net0 = jnp.tanh(net0)
                inp = nn.relu(inp)
                update = BasicUpdateBlock(cfg, name="refine")

                up_mask = None
                for _ in range(cfg.num_reg_refine):
                    flow = jax.lax.stop_gradient(flow)
                    corr = local_correlation_with_flow(
                        f0_ori, f1_ori, flow, radius=4)
                    # the reference RE-INITIALIZES the GRU state from
                    # refine_proj every iteration (unimatch.py:278-327);
                    # only `flow` carries across iterations.
                    _, up_mask, delta = update(net0, inp, corr, flow)
                    flow = flow + delta
                    if return_preds:  # unimatch.py:355-358
                        preds.append(upsample_flow_with_mask(
                            flow, up_mask, cfg.upsample_factor))
                flow_up = upsample_flow_with_mask(flow, up_mask,
                                                  cfg.upsample_factor)
        return (flow_up, preds) if return_preds else flow_up


# ----------------------------------------------------------------- driver

@functools.partial(jax.jit, static_argnames=("gmflow",))
def _apply_chunk_jit(gmflow, params, a, b):
    """Module-level jit so chunked teacher calls share ONE compiled
    program across get_optical_flows invocations (flax modules hash by
    config)."""
    return gmflow.apply(params, a, b)


def get_optical_flows(gmflow: GMFlow, params, video01: jnp.ndarray,
                      inference_size=(384, 512),
                      pair_chunk: int | None = None) -> jnp.ndarray:
    """[B, T, H, W, 3] in (0,1) -> frame0->frame_i flows [B, T-1, H, W, 2].

    All T-1 pairs run as one batch (vs the reference's sequential loop,
    train_stage1.py:113-143); portrait inputs are transposed to landscape
    as in preprocess_size (train_stage1.py:69-109).

    pair_chunk: run the pair batch in host-driven chunks of this size
    through ONE compiled program (per chunk shape). The global-correlation
    volume is [N, hw/64, hw/64] fp32 — at 24 pairs x 384x512 that is
    ~0.9 GB of a single buffer, which OOMs a 16 GB chip when the full
    SVD bundle is resident (stage-2 training). Identical math (pairs are
    independent); a ragged tail chunk compiles its own shape once."""
    from mofa_tpu.ops.resize import resize_nhwc
    b, t, h, w = video01.shape[:4]
    video = video01 * 255.0

    transpose = h > w
    if transpose:
        video = video.transpose(0, 1, 3, 2, 4)
        h, w = w, h
    ih, iw = inference_size

    img0 = jnp.repeat(video[:, 0:1], t - 1, axis=1).reshape(
        b * (t - 1), h, w, 3)
    img1 = video[:, 1:].reshape(b * (t - 1), h, w, 3)
    if (h, w) != (ih, iw):
        img0 = resize_nhwc(img0, (ih, iw), "bilinear", align_corners=True)
        img1 = resize_nhwc(img1, (ih, iw), "bilinear", align_corners=True)

    n = img0.shape[0]
    if pair_chunk is not None and pair_chunk < n:
        parts = [_apply_chunk_jit(gmflow, params, img0[i:i + pair_chunk],
                                  img1[i:i + pair_chunk])
                 for i in range(0, n, pair_chunk)]
        flow = jnp.concatenate(parts, axis=0)
    else:
        flow = gmflow.apply(params, img0, img1)    # [B*(T-1), ih, iw, 2]
    if (h, w) != (ih, iw):
        flow = resize_nhwc(flow, (h, w), "bilinear", align_corners=True)
        flow = flow * jnp.asarray([w / iw, h / ih], flow.dtype)
    flow = flow.reshape(b, t - 1, h, w, 2)
    if transpose:
        # reference postprocess_size transposes ONLY spatial dims and leaves
        # the channel order as computed on the transposed image
        # (train_stage1.py:96-109) — preserved bug-compatibly.
        flow = flow.transpose(0, 1, 3, 2, 4)
    return flow
