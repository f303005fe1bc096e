"""SadTalker facerender (facevid2vid-style talking-head renderer) in Flax.

Reference: `sadtalker_audio2pose/src/facerender/modules/` — KPDetector +
KPHourglass (`keypoint_detector.py:10-83`), HEEstimator (`:86-180`),
MappingNet (`mapping.py:8-47`), DenseMotionNetwork (`dense_motion.py:9-121`),
OcclusionAwareGenerator / OcclusionAwareSPADEGenerator + SPADE decoder
(`generator.py:8-254`), animation driver (`make_animation.py:28-139`).
The MOFA landmark path exits before facerender (`inference.py:113-117`),
but the renderer is part of the vendored SadTalker capability set; here it
is rebuilt NHWC/NDHWC for TPU (3-D tensors laid out [B, D, H, W, C], all
warps as gather-based grid samples, BatchNorm folded to inference affine).

Weights: `convert_facerender_state_dict` in models/weights.py maps the
reference `SadTalker_V0.0.2_256.safetensors` state dict (spectral-norm
convs folded) onto these modules.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mofa_tpu.models.cmp.model import BatchNorm


# ---------------------------------------------------------------- utilities

def make_coordinate_grid_3d(d: int, h: int, w: int, dtype=jnp.float32):
    """util.py:53-70 — identity grid in [-1, 1], last dim (x, y, z)."""
    x = 2 * (jnp.arange(w, dtype=dtype) / (w - 1)) - 1
    y = 2 * (jnp.arange(h, dtype=dtype) / (h - 1)) - 1
    z = 2 * (jnp.arange(d, dtype=dtype) / (d - 1)) - 1
    zz, yy, xx = jnp.meshgrid(z, y, x, indexing="ij")
    return jnp.stack([xx, yy, zz], axis=-1)          # [D, H, W, 3]


def grid_sample_3d(vol: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """torch F.grid_sample (5-D, bilinear, zeros padding, align_corners=False)
    with channel-last volumes: vol [B, D, H, W, C], grid [B, Do, Ho, Wo, 3]
    where grid[..., 0]=x (W), 1=y (H), 2=z (D) in [-1, 1]."""
    b, d, h, w, c = vol.shape

    # unnormalize (align_corners=False): ix = ((x + 1) * W - 1) / 2
    ix = ((grid[..., 0] + 1) * w - 1) / 2
    iy = ((grid[..., 1] + 1) * h - 1) / 2
    iz = ((grid[..., 2] + 1) * d - 1) / 2

    x0, y0, z0 = jnp.floor(ix), jnp.floor(iy), jnp.floor(iz)
    tx, ty, tz = ix - x0, iy - y0, iz - z0

    def gather(zi, yi, xi):
        inb = ((zi >= 0) & (zi < d) & (yi >= 0) & (yi < h)
               & (xi >= 0) & (xi < w))
        zi = jnp.clip(zi, 0, d - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        bidx = jnp.arange(b).reshape((b,) + (1,) * (grid.ndim - 2))
        vals = vol[bidx, zi, yi, xi]                  # [B, ..., C]
        return vals * inb[..., None]

    out = jnp.zeros(grid.shape[:-1] + (c,), vol.dtype)
    for dz, wz in ((z0, 1 - tz), (z0 + 1, tz)):
        for dy, wy in ((y0, 1 - ty), (y0 + 1, ty)):
            for dx, wx in ((x0, 1 - tx), (x0 + 1, tx)):
                out = out + gather(dz, dy, dx) * (wz * wy * wx)[..., None]
    return out


def kp2gaussian(kp_value: jnp.ndarray, spatial_size, kp_variance: float):
    """util.py:12-32 — [B, K, 3] keypoints -> [B, K, D, H, W] gaussians."""
    d, h, w = spatial_size
    grid = make_coordinate_grid_3d(d, h, w, kp_value.dtype)
    diff = grid[None, None] - kp_value[:, :, None, None, None, :]
    return jnp.exp(-0.5 * (diff ** 2).sum(-1) / kp_variance)


def _interp2x(x, dims):
    """F.interpolate(scale_factor=...) default mode='nearest' over trailing
    spatial dims given by `dims` (axis indices)."""
    for ax in dims:
        x = jnp.repeat(x, 2, axis=ax)
    return x


def _avg_pool_nd(x, dims):
    for ax in dims:
        shape = x.shape
        new = shape[:ax] + (shape[ax] // 2, 2) + shape[ax + 1:]
        x = x.reshape(new).mean(axis=ax + 1)
    return x


# ---------------------------------------------------------------- blocks

class DownBlock2d(nn.Module):
    out_features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_features, (3, 3), name="conv")(x)
        x = nn.relu(BatchNorm(name="norm")(x))
        return _avg_pool_nd(x, (1, 2))


class UpBlock3d(nn.Module):
    out_features: int

    @nn.compact
    def __call__(self, x):
        x = _interp2x(x, (2, 3))                     # (1, 2, 2) upsample
        x = nn.Conv(self.out_features, (3, 3, 3), name="conv")(x)
        return nn.relu(BatchNorm(name="norm")(x))


class DownBlock3d(nn.Module):
    out_features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_features, (3, 3, 3), name="conv")(x)
        x = nn.relu(BatchNorm(name="norm")(x))
        return _avg_pool_nd(x, (2, 3))


class SameBlock2d(nn.Module):
    out_features: int
    kernel: int = 3
    lrelu: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_features, (self.kernel, self.kernel),
                    name="conv")(x)
        x = BatchNorm(name="norm")(x)
        return nn.leaky_relu(x, 0.01) if self.lrelu else nn.relu(x)


class ResBlock2d(nn.Module):
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.Conv(c, (3, 3), name="conv1")(nn.relu(BatchNorm(name="norm1")(x)))
        h = nn.Conv(c, (3, 3), name="conv2")(nn.relu(BatchNorm(name="norm2")(h)))
        return x + h


class ResBlock3d(nn.Module):
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.Conv(c, (3, 3, 3), name="conv1")(
            nn.relu(BatchNorm(name="norm1")(x)))
        h = nn.Conv(c, (3, 3, 3), name="conv2")(
            nn.relu(BatchNorm(name="norm2")(h)))
        return x + h


class ResBottleneck(nn.Module):
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.relu(BatchNorm(name="norm1")(nn.Conv(c // 4, (1, 1),
                                                    name="conv1")(x)))
        # explicit symmetric padding: flax SAME pads asymmetrically under
        # stride 2, torch pads (1, 1)
        h = nn.Conv(c // 4, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], name="conv2")(h)
        h = nn.relu(BatchNorm(name="norm2")(h))
        h = BatchNorm(name="norm3")(nn.Conv(c, (1, 1), name="conv3")(h))
        if self.stride != 1:
            x = BatchNorm(name="norm4")(
                nn.Conv(c, (1, 1), strides=(self.stride, self.stride),
                        padding="VALID", name="skip")(x))
        return nn.relu(h + x)


class Hourglass3d(nn.Module):
    """util.py Encoder+Decoder over [B, D, H, W, C] (pools/upsamples H, W)."""
    block_expansion: int
    num_blocks: int
    max_features: int

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        outs = [x]
        for i in range(self.num_blocks):
            outs.append(DownBlock3d(
                min(self.max_features, self.block_expansion * (2 ** (i + 1))),
                name=f"down_{i}")(outs[-1]))
        out = outs.pop()
        for k, i in enumerate(reversed(range(self.num_blocks))):
            out = UpBlock3d(min(self.max_features,
                                self.block_expansion * (2 ** i)),
                            name=f"up_{k}")(out)
            out = jnp.concatenate([out, outs.pop()], axis=-1)
        out_filters = self.block_expansion + in_features
        out = nn.Conv(out_filters, (3, 3, 3), name="conv")(out)
        return nn.relu(BatchNorm(name="norm")(out))


class AntiAliasDown(nn.Module):
    """util.py AntiAliasInterpolation2d — gaussian blur + strided pick."""
    scale: float

    @nn.compact
    def __call__(self, x):
        if self.scale == 1.0:
            return x
        sigma = (1 / self.scale - 1) / 2
        ks = 2 * round(sigma * 4) + 1
        g = np.arange(ks, dtype=np.float32)
        g = np.exp(-((g - (ks - 1) / 2) ** 2) / (2 * sigma ** 2))
        k2 = np.outer(g, g)
        k2 /= k2.sum()
        kern = jnp.asarray(k2, x.dtype)
        ka = ks // 2
        kb = ka - 1 if ks % 2 == 0 else ka
        x = jnp.pad(x, ((0, 0), (ka, kb), (ka, kb), (0, 0)))
        # depthwise conv
        c = x.shape[-1]
        w = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        step = int(1 / self.scale)
        return out[:, ::step, ::step]


# ---------------------------------------------------------------- models

@dataclasses.dataclass(frozen=True)
class FaceRenderConfig:
    """facerender.yaml model_params (common/kp/he/generator/mapping)."""
    num_kp: int = 15
    image_channel: int = 3
    feature_channel: int = 32
    # kp_detector
    kp_block_expansion: int = 32
    kp_max_features: int = 1024
    kp_scale_factor: float = 0.25
    kp_num_blocks: int = 5
    kp_reshape_channel: int = 16384
    kp_reshape_depth: int = 16
    temperature: float = 0.1
    # he_estimator
    he_block_expansion: int = 64
    num_bins: int = 66
    # generator
    gen_block_expansion: int = 64
    gen_max_features: int = 512
    num_down_blocks: int = 2
    reshape_channel: int = 32
    reshape_depth: int = 16
    num_resblocks: int = 6
    # dense motion
    dm_block_expansion: int = 32
    dm_max_features: int = 1024
    dm_num_blocks: int = 5
    dm_compress: int = 4
    # mapping
    coeff_nc: int = 70
    descriptor_nc: int = 1024
    mapping_layers: int = 3


TINY_FACERENDER_CONFIG = FaceRenderConfig(
    num_kp=5, feature_channel=4, kp_block_expansion=8, kp_max_features=32,
    kp_num_blocks=2, kp_reshape_channel=32, kp_reshape_depth=4,
    he_block_expansion=8, num_bins=66, gen_block_expansion=8,
    gen_max_features=16, num_down_blocks=2, reshape_channel=4,
    reshape_depth=4, num_resblocks=1, dm_block_expansion=8,
    dm_max_features=16, dm_num_blocks=2, dm_compress=2,
    coeff_nc=70, descriptor_nc=32, mapping_layers=3)


class KPDetector(nn.Module):
    """keypoint_detector.py:10-83 — canonical 3-D keypoints [B, K, 3]."""
    cfg: FaceRenderConfig

    @nn.compact
    def __call__(self, image):                        # [B, H, W, 3]
        cfg = self.cfg
        x = AntiAliasDown(cfg.kp_scale_factor, name="down")(image)
        # KPHourglass (util.py:330-361)
        for i in range(cfg.kp_num_blocks):
            x = DownBlock2d(min(cfg.kp_max_features,
                                cfg.kp_block_expansion * (2 ** (i + 1))),
                            name=f"predictor_down_{i}")(x)
        x = nn.Conv(cfg.kp_reshape_channel, (1, 1), name="predictor_conv")(x)
        b, h, w, c = x.shape
        # torch view(bs, c//depth, depth, h, w) on NCDHW == split the
        # channel axis with channel-major order
        x = x.reshape(b, h, w, c // cfg.kp_reshape_depth, cfg.kp_reshape_depth)
        x = x.transpose(0, 4, 1, 2, 3)                # [B, D, H, W, C']
        for i in range(cfg.kp_num_blocks):
            x = UpBlock3d(min(cfg.kp_max_features,
                              cfg.kp_block_expansion
                              * (2 ** (cfg.kp_num_blocks - i - 1))),
                          name=f"predictor_up_{i}")(x)
        pred = nn.Conv(cfg.num_kp, (3, 3, 3), name="kp")(x)  # [B,D,H,W,K]

        pred = pred.transpose(0, 4, 1, 2, 3)          # [B, K, D, H, W]
        bsz, k, d, hh, ww = pred.shape
        heat = jax.nn.softmax(
            pred.reshape(bsz, k, -1).astype(jnp.float32) / cfg.temperature,
            axis=2).reshape(bsz, k, d, hh, ww)
        grid = make_coordinate_grid_3d(d, hh, ww)     # [D, H, W, 3]
        value = (heat[..., None] * grid[None, None]).sum(axis=(2, 3, 4))
        return value.astype(image.dtype)              # [B, K, 3]


class HEEstimator(nn.Module):
    """keypoint_detector.py:86-180 — head pose bins + translation + exp."""
    cfg: FaceRenderConfig

    @nn.compact
    def __call__(self, image):
        cfg = self.cfg
        x = nn.Conv(cfg.he_block_expansion, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], name="conv1")(image)
        x = nn.relu(BatchNorm(name="norm1")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(BatchNorm(name="norm2")(nn.Conv(256, (1, 1),
                                                    name="conv2")(x)))
        for i in range(3):
            x = ResBottleneck(name=f"block1_{i}")(x)
        x = nn.relu(BatchNorm(name="norm3")(nn.Conv(512, (1, 1),
                                                    name="conv3")(x)))
        x = ResBottleneck(stride=2, name="block2")(x)
        for i in range(3):
            x = ResBottleneck(name=f"block3_{i}")(x)
        x = nn.relu(BatchNorm(name="norm4")(nn.Conv(1024, (1, 1),
                                                    name="conv4")(x)))
        x = ResBottleneck(stride=2, name="block4")(x)
        for i in range(5):
            x = ResBottleneck(name=f"block5_{i}")(x)
        x = nn.relu(BatchNorm(name="norm5")(nn.Conv(2048, (1, 1),
                                                    name="conv5")(x)))
        x = ResBottleneck(stride=2, name="block6")(x)
        for i in range(2):
            x = ResBottleneck(name=f"block7_{i}")(x)
        x = x.mean(axis=(1, 2))
        # reference quirk: fc_roll head feeds 'yaw' output and vice versa
        # (keypoint_detector.py:172-175)
        return {"yaw": nn.Dense(cfg.num_bins, name="fc_roll")(x),
                "pitch": nn.Dense(cfg.num_bins, name="fc_pitch")(x),
                "roll": nn.Dense(cfg.num_bins, name="fc_yaw")(x),
                "t": nn.Dense(3, name="fc_t")(x),
                "exp": nn.Dense(3 * cfg.num_kp, name="fc_exp")(x)}


class MappingNet(nn.Module):
    """mapping.py:8-47 — [B, coeff_nc, T] semantics window -> pose dict."""
    cfg: FaceRenderConfig

    @nn.compact
    def __call__(self, x):                            # [B, C, T]
        cfg = self.cfg
        x = x.transpose(0, 2, 1)                      # [B, T, C] for Conv
        x = nn.Conv(cfg.descriptor_nc, (7,), padding="VALID",
                    name="first")(x)
        for i in range(cfg.mapping_layers):
            h = nn.leaky_relu(x, 0.1)
            h = nn.Conv(cfg.descriptor_nc, (3,), padding="VALID",
                        kernel_dilation=(3,), name=f"encoder_{i}")(h)
            x = h + x[:, 3:-3]
        x = x.mean(axis=1)                            # AdaptiveAvgPool1d(1)
        return {"yaw": nn.Dense(cfg.num_bins, name="fc_yaw")(x),
                "pitch": nn.Dense(cfg.num_bins, name="fc_pitch")(x),
                "roll": nn.Dense(cfg.num_bins, name="fc_roll")(x),
                "t": nn.Dense(3, name="fc_t")(x),
                "exp": nn.Dense(3 * cfg.num_kp, name="fc_exp")(x)}


class DenseMotionNetwork(nn.Module):
    """dense_motion.py:9-121 over [B, D, H, W, C] features."""
    cfg: FaceRenderConfig

    @nn.compact
    def __call__(self, feature, kp_driving, kp_source):
        cfg = self.cfg
        b, d, h, w, _ = feature.shape
        k = cfg.num_kp

        feat = nn.Conv(cfg.dm_compress, (1, 1, 1), name="compress")(feature)
        feat = nn.relu(BatchNorm(name="norm")(feat))

        # sparse motions (dense_motion.py:34-57)
        identity = make_coordinate_grid_3d(d, h, w, jnp.float32)
        coord = identity[None, None] - kp_driving[:, :, None, None, None, :]
        driving_to_source = coord + kp_source[:, :, None, None, None, :]
        sparse = jnp.concatenate(
            [jnp.broadcast_to(identity[None, None], (b, 1, d, h, w, 3)),
             driving_to_source], axis=1)              # [B, K+1, D, H, W, 3]

        # deformed features (dense_motion.py:59-66)
        feat_rep = jnp.broadcast_to(feat[:, None],
                                    (b, k + 1) + feat.shape[1:])
        deformed = grid_sample_3d(
            feat_rep.reshape((b * (k + 1),) + feat.shape[1:]),
            sparse.reshape(b * (k + 1), d, h, w, 3))
        deformed = deformed.reshape((b, k + 1, d, h, w, -1))

        # heatmaps (dense_motion.py:68-79)
        gd = kp2gaussian(kp_driving, (d, h, w), 0.01)
        gs = kp2gaussian(kp_source, (d, h, w), 0.01)
        heat = gd - gs                                 # [B, K, D, H, W]
        heat = jnp.concatenate([jnp.zeros_like(heat[:, :1]), heat], axis=1)

        inp = jnp.concatenate([heat[..., None], deformed], axis=-1)
        # torch cat along C of NCDHW then view(bs, -1, d, h, w): channel
        # groups per kp stay contiguous -> move kp axis next to channels
        inp = inp.transpose(0, 2, 3, 4, 1, 5).reshape(b, d, h, w, -1)

        pred = Hourglass3d(cfg.dm_block_expansion, cfg.dm_num_blocks,
                           cfg.dm_max_features, name="hourglass")(inp)

        mask = nn.Conv(k + 1, (7, 7, 7), name="mask")(pred)
        mask = jax.nn.softmax(mask.astype(jnp.float32), axis=-1)
        mask = jnp.where(mask < 1e-3, 0.0, mask)       # dense_motion.py:110
        deformation = (sparse.transpose(0, 2, 3, 4, 1, 5)
                       * mask[..., None]).sum(axis=4)  # [B, D, H, W, 3]

        out = {"mask": mask, "deformation": deformation.astype(feature.dtype)}

        # occlusion (dense_motion.py:117-121): NCDHW view(bs, c*d, h, w)
        # folds depth into channels channel-major
        po = jnp.moveaxis(pred, (1, 4), (2, 1))       # [B, C, D, H, W]
        po = po.reshape(b, -1, h, w).transpose(0, 2, 3, 1)
        occ = nn.Conv(1, (7, 7), name="occlusion")(po)
        out["occlusion_map"] = jax.nn.sigmoid(occ.astype(jnp.float32))
        return out


class SPADE(nn.Module):
    """util.py:446-466 — instance norm modulated by the seg feature."""
    norm_nc: int

    @nn.compact
    def __call__(self, x, seg):
        mu = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        normalized = (x - mu) / jnp.sqrt(var + 1e-5)
        if seg.shape[1:3] != x.shape[1:3]:
            sh, sw = x.shape[1], x.shape[2]
            ry = (np.arange(sh) * seg.shape[1] // sh)
            rx = (np.arange(sw) * seg.shape[2] // sw)
            seg = seg[:, ry][:, :, rx]
        actv = nn.relu(nn.Conv(128, (3, 3), name="mlp_shared")(seg))
        gamma = nn.Conv(self.norm_nc, (3, 3), name="mlp_gamma")(actv)
        beta = nn.Conv(self.norm_nc, (3, 3), name="mlp_beta")(actv)
        return normalized * (1 + gamma) + beta


class SPADEResnetBlock(nn.Module):
    fout: int

    @nn.compact
    def __call__(self, x, seg):
        fin = x.shape[-1]
        fmiddle = min(fin, self.fout)
        learned_shortcut = fin != self.fout
        xs = x
        if learned_shortcut:
            xs = nn.Conv(self.fout, (1, 1), use_bias=False, name="conv_s")(
                SPADE(fin, name="norm_s")(x, seg))
        dx = nn.Conv(fmiddle, (3, 3), name="conv_0")(
            nn.leaky_relu(SPADE(fin, name="norm_0")(x, seg), 0.2))
        dx = nn.Conv(self.fout, (3, 3), name="conv_1")(
            nn.leaky_relu(SPADE(fmiddle, name="norm_1")(dx, seg), 0.2))
        return xs + dx


class SPADEDecoder(nn.Module):
    """generator.py:121-160 (fixed 256-ch layout)."""

    @nn.compact
    def __call__(self, feature):
        seg = feature
        x = nn.Conv(512, (3, 3), name="fc")(feature)
        for i in range(6):
            x = SPADEResnetBlock(512, name=f"G_middle_{i}")(x, seg)
        x = _interp2x(x, (1, 2))
        x = SPADEResnetBlock(256, name="up_0")(x, seg)
        x = _interp2x(x, (1, 2))
        x = SPADEResnetBlock(64, name="up_1")(x, seg)
        x = nn.Conv(3, (3, 3), name="conv_img")(nn.leaky_relu(x, 0.2))
        return jax.nn.sigmoid(x.astype(jnp.float32))


class _GeneratorTrunk(nn.Module):
    """Shared encoder + dense-motion + deform of both generators
    (generator.py:72-110 / :215-245)."""
    cfg: FaceRenderConfig
    first_kernel: int

    @nn.compact
    def __call__(self, source_image, kp_driving, kp_source):
        cfg = self.cfg
        x = SameBlock2d(cfg.gen_block_expansion, kernel=self.first_kernel,
                        name="first")(source_image)
        for i in range(cfg.num_down_blocks):
            x = DownBlock2d(min(cfg.gen_max_features,
                                cfg.gen_block_expansion * (2 ** (i + 1))),
                            name=f"down_{i}")(x)
        x = nn.Conv(cfg.gen_max_features, (1, 1), name="second")(x)
        b, h, w, c = x.shape
        # NCHW view(bs, C', D, h, w): channel-major split
        x = x.reshape(b, h, w, cfg.reshape_channel, cfg.reshape_depth)
        feat3d = x.transpose(0, 4, 1, 2, 3)           # [B, D, H, W, C']
        for i in range(cfg.num_resblocks):
            feat3d = ResBlock3d(name=f"resblock3d_{i}")(feat3d)

        dm = DenseMotionNetwork(cfg, name="dense_motion_network")(
            feat3d, kp_driving, kp_source)
        out = grid_sample_3d(feat3d, dm["deformation"])
        bs, d2, h2, w2, c2 = out.shape
        # NCDHW view(bs, c*d, h, w) is channel-major
        out = jnp.moveaxis(out, (1, 4), (2, 1)).reshape(bs, -1, h2, w2)
        out = out.transpose(0, 2, 3, 1)
        out = SameBlock2d(cfg.gen_block_expansion * 4, lrelu=True,
                          name="third")(out)
        out = nn.Conv(cfg.gen_block_expansion * 4, (1, 1), name="fourth")(out)
        occ = dm["occlusion_map"]
        if occ.shape[1:3] != out.shape[1:3]:
            occ = jax.image.resize(occ, occ.shape[:1] + out.shape[1:3]
                                   + occ.shape[3:], "bilinear")
        return out * occ.astype(out.dtype), dm


class OcclusionAwareSPADEGenerator(nn.Module):
    """generator.py:163-254 — the renderer used by AnimateFromCoeff."""
    cfg: FaceRenderConfig = FaceRenderConfig()

    @nn.compact
    def __call__(self, source_image, kp_driving, kp_source):
        out, dm = _GeneratorTrunk(self.cfg, first_kernel=3, name="trunk")(
            source_image, kp_driving, kp_source)
        pred = SPADEDecoder(name="decoder")(out)
        return {"prediction": pred, "mask": dm["mask"],
                "occlusion_map": dm["occlusion_map"]}


class OcclusionAwareGenerator(nn.Module):
    """generator.py:8-118 — the plain (non-SPADE) facevid2vid decoder."""
    cfg: FaceRenderConfig = FaceRenderConfig()

    @nn.compact
    def __call__(self, source_image, kp_driving, kp_source):
        cfg = self.cfg
        out, dm = _GeneratorTrunk(self.cfg, first_kernel=7, name="trunk")(
            source_image, kp_driving, kp_source)
        for i in range(cfg.num_resblocks):
            out = ResBlock2d(name=f"resblock2d_{i}")(out)
        for i in range(cfg.num_down_blocks):
            feats = max(cfg.gen_block_expansion,
                        cfg.gen_block_expansion
                        * (2 ** (cfg.num_down_blocks - i - 1)))
            out = _interp2x(out, (1, 2))
            out = nn.Conv(feats, (3, 3), name=f"up_{i}_conv")(out)
            out = nn.relu(BatchNorm(name=f"up_{i}_norm")(out))
        out = nn.Conv(cfg.image_channel, (7, 7), name="final")(out)
        return {"prediction": jax.nn.sigmoid(out.astype(jnp.float32)),
                "mask": dm["mask"], "occlusion_map": dm["occlusion_map"]}


# ---------------------------------------------------------------- driver

def headpose_pred_to_degree(pred):
    """make_animation.py:31-37."""
    idx = jnp.arange(pred.shape[-1], dtype=jnp.float32)
    p = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
    return (p * idx).sum(-1) * 3 - 99


def get_rotation_matrix(yaw, pitch, roll):
    """make_animation.py:39-63 (pitch @ yaw @ roll, degrees via pi=3.14)."""
    yaw, pitch, roll = [a / 180 * 3.14 for a in (yaw, pitch, roll)]
    o, z = jnp.ones_like(yaw), jnp.zeros_like(yaw)
    pitch_mat = jnp.stack([o, z, z,
                           z, jnp.cos(pitch), -jnp.sin(pitch),
                           z, jnp.sin(pitch), jnp.cos(pitch)],
                          -1).reshape(-1, 3, 3)
    yaw_mat = jnp.stack([jnp.cos(yaw), z, jnp.sin(yaw),
                         z, o, z,
                         -jnp.sin(yaw), z, jnp.cos(yaw)], -1).reshape(-1, 3, 3)
    roll_mat = jnp.stack([jnp.cos(roll), -jnp.sin(roll), z,
                          jnp.sin(roll), jnp.cos(roll), z,
                          z, z, o], -1).reshape(-1, 3, 3)
    return jnp.einsum("bij,bjk,bkm->bim", pitch_mat, yaw_mat, roll_mat)


def keypoint_transformation(kp_canonical, he, wo_exp: bool = False):
    """make_animation.py:66-98 (x/z translation zeroed)."""
    yaw = headpose_pred_to_degree(he["yaw"])
    pitch = headpose_pred_to_degree(he["pitch"])
    roll = headpose_pred_to_degree(he["roll"])
    if "yaw_in" in he:
        yaw = he["yaw_in"]
    if "pitch_in" in he:
        pitch = he["pitch_in"]
    if "roll_in" in he:
        roll = he["roll_in"]
    rot = get_rotation_matrix(yaw, pitch, roll)
    kp = kp_canonical.astype(jnp.float32)
    kp_rotated = jnp.einsum("bmp,bkp->bkm", rot, kp)
    t = he["t"].astype(jnp.float32) * jnp.asarray([0.0, 1.0, 0.0])
    kp_t = kp_rotated + t[:, None]
    exp = (jnp.zeros_like(he["exp"]) if wo_exp else he["exp"])
    return kp_t + exp.astype(jnp.float32).reshape(exp.shape[0], -1, 3)


def make_animation(source_image, source_semantics, target_semantics,
                   generator, gen_params, kp_detector, kp_params,
                   mapping, map_params):
    """make_animation.py:101-139 — scan the per-frame renderer under jit.

    source_image [B, H, W, 3]; source_semantics [B, C, T_win];
    target_semantics [B, F, C, T_win] -> frames [B, F, H, W, 3]."""

    @jax.jit
    def run(source_image, source_semantics, target_semantics):
        kp_canonical = kp_detector.apply(kp_params, source_image)
        he_source = mapping.apply(map_params, source_semantics)
        kp_source = keypoint_transformation(kp_canonical, he_source)

        def frame(_, sem):
            he = mapping.apply(map_params, sem)
            kp_driving = keypoint_transformation(kp_canonical, he)
            out = generator.apply(gen_params, source_image,
                                  kp_driving, kp_source)
            return None, out["prediction"]

        _, frames = jax.lax.scan(frame, None,
                                 jnp.moveaxis(target_semantics, 1, 0))
        return jnp.moveaxis(frames, 0, 1)

    return run(source_image, source_semantics, target_semantics)


def build_semantics(source_coeff70: np.ndarray, generated_coeff70: np.ndarray,
                    expression_scale: float = 1.0, still_mode: bool = False,
                    semantic_radius: int = 13):
    """generate_facerender_batch.py:8-110 — coeff tracks -> semantics
    windows. source [1, 70] -> [1, 70, 2R+1] (tiled); generated [F, 70] ->
    [1, F, 70, 2R+1] (edge-clamped sliding windows)."""
    src = np.asarray(source_coeff70, np.float32).reshape(1, -1)
    gen = np.asarray(generated_coeff70, np.float32).copy()
    gen[:, :64] = gen[:, :64] * expression_scale
    if still_mode:
        gen[:, 64:] = np.repeat(src[:, 64:70], len(gen), axis=0)
    win = 2 * semantic_radius + 1
    source_semantics = np.repeat(src[:, :, None], win, axis=2)
    f = len(gen)
    idx = np.arange(f)[:, None] + np.arange(-semantic_radius,
                                            semantic_radius + 1)[None]
    idx = np.clip(idx, 0, f - 1)
    target = gen[idx].transpose(0, 2, 1)[None]        # [1, F, 70, win]
    return source_semantics, target
