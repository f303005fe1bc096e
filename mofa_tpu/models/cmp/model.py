"""CMP — Conditional Motion Propagation, sparse-to-dense flow completion.

Flax/NHWC re-derivation of the reference CMP inference stack
(/root/reference/MOFA-Video-Traj/models/cmp/):
- dilated ResNet-50 image encoder (layer3 dil 2, layer4 dil 4, output
  stride 8, 1x1 head to 256-d; skip feats [img, conv1, layer1]) —
  models/cmp/models/backbone/resnet.py:94-188
- ShallowNet8x sparse encoder (16-d, /8) — modules/shallownet.py:4-42
- MotionDecoderSkipLayer (4 pooled branches + skip fusions, 198-ch logits
  at /2) — modules/decoder.py:96-215
- Fuser: per-axis softmax expectation over 99 bins, fmax 50 —
  utils/visualize_utils.py:6-19
- final bilinear(align_corners=True) x2 upsample — svdxt...norefine.py:57-60

Inference preprocessing quirk preserved: the wrapper feeds the model
`image*2-1` (the YAML Normalize transform is constructed but never applied
— CMP_demo.run, svdxt...norefine.py:51-62 with set_input at
single_stage_model.py:37-41). BatchNorm uses frozen running statistics
(inference mode), matching `switch_to('eval')`.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from mofa_tpu.ops.resize import resize_nhwc


@dataclasses.dataclass(frozen=True)
class CMPConfig:
    img_enc_dim: int = 256
    sparse_enc_dim: int = 16
    output_dim: int = 198
    nbins: int = 99
    fmax: float = 50.0
    resnet_layers: tuple = (3, 4, 6, 3)
    base_width: int = 64


TINY_CMP_CONFIG = CMPConfig(img_enc_dim=32, sparse_enc_dim=8, output_dim=18,
                            nbins=9, fmax=50.0, resnet_layers=(1, 1, 1, 1),
                            base_width=8)


class BatchNorm(nn.Module):
    """Inference-mode BatchNorm2d with stored running stats."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        inv = scale / jnp.sqrt(var + self.eps)
        return (x.astype(jnp.float32) * inv + (bias - mean * inv)).astype(x.dtype)


def _conv(features, kernel, stride=1, dilation=1, bias=False, name=None):
    pad = dilation * (kernel // 2)
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(pad, pad)] * 2, kernel_dilation=(dilation, dilation),
                   use_bias=bias, name=name)


def _max_pool(x, window, stride, padding=0):
    pads = ((padding, padding), (padding, padding))
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding=pads)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        h = _conv(self.planes, 1, name="conv1")(x)
        h = BatchNorm(name="bn1")(h)
        h = nn.relu(h)
        h = _conv(self.planes, 3, stride=self.stride, dilation=self.dilation,
                  name="conv2")(h)
        h = BatchNorm(name="bn2")(h)
        h = nn.relu(h)
        h = _conv(self.planes * 4, 1, name="conv3")(h)
        h = BatchNorm(name="bn3")(h)
        if self.has_downsample:
            # note: the reference zeroes the downsample conv's stride under
            # dilation too (resnet.py:119-125), so stride applies on conv2 only
            ds_stride = self.stride if self.dilation == 1 else 1
            residual = _conv(self.planes * 4, 1, stride=ds_stride,
                             name="downsample_0")(x)
            residual = BatchNorm(name="downsample_1")(residual)
        return nn.relu(h + residual)


class ResNetDilated(nn.Module):
    cfg: CMPConfig

    @nn.compact
    def __call__(self, img):
        bw = self.cfg.base_width
        x = nn.Conv(bw, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, name="conv1")(img)
        x = BatchNorm(name="bn1")(x)
        conv1 = nn.relu(x)                          # /2
        x = _max_pool(conv1, 3, 2, padding=1)       # /4

        specs = [  # (planes, stride, dilation)
            (bw, 1, 1), (bw * 2, 2, 1), (bw * 4, 1, 2), (bw * 8, 1, 4),
        ]
        feats = []
        for li, ((planes, stride, dil), nblocks) in enumerate(
                zip(specs, self.cfg.resnet_layers)):
            for bi in range(nblocks):
                has_ds = bi == 0
                x = Bottleneck(planes, stride if bi == 0 else 1,
                               dil if li >= 2 else 1, has_downsample=has_ds,
                               name=f"layer{li + 1}_{bi}")(x)
            feats.append(x)
        out = nn.Conv(self.cfg.img_enc_dim, (1, 1), name="conv5")(x)
        return out, [img, conv1, feats[0]]          # skips: 3ch/1, bw/2, 4bw//4


class ShallowNet8x(nn.Module):
    cfg: CMPConfig

    @nn.compact
    def __call__(self, sparse):
        x = nn.Conv(16, (5, 5), strides=(2, 2), padding=[(2, 2)] * 2,
                    name="features_0")(sparse)
        x = BatchNorm(name="features_1")(x)
        x = nn.relu(x)
        x = _max_pool(x, 2, 2)
        x = nn.Conv(self.cfg.sparse_enc_dim, (3, 3), padding=[(1, 1)] * 2,
                    name="features_4")(x)
        x = BatchNorm(name="features_5")(x)
        x = nn.relu(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class _ConvBNRelu(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1)] * 2, name="conv")(x)
        x = BatchNorm(name="bn")(x)
        return nn.relu(x)


class MotionDecoderSkipLayer(nn.Module):
    cfg: CMPConfig

    @nn.compact
    def __call__(self, x, skip_feat):
        img, conv1, layer1 = skip_feat

        def branch(x, pool, name):
            h = x if pool == 1 else _max_pool(x, pool, pool)
            for i in range(3):
                h = _ConvBNRelu(128, name=f"{name}_{i}")(h)
            return h

        size = x.shape[1:3]
        x1 = branch(x, 1, "decoder1")
        x2 = resize_nhwc(branch(x, 2, "decoder2"), size, "bilinear", True)
        x4 = resize_nhwc(branch(x, 4, "decoder4"), size, "bilinear", True)
        x8 = resize_nhwc(branch(x, 8, "decoder8"), size, "bilinear", True)
        cat = jnp.concatenate([x1, x2, x4, x8], axis=-1)
        f8 = _ConvBNRelu(256, name="fusion8")(cat)

        f8_up = resize_nhwc(f8, layer1.shape[1:3], "bilinear", True)
        s4 = _ConvBNRelu(128, name="skipconv4")(layer1)
        f4 = _ConvBNRelu(128, name="fusion4")(jnp.concatenate([f8_up, s4], axis=-1))

        f4_up = resize_nhwc(f4, conv1.shape[1:3], "bilinear", True)
        s2 = _ConvBNRelu(32, name="skipconv2")(conv1)
        f2 = _ConvBNRelu(64, name="fusion2")(jnp.concatenate([f4_up, s2], axis=-1))

        return nn.Conv(self.cfg.output_dim, (1, 1), name="head")(f2)


def fuser_convert_flow(flow_prob: jnp.ndarray, nbins: int, fmax: float) -> jnp.ndarray:
    """[N, H, W, 2*nbins] logits -> [N, H, W, 2] expected flow."""
    step = 2 * fmax / float(nbins)
    mesh = jnp.arange(nbins, dtype=jnp.float32) * step - fmax + step / 2
    px = nn.softmax(flow_prob[..., :nbins].astype(jnp.float32), axis=-1)
    py = nn.softmax(flow_prob[..., nbins:].astype(jnp.float32), axis=-1)
    fx = jnp.sum(px * mesh, axis=-1)
    fy = jnp.sum(py * mesh, axis=-1)
    return jnp.stack([fx, fy], axis=-1).astype(flow_prob.dtype)


def cmp_preprocess(image01: jnp.ndarray) -> jnp.ndarray:
    """(0,1) image -> CMP input, matching CMP_demo.run (image*2-1 only)."""
    return image01 * 2.0 - 1.0


class CMP(nn.Module):
    """Full inference module: (image, sparse, mask) -> dense flow at input res.

    image: [N, H, W, 3] already preprocessed to (-1,1);
    sparse: [N, H, W, 2]; mask: [N, H, W, 2].
    """

    cfg: CMPConfig = CMPConfig()

    def setup(self):
        self.flow_encoder = ShallowNet8x(self.cfg)
        self.image_encoder = ResNetDilated(self.cfg)
        self.flow_decoder = MotionDecoderSkipLayer(self.cfg)

    def logits(self, image, sparse, mask):
        """Raw 2*nbins decoder logits at /2 res (training loss input)."""
        sp = jnp.concatenate([sparse, mask], axis=-1)
        sparse_enc = self.flow_encoder(sp)
        img_enc, skips = self.image_encoder(image)
        dec_in = jnp.concatenate([img_enc, sparse_enc], axis=-1)
        return self.flow_decoder(dec_in, skips)

    def __call__(self, image, sparse, mask):
        logits = self.logits(image, sparse, mask)
        flow = fuser_convert_flow(logits, self.cfg.nbins, self.cfg.fmax)
        if flow.shape[1] != image.shape[1]:
            flow = resize_nhwc(flow, image.shape[1:3], "bilinear", True)
        return flow


def cmp_config_from_yaml(path: str) -> CMPConfig:
    """Import the reference CMP experiment YAML
    (experiments/semiauto_annot/resnet50_vip+mpii_liteflow/config.yaml)
    into a typed CMPConfig."""
    import yaml
    with open(path) as f:
        raw = yaml.safe_load(f)
    margs = raw["model"]["module"] if "module" in raw.get("model", {}) else \
        raw.get("model", raw)
    return CMPConfig(
        nbins=int(margs.get("nbins", 99)),
        fmax=float(margs.get("fmax", 50)),
    )
