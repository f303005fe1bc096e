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

import jax
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
    # architecture selectors mirroring the reference model params dict
    # (models/cmp/models/modules/cmp.py:9-25): the shipped config uses
    # resnet50 + MotionDecoderSkipLayer; alexnet_fcn_{8x,32x} and the
    # Plain/FlowNet decoders are the alternative experiment configs.
    image_encoder: str = "resnet50"
    sparse_encoder: str = "shallownet8x"
    flow_decoder: str = "MotionDecoderSkipLayer"
    decoder_combo: tuple = (1, 2, 4)
    skip_layer: bool = True


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
    """modules/shallownet.py:4-46 — shallownet8x (final avg-pool 2) or
    shallownet32x (final avg-pool 8) per `final_pool`."""

    cfg: CMPConfig
    final_pool: int = 2

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
        p = self.final_pool
        return nn.avg_pool(x, (p, p), strides=(p, p))


class _ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = -1  # -1: same-style kernel//2

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2 if self.pad < 0 else self.pad
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad)] * 2, name="conv")(x)
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


class MotionDecoderPlain(nn.Module):
    """modules/decoder.py:5-94 — pooled conv branches (2 conv+BN+ReLU each,
    branch set from `decoder_combo`), bilinear(align_corners) upsample back,
    concat, 1x1 head. No encoder skips."""

    cfg: CMPConfig

    @nn.compact
    def __call__(self, x):
        def branch(x, pool, name):
            h = x if pool == 1 else _max_pool(x, pool, pool)
            for i in range(2):
                h = _ConvBNRelu(128, name=f"{name}_{i}")(h)
            return h

        size = x.shape[1:3]
        outs = []
        for c in self.cfg.decoder_combo:
            h = branch(x, c, f"decoder{c}")
            if c != 1:
                h = resize_nhwc(h, size, "bilinear", True)
            outs.append(h)
        cat = jnp.concatenate(outs, axis=-1)
        return nn.Conv(self.cfg.output_dim, (1, 1), name="head")(cat)


class TorchConvTranspose4x2(nn.Module):
    """torch ConvTranspose2d(k4, s2, p1) arithmetic: dilate the input by 2,
    pad (k-1-p)=2 both sides, VALID conv — output is exactly 2x the input.
    Kernel stored pre-flipped HWIO (convert_cmp_state_dict flips + lays out
    the torch [I, O, 4, 4] weight)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (4, 4, x.shape[-1], self.features), jnp.float32)
        out = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(1, 1),
            padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias.astype(x.dtype)
        return out


class MotionDecoderFlowNet(nn.Module):
    """modules/decoder.py:218-345 — propagation branches + FlowNet-style
    coarse-to-fine head: predict flow at /8, upsample via transpose conv,
    refine against the encoder skips (layer1/conv1/img at /4,/2,/1 with
    fixed 256/64/3 channels). Returns [flow1, flow2, flow4, flow8]
    finest-first, as the reference does."""

    cfg: CMPConfig

    @nn.compact
    def __call__(self, x, skip_feat):
        img, conv1, layer1 = skip_feat  # 3ch @ /1, 64ch @ /2, 256ch @ /4
        out_dim = self.cfg.output_dim

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
        feat8 = _ConvBNRelu(256, name="fusion8")(
            jnp.concatenate([x1, x2, x4, x8], axis=-1))

        def predict(h, name):
            return nn.Conv(out_dim, (3, 3), padding=[(1, 1)] * 2, name=name)(h)

        def deconv(h, features, name):
            return nn.leaky_relu(
                TorchConvTranspose4x2(features, name=name)(h), 0.1)

        flow8 = predict(feat8, "predict_flow8")
        flow8_up = TorchConvTranspose4x2(out_dim, use_bias=False,
                                         name="upsampled_flow8_to_4")(flow8)
        concat4 = jnp.concatenate(
            [layer1, deconv(feat8, 128, "deconv8"), flow8_up], axis=-1)
        flow4 = predict(concat4, "predict_flow4")
        flow4_up = TorchConvTranspose4x2(out_dim, use_bias=False,
                                         name="upsampled_flow4_to_2")(flow4)
        concat2 = jnp.concatenate(
            [conv1, deconv(concat4, 128, "deconv4"), flow4_up], axis=-1)
        flow2 = predict(concat2, "predict_flow2")
        flow2_up = TorchConvTranspose4x2(out_dim, use_bias=False,
                                         name="upsampled_flow2_to_1")(flow2)
        concat1 = jnp.concatenate(
            [img, deconv(concat2, 64, "deconv2"), flow2_up], axis=-1)
        flow1 = predict(concat1, "predict_flow1")
        return [flow1, flow2, flow4, flow8]


class AlexNetFCN(nn.Module):
    """backbone/alexnet.py:4-83 — BN AlexNet as an FCN encoder. `stride8`
    selects alexnet_fcn_8x (strides [2,2,2,1]) vs alexnet_fcn_32x
    ([4,2,2,2]); dropout is identity at inference. No skip features
    (reference raises on ret_feat) — pair with MotionDecoderPlain."""

    cfg: CMPConfig
    stride8: bool = True

    @nn.compact
    def __call__(self, img):
        s = (2, 2, 2, 1) if self.stride8 else (4, 2, 2, 2)
        x = _ConvBNRelu(96, kernel=11, stride=s[0], pad=5, name="conv1")(img)
        x = _max_pool(x, 3, s[1], padding=1)
        x = _ConvBNRelu(256, kernel=5, name="conv2")(x)
        x = _max_pool(x, 3, s[2], padding=1)
        x = _ConvBNRelu(384, kernel=3, name="conv3")(x)
        x = _ConvBNRelu(384, kernel=3, name="conv4")(x)
        x = _ConvBNRelu(256, kernel=3, name="conv5")(x)
        x = _max_pool(x, 3, s[3], padding=1)
        x = _ConvBNRelu(4096, kernel=3, name="fc6")(x)
        x = _ConvBNRelu(4096, kernel=1, name="fc7")(x)
        return nn.Conv(self.cfg.img_enc_dim, (1, 1), name="conv8")(x)


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
        cfg = self.cfg
        self.flow_encoder = ShallowNet8x(
            cfg, final_pool=8 if cfg.sparse_encoder == "shallownet32x" else 2)
        encoders = {
            "resnet50": lambda: ResNetDilated(cfg),
            "alexnet_fcn_8x": lambda: AlexNetFCN(cfg, stride8=True),
            "alexnet_fcn_32x": lambda: AlexNetFCN(cfg, stride8=False),
        }
        self.image_encoder = encoders[cfg.image_encoder]()
        decoders = {
            "MotionDecoderSkipLayer": lambda: MotionDecoderSkipLayer(cfg),
            "MotionDecoderPlain": lambda: MotionDecoderPlain(cfg),
            "MotionDecoderFlowNet": lambda: MotionDecoderFlowNet(cfg),
        }
        self.flow_decoder = decoders[cfg.flow_decoder]()
        if cfg.skip_layer:
            # mirrors the reference assertion (modules/cmp.py:16-17); the
            # FlowNet decoder also needs skips even though the reference
            # CMP wrapper can't route them to it
            assert cfg.flow_decoder == "MotionDecoderSkipLayer"

    def logits(self, image, sparse, mask):
        """Raw 2*nbins decoder logits at /2 res (training loss input); a
        list of per-scale logits for the FlowNet decoder."""
        sp = jnp.concatenate([sparse, mask], axis=-1)
        sparse_enc = self.flow_encoder(sp)
        img_enc, skips = self.image_encoder(image) \
            if self.cfg.image_encoder == "resnet50" \
            else (self.image_encoder(image), None)
        dec_in = jnp.concatenate([img_enc, sparse_enc], axis=-1)
        if self.cfg.flow_decoder == "MotionDecoderPlain":
            return self.flow_decoder(dec_in)
        return self.flow_decoder(dec_in, skips)

    def __call__(self, image, sparse, mask):
        logits = self.logits(image, sparse, mask)
        if isinstance(logits, (list, tuple)):
            logits = logits[0]  # FlowNet: finest scale
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
        img_enc_dim=int(margs.get("img_enc_dim", 256)),
        sparse_enc_dim=int(margs.get("sparse_enc_dim", 16)),
        output_dim=int(margs.get("output_dim", 198)),
        nbins=int(margs.get("nbins", 99)),
        fmax=float(margs.get("fmax", 50)),
        image_encoder=str(margs.get("image_encoder", "resnet50")),
        sparse_encoder=str(margs.get("sparse_encoder", "shallownet8x")),
        flow_decoder=str(margs.get("flow_decoder", "MotionDecoderSkipLayer")),
        decoder_combo=tuple(margs.get("decoder_combo", (1, 2, 4))),
        skip_layer=bool(margs.get("skip_layer", True)),
    )
