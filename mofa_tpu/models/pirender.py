"""PIRenderer face generator (the SadTalker 'pirender' facemodel) in Flax.

Reference: `sadtalker_audio2pose/src/facerender/pirender/` —
`face_model.py:62-182` (FaceGenerator = MappingNet + WarpingNet +
EditingNet) over the ADAIN blocks of `base_function.py`. Driven per frame
with [B, 73, 27] semantics windows (`pirender_animate.py:54-110`).

Layout is NHWC; the torch-parity pieces are: LayerNorm2d (layer norm over
C,H,W with per-channel affine), ADAIN (instance norm modulated by the
pooled descriptor), stride-2 k4 downsample convs, torch-arithmetic
ConvTranspose2d (k3 s2 p1 op1) realized as an input-dilated conv, and the
reference's FineADAINResBlock2d quirk where the first conv branch is
computed and discarded (`base_function.py:316-320`) — replicated so the
parameter set and numerics match exactly.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def grid_sample_2d(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """torch F.grid_sample (4-D, bilinear, zeros, align_corners=False),
    channel-last: img [B, H, W, C], grid [B, Ho, Wo, 2] (x, y) in [-1,1]."""
    b, h, w, c = img.shape
    ix = ((grid[..., 0] + 1) * w - 1) / 2
    iy = ((grid[..., 1] + 1) * h - 1) / 2
    x0, y0 = jnp.floor(ix), jnp.floor(iy)
    tx, ty = ix - x0, iy - y0

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        bidx = jnp.arange(b)[:, None, None]
        return img[bidx, yi, xi] * inb[..., None]

    return ((1 - ty)[..., None] * ((1 - tx)[..., None] * gather(y0, x0)
                                   + tx[..., None] * gather(y0, x0 + 1))
            + ty[..., None] * ((1 - tx)[..., None] * gather(y0 + 1, x0)
                               + tx[..., None] * gather(y0 + 1, x0 + 1)))


def convert_flow_to_deformation(flow: jnp.ndarray) -> jnp.ndarray:
    """face_model.py:6-40 — [B, H, W, 2] pixel flow -> [-1,1] sample grid."""
    b, h, w, _ = flow.shape
    norm = 2 * jnp.stack([flow[..., 0] / (w - 1), flow[..., 1] / (h - 1)], -1)
    x = 2 * (jnp.arange(w) / (w - 1)) - 1
    y = 2 * (jnp.arange(h) / (h - 1)) - 1
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    grid = jnp.stack([xx, yy], -1)[None]
    return grid + norm


def warp_image(source: jnp.ndarray, deformation: jnp.ndarray) -> jnp.ndarray:
    """face_model.py:44-60 (same-size path; resize handled by caller)."""
    return grid_sample_2d(source, deformation)


@dataclasses.dataclass(frozen=True)
class PIRenderConfig:
    """facerender_pirender.yaml gen.param."""
    image_nc: int = 3
    descriptor_nc: int = 256
    max_nc: int = 256
    coeff_nc: int = 73
    mapping_layers: int = 3
    warp_encoder_layer: int = 5
    warp_decoder_layer: int = 3
    warp_base_nc: int = 32
    edit_layer: int = 3
    edit_num_res_blocks: int = 2
    edit_base_nc: int = 64


TINY_PIRENDER_CONFIG = PIRenderConfig(
    descriptor_nc=16, max_nc=16, mapping_layers=1, warp_encoder_layer=3,
    warp_decoder_layer=2, warp_base_nc=4, edit_layer=2,
    edit_num_res_blocks=1, edit_base_nc=4)


class LayerNorm2d(nn.Module):
    """base_function.py:11-28 — layer norm over (C, H, W), per-channel
    affine broadcast over space."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        # params named scale/bias: the torch [C,1,1] affine 'weight' lands
        # here through the converter's squeeze + weight->scale rename
        weight = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        mu = xf.mean(axis=(1, 2, 3), keepdims=True)
        var = xf.var(axis=(1, 2, 3), keepdims=True)
        normed = (xf - mu) / jnp.sqrt(var + 1e-5)
        return (normed * weight + bias).astype(x.dtype)


class ADAIN(nn.Module):
    """base_function.py:162-192 — instance norm + descriptor-driven affine."""
    norm_nc: int

    @nn.compact
    def __call__(self, x, z):
        xf = x.astype(jnp.float32)
        mu = xf.mean(axis=(1, 2), keepdims=True)
        var = xf.var(axis=(1, 2), keepdims=True)
        normalized = (xf - mu) / jnp.sqrt(var + 1e-5)
        feat = z.reshape(z.shape[0], -1)
        actv = nn.relu(nn.Dense(128, name="mlp_shared")(feat))
        gamma = nn.Dense(self.norm_nc, name="mlp_gamma")(actv)
        beta = nn.Dense(self.norm_nc, name="mlp_beta")(actv)
        out = (normalized * (1 + gamma[:, None, None].astype(jnp.float32))
               + beta[:, None, None].astype(jnp.float32))
        return out.astype(x.dtype)


class TorchConvTranspose2d(nn.Module):
    """torch ConvTranspose2d(k3, s2, p1, output_padding=1) arithmetic:
    dilate the input by the stride, pad (k-1-p, k-1-p+op), run a VALID
    conv. The kernel param is stored pre-flipped in HWIO so the generic
    converter's OIHW->HWIO transpose plus a flip lands here (the
    facerender converter does both)."""
    features: int

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c_in, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        out = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(1, 1),
            padding=((1, 2), (1, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + bias.astype(x.dtype)


class MappingNet(nn.Module):
    """face_model.py:90-115 — same trunk as facerender's mapping but
    returns the pooled descriptor [B, D, 1] instead of pose heads."""
    cfg: PIRenderConfig

    @nn.compact
    def __call__(self, x):                            # [B, C, T]
        cfg = self.cfg
        x = x.transpose(0, 2, 1)
        x = nn.Conv(cfg.descriptor_nc, (7,), padding="VALID", name="first")(x)
        for i in range(cfg.mapping_layers):
            h = nn.leaky_relu(x, 0.1)
            h = nn.Conv(cfg.descriptor_nc, (3,), padding="VALID",
                        kernel_dilation=(3,), name=f"encoder_{i}")(h)
            x = h + x[:, 3:-3]
        return x.mean(axis=1)[..., None]              # [B, D, 1]


class ADAINEncoderBlock(nn.Module):
    out_nc: int

    @nn.compact
    def __call__(self, x, z):
        # WarpingNet passes nonlinearity=LeakyReLU(0.1) (face_model.py:129)
        h = nn.leaky_relu(ADAIN(x.shape[-1], name="norm_0")(x, z), 0.1)
        h = nn.Conv(self.out_nc, (4, 4), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], name="conv_0")(h)
        h2 = nn.leaky_relu(ADAIN(self.out_nc, name="norm_1")(h, z), 0.1)
        return nn.Conv(self.out_nc, (3, 3), name="conv_1")(h2)


class ADAINDecoderBlock(nn.Module):
    out_nc: int
    hidden_nc: int

    @nn.compact
    def __call__(self, x, z):
        xs = nn.leaky_relu(ADAIN(x.shape[-1], name="norm_s")(x, z), 0.1)
        xs = TorchConvTranspose2d(self.out_nc, name="conv_s")(xs)
        dx = nn.leaky_relu(ADAIN(x.shape[-1], name="norm_0")(x, z), 0.1)
        dx = nn.Conv(self.hidden_nc, (3, 3), name="conv_0")(dx)
        dx = nn.leaky_relu(ADAIN(self.hidden_nc, name="norm_1")(dx, z), 0.1)
        dx = TorchConvTranspose2d(self.out_nc, name="conv_1")(dx)
        return xs + dx


class ADAINHourglass(nn.Module):
    """base_function.py:31-92."""
    cfg: PIRenderConfig

    @nn.compact
    def __call__(self, x, z):
        cfg = self.cfg
        ngf, img_f = cfg.warp_base_nc, cfg.max_nc
        el, dl = cfg.warp_encoder_layer, cfg.warp_decoder_layer
        x = nn.Conv(ngf, (7, 7), name="input_layer")(x)
        outs = [x]
        for i in range(el):
            x = ADAINEncoderBlock(min(ngf * (2 ** (i + 1)), img_f),
                                  name=f"encoder_{i}")(x, z)
            outs.append(x)
        out = outs.pop()
        for i in reversed(range(el - dl, el)):
            oc = min(ngf * (2 ** i), img_f)
            out = ADAINDecoderBlock(oc, oc, name=f"decoder_{i}")(out, z)
            out = jnp.concatenate([out, outs.pop()], axis=-1)
        return out


class WarpingNet(nn.Module):
    """face_model.py:117-148."""
    cfg: PIRenderConfig

    @nn.compact
    def __call__(self, image, descriptor):
        h = ADAINHourglass(self.cfg, name="hourglass")(image, descriptor)
        h = nn.leaky_relu(LayerNorm2d(name="flow_norm")(h), 0.1)
        flow = nn.Conv(2, (7, 7), name="flow_conv")(h)  # [B, H', W', 2]
        deformation = convert_flow_to_deformation(flow.astype(jnp.float32))
        if deformation.shape[1:3] != image.shape[1:3]:
            deformation = jax.image.resize(
                deformation, deformation.shape[:1] + image.shape[1:3] + (2,),
                "bilinear")
        warped = warp_image(image, deformation)
        return {"flow_field": flow, "warp_image": warped}


class FineADAINResBlock2d(nn.Module):
    @nn.compact
    def __call__(self, x, z):
        c = x.shape[-1]
        # reference quirk (base_function.py:316-320): the conv1 branch is
        # computed then overwritten; replicated for exact parameter/parity
        _ = nn.leaky_relu(
            ADAIN(c, name="norm1")(nn.Conv(c, (3, 3), name="conv1")(x), z),
            0.1)  # dead branch, DCE'd by XLA; params kept for the converter
        dx = ADAIN(c, name="norm2")(nn.Conv(c, (3, 3), name="conv2")(x), z)
        return dx + x


class FineEncoder(nn.Module):
    base_nc: int
    layers: int
    max_nc: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.base_nc, (7, 7), name="first_conv")(x)
        x = nn.leaky_relu(LayerNorm2d(name="first_norm")(x), 0.1)
        outs = [x]
        for i in range(self.layers):
            x = nn.Conv(min(self.base_nc * (2 ** (i + 1)), self.max_nc),
                        (3, 3), name=f"down_{i}_conv")(x)
            x = nn.leaky_relu(LayerNorm2d(name=f"down_{i}_norm")(x), 0.1)
            x = x.reshape(x.shape[0], x.shape[1] // 2, 2,
                          x.shape[2] // 2, 2, x.shape[3]).mean((2, 4))
            outs.append(x)
        return outs


class FineDecoder(nn.Module):
    cfg: PIRenderConfig

    @nn.compact
    def __call__(self, feats, z):
        cfg = self.cfg
        ngf, img_f = cfg.edit_base_nc, cfg.max_nc
        out = feats.pop()
        for i in reversed(range(cfg.edit_layer)):
            in_nc = min(ngf * (2 ** (i + 1)), img_f)
            out_nc = min(ngf * (2 ** i), img_f)
            for r in range(cfg.edit_num_res_blocks):
                out = FineADAINResBlock2d(name=f"res_{i}_{r}")(out, z)
            out = jnp.repeat(jnp.repeat(out, 2, axis=1), 2, axis=2)
            out = nn.Conv(out_nc, (3, 3), name=f"up_{i}_conv")(out)
            out = nn.leaky_relu(LayerNorm2d(name=f"up_{i}_norm")(out), 0.1)
            skip = feats.pop()
            skip = nn.Conv(out_nc, (3, 3), name=f"jump_{i}_conv")(skip)
            skip = nn.leaky_relu(LayerNorm2d(name=f"jump_{i}_norm")(skip), 0.1)
            out = skip + out
        out = nn.Conv(cfg.image_nc, (7, 7), name="final_conv")(out)
        return jnp.tanh(out.astype(jnp.float32))


class EditingNet(nn.Module):
    cfg: PIRenderConfig

    @nn.compact
    def __call__(self, image, warp_image, descriptor):
        x = jnp.concatenate([image, warp_image], axis=-1)
        feats = FineEncoder(self.cfg.edit_base_nc, self.cfg.edit_layer,
                            self.cfg.max_nc, name="encoder")(x)
        return FineDecoder(self.cfg, name="decoder")(feats, descriptor)


class FaceGenerator(nn.Module):
    """face_model.py:62-88 — semantics window + source image -> frame."""
    cfg: PIRenderConfig = PIRenderConfig()

    @nn.compact
    def __call__(self, input_image, driving_source, stage=None):
        descriptor = MappingNet(self.cfg, name="mapping_net")(driving_source)
        out = WarpingNet(self.cfg, name="warpping_net")(input_image,
                                                        descriptor)
        if stage != "warp":
            out["fake_image"] = EditingNet(self.cfg, name="editing_net")(
                input_image, out["warp_image"], descriptor)
        return out


def pirender_animation(source_image, target_semantics, model, params):
    """pirender_animate.py:76-84 — scan frames under one jit program.
    source_image [B, H, W, 3]; target_semantics [B, F, 73, 27]."""

    @jax.jit
    def run(source_image, target_semantics):
        def frame(_, sem):
            out = model.apply(params, source_image, sem)
            return None, out["fake_image"]

        _, frames = jax.lax.scan(frame, None,
                                 jnp.moveaxis(target_semantics, 1, 0))
        return jnp.moveaxis(frames, 0, 1)

    return run(source_image, target_semantics)
