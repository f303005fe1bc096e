"""GFPGAN v1 'clean' face restorer (Flax, NHWC).

In-framework implementation of the reference's optional face enhancer
(/root/reference/MOFA-Video-Hybrid/sadtalker_audio2pose/src/utils/
face_enhancer.py:42-123 runs TencentARC GFPGANv1.4 via `GFPGANer`).
Architecture re-derived from the public gfpgan/basicsr "clean" sources
(`gfpganv1_clean_arch.py`, `stylegan2_clean_arch.py`): a U-Net
degradation-removal encoder producing per-scale SFT conditions + a
StyleGAN2 decoder with channel-split SFT (GFPGANv1.4 config: out_size 512,
channel_multiplier 2, different_w, input_is_latent, sft_half, narrow 1).

Weights load from the released `GFPGANv1.4.pth` via
`models.weights.convert_gfpgan_state_dict`. The face-detection/alignment
half of GFPGANer stays external (README "Deliberate omissions"); the
aligned-crop mode (`GFPGANer(has_aligned=True)` — 512x512 face in, 512x512
out) is fully in-framework via `enhance_aligned`.

Determinism: the reference defaults to randomize_noise=True (fresh randn
per call); here stored noise buffers are the default (`noise_mode=
"stored"`), with "random" available via `key=`.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mofa_tpu.ops.resize import resize_nhwc


def _lrelu(x):
    return nn.leaky_relu(x, 0.2)


def _clean_channels(narrow: float, cm: float) -> dict:
    return {4: int(512 * narrow), 8: int(512 * narrow), 16: int(512 * narrow),
            32: int(512 * narrow), 64: int(256 * cm * narrow),
            128: int(128 * cm * narrow), 256: int(64 * cm * narrow),
            512: int(32 * cm * narrow), 1024: int(16 * cm * narrow)}


def _conv(features, k, bias=True, name=None):
    return nn.Conv(features, (k, k), padding=[(k // 2, k // 2)] * 2,
                   use_bias=bias, name=name)


class ResBlockClean(nn.Module):
    """gfpganv1_clean_arch.ResBlock: conv-lrelu, bilinear resample,
    conv-lrelu + resampled 1x1 skip."""

    out_channels: int
    mode: str  # 'down' | 'up'

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        h, w = x.shape[1:3]
        size = ((h // 2, w // 2) if self.mode == "down" else (h * 2, w * 2))
        out = _lrelu(_conv(cin, 3, name="conv1")(x))
        out = resize_nhwc(out, size, method="bilinear")
        out = _lrelu(_conv(self.out_channels, 3, name="conv2")(out))
        skip = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                       name="skip")(resize_nhwc(x, size, method="bilinear"))
        return out + skip


class ModulatedConv2d(nn.Module):
    """stylegan2_clean_arch.ModulatedConv2d (grouped conv as vmapped
    per-sample conv; weight stored HWIO)."""

    out_channels: int
    kernel_size: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: Optional[str] = None
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x, style):
        cin = x.shape[-1]
        k = self.kernel_size
        # named 'kernel' so the generic OIHW->HWIO converter rule lands here
        weight = self.param(
            "kernel",
            lambda key, shape: jax.random.normal(key, shape)
            / math.sqrt(cin * k * k), (k, k, cin, self.out_channels))
        s = nn.Dense(cin, bias_init=nn.initializers.ones,
                     name="modulation")(style)          # [B, cin]
        w = weight[None] * s[:, None, None, :, None]    # [B, k, k, cin, cout]
        if self.demodulate:
            demod = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=(1, 2, 3))
                                  + self.eps)           # [B, cout]
            w = w * demod[:, None, None, None, :]
        if self.sample_mode == "upsample":
            x = resize_nhwc(x, (x.shape[1] * 2, x.shape[2] * 2), "bilinear")
        elif self.sample_mode == "downsample":
            x = resize_nhwc(x, (x.shape[1] // 2, x.shape[2] // 2), "bilinear")

        def one(xi, wi):
            return jax.lax.conv_general_dilated(
                xi[None], wi, (1, 1), [(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

        return jax.vmap(one)(x, w)


class StyleConv(nn.Module):
    out_channels: int
    kernel_size: int
    num_style_feat: int
    sample_mode: Optional[str] = None

    @nn.compact
    def __call__(self, x, style, noise):
        out = ModulatedConv2d(self.out_channels, self.kernel_size,
                              self.num_style_feat, demodulate=True,
                              sample_mode=self.sample_mode,
                              name="modulated_conv")(x, style)
        out = out * 2 ** 0.5  # "for conversion" scaling in the clean arch
        strength = self.param("noise_strength", nn.initializers.zeros, (1,))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        out = out + strength * noise + bias
        return _lrelu(out)


class ToRGB(nn.Module):
    num_style_feat: int
    upsample: bool = True

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv2d(3, 1, self.num_style_feat, demodulate=False,
                              name="modulated_conv")(x, style)
        out = out + self.param("bias", nn.initializers.zeros, (3,))
        if skip is not None:
            if self.upsample:
                skip = resize_nhwc(skip, (skip.shape[1] * 2, skip.shape[2] * 2),
                                   "bilinear")
            out = out + skip
        return out


class StyleGAN2GeneratorCSFT(nn.Module):
    """Clean StyleGAN2 generator with channel-split SFT conditions."""

    out_size: int = 512
    num_style_feat: int = 512
    num_mlp: int = 8
    channel_multiplier: float = 2
    narrow: float = 1
    sft_half: bool = True

    @property
    def log_size(self):
        return int(math.log2(self.out_size))

    @property
    def num_layers(self):
        return (self.log_size - 2) * 2 + 1

    @property
    def num_latent(self):
        return self.log_size * 2 - 2

    def style_mlp(self, x):
        # Sequential(NormStyleCode, [Linear, LeakyReLU] * num_mlp):
        # torch indices 1, 3, 5, ... are the Linears
        x = x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=1,
                                       keepdims=True) + 1e-8)
        for i in range(self.num_mlp):
            x = _lrelu(nn.Dense(self.num_style_feat,
                                name=f"style_mlp_{2 * i + 1}")(x))
        return x

    @nn.compact
    def __call__(self, latent, conditions, input_is_latent: bool = True,
                 noise_mode: str = "stored", key=None):
        """latent [B, num_latent, D] (or [B, D] broadcast); conditions:
        list of 2*(log_size-2) SFT tensors (scale, shift per level, NHWC).
        """
        ch = _clean_channels(self.narrow, self.channel_multiplier)
        nsf = self.num_style_feat
        # always instantiate the style MLP so the param tree matches the
        # checkpoint even in the input_is_latent (GFPGANv1.4) mode
        mlp_out = self.style_mlp(latent.reshape(-1, nsf))
        if not input_is_latent:
            latent = mlp_out.reshape(latent.shape[0], -1, nsf)
        if latent.ndim == 2:
            latent = jnp.repeat(latent[:, None], self.num_latent, axis=1)
        b = latent.shape[0]

        noises = []
        for li in range(self.num_layers):
            r = 2 ** ((li + 5) // 2)
            if noise_mode == "stored":
                noises.append(self.param(f"noises_noise{li}",
                                         nn.initializers.normal(1.0),
                                         (1, r, r, 1)))
            else:
                key, sub = jax.random.split(key)
                noises.append(jax.random.normal(sub, (b, r, r, 1)))

        const = self.param("constant_input_weight",
                           nn.initializers.normal(1.0), (1, 4, 4, ch[4]))
        out = jnp.repeat(const, b, axis=0)
        out = StyleConv(ch[4], 3, nsf, name="style_conv1")(
            out, latent[:, 0], noises[0])
        skip = ToRGB(nsf, upsample=False, name="to_rgb1")(out, latent[:, 1])

        i = 1
        for level in range(3, self.log_size + 1):
            cout = ch[2 ** level]
            out = StyleConv(cout, 3, nsf, sample_mode="upsample",
                            name=f"style_convs_{i - 1}")(
                out, latent[:, i], noises[i])
            if i < len(conditions):
                scale, shift = conditions[i - 1], conditions[i]
                if self.sft_half:
                    same, sft = jnp.split(out, 2, axis=-1)
                    out = jnp.concatenate([same, sft * scale + shift], axis=-1)
                else:
                    out = out * scale + shift
            out = StyleConv(cout, 3, nsf, name=f"style_convs_{i}")(
                out, latent[:, i + 1], noises[i + 1])
            skip = ToRGB(nsf, name=f"to_rgbs_{i // 2}")(
                out, latent[:, i + 2], skip)
            i += 2
        return skip


class GFPGANv1Clean(nn.Module):
    out_size: int = 512
    num_style_feat: int = 512
    channel_multiplier: float = 2
    num_mlp: int = 8
    input_is_latent: bool = True
    different_w: bool = True
    narrow: float = 1
    sft_half: bool = True

    @nn.compact
    def __call__(self, x, noise_mode: str = "stored", key=None):
        """x [B, S, S, 3] in [-1, 1] (S = out_size) -> restored [B, S, S, 3]."""
        log_size = int(math.log2(self.out_size))
        ch = _clean_channels(self.narrow * 0.5, self.channel_multiplier)

        feat = _lrelu(nn.Conv(ch[self.out_size], (1, 1),
                              name="conv_body_first")(x))
        skips = []
        for i, lvl in enumerate(range(log_size, 2, -1)):
            feat = ResBlockClean(ch[2 ** (lvl - 1)], "down",
                                 name=f"conv_body_down_{i}")(feat)
            skips.insert(0, feat)
        feat = _lrelu(_conv(ch[4], 3, name="final_conv")(feat))

        # style code: torch flattens CHW-major
        flat = jnp.transpose(feat, (0, 3, 1, 2)).reshape(feat.shape[0], -1)
        out_dim = ((log_size * 2 - 2) * self.num_style_feat
                   if self.different_w else self.num_style_feat)
        style_code = nn.Dense(out_dim, name="final_linear")(flat)
        if self.different_w:
            style_code = style_code.reshape(style_code.shape[0], -1,
                                            self.num_style_feat)

        conditions = []
        for i, lvl in enumerate(range(3, log_size + 1)):
            feat = feat + skips[i]
            feat = ResBlockClean(ch[2 ** lvl], "up",
                                 name=f"conv_body_up_{i}")(feat)
            cch = ch[2 ** lvl] if self.sft_half else ch[2 ** lvl] * 2
            scale = _conv(cch, 3, name=f"condition_scale_{i}_2")(
                _lrelu(_conv(ch[2 ** lvl], 3,
                             name=f"condition_scale_{i}_0")(feat)))
            shift = _conv(cch, 3, name=f"condition_shift_{i}_2")(
                _lrelu(_conv(ch[2 ** lvl], 3,
                             name=f"condition_shift_{i}_0")(feat)))
            conditions += [scale, shift]
            # encoder-side RGB heads (return_rgb branch) — applied so the
            # param tree matches the checkpoint; outputs unused at inference
            nn.Conv(3, (1, 1), name=f"toRGB_{i}")(feat)

        return StyleGAN2GeneratorCSFT(
            self.out_size, self.num_style_feat, self.num_mlp,
            self.channel_multiplier, self.narrow, self.sft_half,
            name="stylegan_decoder")(
                style_code, conditions,
                input_is_latent=self.input_is_latent,
                noise_mode=noise_mode, key=key)


TINY_GFPGAN_CONFIG = dict(out_size=32, num_style_feat=16, num_mlp=2,
                          channel_multiplier=0.125, narrow=0.0625,
                          sft_half=True)


def enhance_aligned(model: GFPGANv1Clean, params, frames01: np.ndarray,
                    batch: int = 4) -> np.ndarray:
    """GFPGANer(has_aligned=True) mode: each frame is treated as an aligned
    512x512 face crop (face_enhancer.py feeds facerender crops). frames01
    [T, H, W, 3] float in [0,1] -> same shape/range restored."""
    t, h, w = frames01.shape[:3]
    s = model.out_size
    x = resize_nhwc(jnp.asarray(frames01, jnp.float32), (s, s), "bilinear")
    x = x * 2.0 - 1.0
    outs = []
    apply = jax.jit(lambda p, v: model.apply(p, v))
    for i in range(0, t, batch):
        outs.append(apply(params, x[i:i + batch]))
    out = jnp.concatenate(outs, axis=0)
    out = jnp.clip(out / 2 + 0.5, 0.0, 1.0)
    return np.asarray(resize_nhwc(out, (h, w), "bilinear"))
