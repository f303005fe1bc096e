"""AutoencoderKLTemporalDecoder (SVD VAE): 2D encoder + temporal decoder.

Re-derivation of the diffusers-0.24 model loaded by the reference at
/root/reference/MOFA-Video-Traj/run_gradio.py:101 ("vae" subfolder of
stable-video-diffusion-img2vid-xt-1-1). Flax, NHWC.

Encoder: SD VAE encoder (DownEncoderBlock2D x4, mid with single-head
attention), quant_conv; `encode(...).latent_dist.mode()` == mean = first
`latent_channels` output channels.
Decoder: TemporalDecoder — SpatioTemporalResBlocks without temb
(merge_strategy="learned", switch_spatial_to_temporal_mix=True,
temporal_eps=1e-5) and a final (3,1,1) conv over frames.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mofa_tpu.models.layers import GroupNorm, Conv, Dense
from mofa_tpu.models.resnet_blocks import ResnetBlock2D, SpatioTemporalResBlock, Upsample2D


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215


TINY_VAE_CONFIG = VAEConfig(block_out_channels=(32, 32, 64, 64), layers_per_block=1)


class _VAEAttention(nn.Module):
    """Single-head spatial attention with GroupNorm, qkv bias, residual."""

    channels: int

    @nn.compact
    def __call__(self, x):
        # x: [N, H, W, C]
        n, h, w, c = x.shape
        residual = x
        y = GroupNorm(32, 1e-6, name="group_norm")(x).reshape(n, h * w, c)
        q = Dense(c, name="to_q")(y)
        k = Dense(c, name="to_k")(y)
        v = Dense(c, name="to_v")(y)
        scale = c ** -0.5
        logits = jnp.einsum("nqc,nkc->nqk", q, k).astype(jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(y.dtype)
        y = jnp.einsum("nqk,nkc->nqc", probs, v)
        y = Dense(c, name="to_out_0")(y).reshape(n, h, w, c)
        return y + residual


class Encoder(nn.Module):
    cfg: VAEConfig = VAEConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = Conv(cfg.block_out_channels[0], 3, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, eps=1e-6, use_temb=False,
                                  name=f"down_blocks_{i}_resnets_{j}")(x)
            if i < len(cfg.block_out_channels) - 1:
                # SD VAE downsampler: stride-2 conv with asymmetric (0,1) pad
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID", dtype=x.dtype,
                            name=f"down_blocks_{i}_downsamplers_0_conv")(x)
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock2D(ch, eps=1e-6, use_temb=False, name="mid_block_resnets_0")(x)
        x = _VAEAttention(ch, name="mid_block_attentions_0")(x)
        x = ResnetBlock2D(ch, eps=1e-6, use_temb=False, name="mid_block_resnets_1")(x)
        x = GroupNorm(32, 1e-6, name="conv_norm_out")(x)
        x = nn.silu(x)
        return Conv(2 * cfg.latent_channels, 3, name="conv_out")(x)


class TemporalDecoder(nn.Module):
    cfg: VAEConfig = VAEConfig()

    @nn.compact
    def __call__(self, z, image_only_indicator):
        """z: [B*T, h, w, latent]; image_only_indicator [B, T]."""
        cfg = self.cfg
        x = Conv(cfg.block_out_channels[-1], 3, name="conv_in")(z)

        def st_block(ch, name):
            return SpatioTemporalResBlock(
                ch, eps=1e-6, temporal_eps=1e-5, merge_strategy="learned",
                switch_spatial_to_temporal_mix=True, use_temb=False, name=name)

        # MidBlockTemporalDecoder: num_layers = layers_per_block resnets
        # with ONE attention module; forward zips resnets[1:] against the
        # length-1 attention list (diffusers-0.24
        # unet_3d_blocks.MidBlockTemporalDecoder.forward), so exactly
        # resnets[0] [, attn, resnets[1]] run — at layers_per_block=1 the
        # attention params exist in the checkpoint but never run
        ch = cfg.block_out_channels[-1]
        x = st_block(ch, "mid_block_resnets_0")(x, None, image_only_indicator)
        if cfg.layers_per_block >= 2:
            x = _VAEAttention(ch, name="mid_block_attentions_0")(x)
            x = st_block(ch, "mid_block_resnets_1")(x, None,
                                                    image_only_indicator)

        rev = list(reversed(cfg.block_out_channels))
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = st_block(ch, f"up_blocks_{i}_resnets_{j}")(x, None, image_only_indicator)
            if i < len(rev) - 1:
                x = Upsample2D(ch, name=f"up_blocks_{i}_upsamplers_0")(x)

        x = GroupNorm(32, 1e-6, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = Conv(cfg.out_channels, 3, name="conv_out")(x)

        # temporal (3,1,1) conv over frames
        bsz, t = image_only_indicator.shape
        bf = x.shape[0]
        x = x.reshape((bsz, t) + x.shape[1:])
        x = nn.Conv(cfg.out_channels, (3, 1, 1), padding=[(1, 1), (0, 0), (0, 0)],
                    dtype=x.dtype, name="time_conv_out")(x)
        return x.reshape((bf,) + x.shape[2:])


class AutoencoderKLTemporalDecoder(nn.Module):
    cfg: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = TemporalDecoder(self.cfg)
        self.quant_conv = Conv(2 * self.cfg.latent_channels, 1)

    def encode_mode(self, x):
        """x [N, H, W, 3] in [-1, 1] -> latent mean [N, H/8, W/8, 4]."""
        return self.encode_moments(x)[0]

    def encode_moments(self, x):
        """x [N, H, W, 3] -> (mean, logvar), each [N, H/8, W/8, 4].

        logvar clamped to [-30, 20] as in diffusers DiagonalGaussianDistribution
        (used by `latent_dist.sample()` in training, Training/train_stage1.py:323).
        """
        moments = self.encoder(x)
        moments = self.quant_conv(moments)
        c = self.cfg.latent_channels
        mean, logvar = moments[..., :c], moments[..., c:]
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z, num_frames: int):
        """z [B*T, h, w, 4] (already un-scaled) -> frames [B*T, H, W, 3]."""
        bsz = z.shape[0] // num_frames
        indicator = jnp.zeros((bsz, num_frames), z.dtype)
        return self.decoder(z, indicator)

    def __call__(self, x, num_frames: int = 1):
        z = self.encode_mode(x)
        return self.decode(z, num_frames)
