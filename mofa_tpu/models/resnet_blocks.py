"""Spatio-temporal resnet blocks of the SVD UNet (Flax, NHWC).

Faithful re-derivation of diffusers-0.24 `ResnetBlock2D`,
`TemporalResnetBlock`, `SpatioTemporalResBlock` (the blocks instantiated by
/root/reference/MOFA-Video-Traj/models/controlnet_sdv.py:33-36 via
diffusers.models.unet_3d_blocks), plus Down/Upsample2D.

Layout: spatial tensors [B*T, H, W, C]; temporal resnet runs on
[B, T, H, W, C] with a (3,1,1) conv over the frame axis.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from mofa_tpu.models.layers import GroupNorm, Conv, Dense, AlphaBlender


class ResnetBlock2D(nn.Module):
    out_channels: int
    eps: float = 1e-6
    use_temb: bool = True

    @nn.compact
    def __call__(self, x, temb=None):
        in_ch = x.shape[-1]
        h = GroupNorm(32, self.eps, name="norm1")(x)
        h = nn.silu(h)
        h = Conv(self.out_channels, 3, name="conv1")(h)
        if self.use_temb and temb is not None:
            t = Dense(self.out_channels, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = GroupNorm(32, self.eps, name="norm2")(h)
        h = nn.silu(h)
        h = Conv(self.out_channels, 3, name="conv2")(h)
        if in_ch != self.out_channels:
            x = Conv(self.out_channels, 1, name="conv_shortcut")(x)
        return x + h


class TemporalResnetBlock(nn.Module):
    """Resnet over the frame axis; input [B, T, H, W, C]."""

    out_channels: int
    eps: float = 1e-6
    use_temb: bool = True

    @nn.compact
    def __call__(self, x, temb=None):
        in_ch = x.shape[-1]
        h = GroupNorm(32, self.eps, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 1, 1), padding=[(1, 1), (0, 0), (0, 0)],
                    dtype=x.dtype, name="conv1")(h)
        if self.use_temb and temb is not None:
            # temb [B, T, temb_ch] -> bias over [B, T, 1, 1, C]
            t = Dense(self.out_channels, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, :, None, None, :]
        h = GroupNorm(32, self.eps, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 1, 1), padding=[(1, 1), (0, 0), (0, 0)],
                    dtype=x.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1, 1), dtype=x.dtype, name="conv_shortcut")(x)
        return x + h


class SpatioTemporalResBlock(nn.Module):
    """spatial resnet -> temporal resnet -> learned alpha blend."""

    out_channels: int
    eps: float = 1e-6
    temporal_eps: Optional[float] = None
    merge_strategy: str = "learned_with_images"
    switch_spatial_to_temporal_mix: bool = False
    use_temb: bool = True

    @nn.compact
    def __call__(self, x, temb=None, image_only_indicator=None):
        # x: [B*T, H, W, C]
        bsz, t = image_only_indicator.shape
        h = ResnetBlock2D(self.out_channels, self.eps, self.use_temb,
                          name="spatial_res_block")(x, temb)
        bf, hh, ww, cc = h.shape
        h_bt = h.reshape(bsz, t, hh, ww, cc)
        temb_bt = temb.reshape(bsz, t, -1) if (temb is not None and self.use_temb) else None
        h_temp = TemporalResnetBlock(
            self.out_channels, self.temporal_eps or self.eps, self.use_temb,
            name="temporal_res_block")(h_bt, temb_bt)
        out = AlphaBlender(self.merge_strategy, self.switch_spatial_to_temporal_mix,
                           name="time_mixer")(h_bt, h_temp, image_only_indicator)
        return out.reshape(bf, hh, ww, cc)


class Downsample2D(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        return Conv(self.out_channels, 3, stride=2, name="conv")(x)


class Upsample2D(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return Conv(self.out_channels, 3, name="conv")(x)
