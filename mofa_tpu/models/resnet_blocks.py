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


class TemporalConv3(nn.Module):
    """(3,1,1) frame-axis conv computed as ONE GEMM + shifted adds.

    Matches flax `nn.Conv(out, (3,1,1), padding=[(1,1),(0,0),(0,0)])` math
    (zero 'same' padding on the frame axis) with an identical param tree
    (kernel [3,1,1,Cin,Cout], bias [Cout]) so weight converters and goldens
    are unchanged. Input is the flattened [B, T, HW, C] view.

    Why: the XLA TPU conv emitter handles the 5-D [B,T,H,W,C] (3,1,1) conv
    by relayouting activations into a (2,128)-tiled layout and runs at
    ~55-65% MXU with ~1 ms relayout copies on both sides (device trace,
    tools/trace_full.py at the 576x1024 bench shape). One [*,Cin]x[Cin,3Cout]
    GEMM stays in the (8,128) spatial layouts, and the frame shifts
    (y[t] = z0[t-1] + z1[t] + z2[t+1]) are pad+slice elementwise fusions.
    """

    out_channels: int

    @nn.compact
    def __call__(self, x):
        # x: [B, T, HW, C]
        b, t, s, cin = x.shape
        co = self.out_channels
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 1, 1, cin, co), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (co,), jnp.float32)
        # [3,1,1,Cin,Co] -> [Cin, 3*Co] (tap-major lanes, lane-sliced
        # back below: the former [B,T,HW,3,Co] 5-D reshape made XLA
        # relayout the whole GEMM output — 4 x ~124 MB copies per /8
        # site in the compiled HLO; slicing the 3C lane dim keeps the
        # [*, lanes] layout intact)
        wcat = jnp.moveaxis(kernel[:, 0, 0], 0, 1).reshape(cin, 3 * co)
        z = jnp.dot(x, wcat.astype(x.dtype))            # [B, T, HW, 3*Co]
        y = z[..., co:2 * co]
        # tap 0 multiplies frame t-1; tap 2 multiplies frame t+1
        y = y + jnp.pad(z[:, : t - 1, :, :co], ((0, 0), (1, 0), (0, 0), (0, 0)))
        y = y + jnp.pad(z[:, 1:, :, 2 * co:], ((0, 0), (0, 1), (0, 0), (0, 0)))
        return y + bias.astype(y.dtype)


class PointwiseConv3D(nn.Module):
    """(1,1,1) conv as a matmul; param tree identical to nn.Conv's
    kernel [1,1,1,Cin,Cout] + bias so weight converters are unchanged."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, 1, cin, self.out_channels), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_channels,), jnp.float32)
        w = kernel.reshape(cin, self.out_channels)
        return jnp.dot(x, w.astype(x.dtype)) + bias.astype(x.dtype)


class TemporalResnetBlock(nn.Module):
    """Resnet over the frame axis; input [B, T, H, W, C].

    Internally runs on the flattened [B, T, HW, C] view: the (3,1,1) convs
    become GEMMs (TemporalConv3) and GroupNorm/SiLU are rank-agnostic, so
    no 5-D activation layouts are ever materialized on TPU.
    """

    out_channels: int
    eps: float = 1e-6
    use_temb: bool = True

    @nn.compact
    def __call__(self, x, temb=None):
        # accepts [B, T, H, W, C] (single-chip path) or the flat
        # [B, T, HW, C] view (frame-parallel path keeps the token dim
        # whole so its sharding survives the internal reshapes)
        if x.ndim == 5:
            b, tt, hh, ww, in_ch = x.shape
            s, out5 = hh * ww, True
        else:
            b, tt, s, in_ch = x.shape
            out5 = False
        # norms/silu run on the NATURAL flat [B*T, HW, C] rows with
        # frame-pooled stats (pool_leading) — running them on the
        # [B, T, HW, C] view made XLA relayout the fp32 GN intermediate
        # HW-minor (~0.5 ms x 2 norms per /8 site, device trace
        # 2026-08-20); only TemporalConv3 sees the 4-D view (leading-dim
        # split, layout-free)
        flat = lambda y: y.reshape(b * tt, s, y.shape[-1])
        to4 = lambda y: y.reshape(b, tt, s, y.shape[-1])
        x = flat(x)
        h = GroupNorm(32, self.eps, name="norm1")(x, pool_leading=tt)
        h = nn.silu(h)
        h = flat(TemporalConv3(self.out_channels, name="conv1")(to4(h)))
        if self.use_temb and temb is not None:
            # temb [B, T, temb_ch] -> bias over [B*T, 1, C]
            t = Dense(self.out_channels, name="time_emb_proj")(nn.silu(temb))
            h = h + t.reshape(b * tt, 1, self.out_channels)
        h = GroupNorm(32, self.eps, name="norm2")(h, pool_leading=tt)
        h = nn.silu(h)
        h = TemporalConv3(self.out_channels, name="conv2")(to4(h))
        x4 = to4(x)
        if in_ch != self.out_channels:
            x4 = PointwiseConv3D(self.out_channels, name="conv_shortcut")(x4)
        out = x4 + h
        return (out.reshape(b, tt, hh, ww, self.out_channels) if out5
                else out)


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
        from mofa_tpu.parallel.activation import (constrain_dim,
                                                  sharding_policy)
        bsz, t = image_only_indicator.shape
        h = ResnetBlock2D(self.out_channels, self.eps, self.use_temb,
                          name="spatial_res_block")(x, temb)
        bf, hh, ww, cc = h.shape
        temb_bt = temb.reshape(bsz, t, -1) if (temb is not None and self.use_temb) else None
        temporal = TemporalResnetBlock(
            self.out_channels, self.temporal_eps or self.eps, self.use_temb,
            name="temporal_res_block")
        blender = AlphaBlender(self.merge_strategy,
                               self.switch_spatial_to_temporal_mix,
                               name="time_mixer")
        if sharding_policy() == "tokens":
            # token-parallel: stay on the FLAT [*, HW, C] views so the
            # token sharding survives every reshape (the token dim is
            # never split or merged) — the temporal block is then fully
            # device-local. The 5-D path's [B*T,...]->[B,T,...] split of
            # a sharded dim 0 is inexpressible to GSPMD and was measured
            # as a 660 MB all-gather per site at the deploy shape
            # (PROJECTION_v5e8.json largest_ops).
            h3 = constrain_dim(h.reshape(bf, hh * ww, cc), 1)
            h_bt = h3.reshape(bsz, t, hh * ww, cc)
            h_temp = temporal(h_bt, temb_bt)
            out = blender(h_bt, h_temp, image_only_indicator)
            out3 = constrain_dim(out.reshape(bf, hh * ww, cc), 1)
            return out3.reshape(bf, hh, ww, cc)
        h_bt = h.reshape(bsz, t, hh, ww, cc)
        h_temp = temporal(h_bt, temb_bt)
        out = blender(h_bt, h_temp, image_only_indicator)
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
