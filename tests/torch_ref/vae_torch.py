"""Independent torch transcription of AutoencoderKLTemporalDecoder.

The reference loads the SVD VAE from the `vae` subfolder of
stable-video-diffusion-img2vid-xt-1-1 via diffusers 0.24
(/root/reference/MOFA-Video-Traj/run_gradio.py:101), which is not
installed in this image. This is a from-scratch torch re-implementation
of exactly the semantics that checkpoint family uses
(diffusers-0.24 `autoencoder_kl_temporal_decoder.py` + `vae.py` +
`unet_2d_blocks.UNetMidBlock2D` + `resnet.py` + `attention_processor.py`):

- Encoder: SD VAE encoder — conv_in, 4x DownEncoderBlock2D (eps=1e-6
  resnets without temb; stride-2 downsample conv with the asymmetric
  (0,1,0,1) pad), UNetMidBlock2D (resnet / single-head group-normed
  attention with residual / resnet), conv_norm_out+silu, double-z
  conv_out; then quant_conv (1x1, 8->8).
- DiagonalGaussianDistribution: mean/logvar chunk, logvar clamp [-30,20];
  `.mode()` == mean (what the reference pipeline uses,
  MOFA-Video-Traj/pipeline/pipeline.py:143-163).
- TemporalDecoder: conv_in, MidBlockTemporalDecoder (SpatioTemporalResBlock
  without temb, eps=1e-6/temporal 1e-5, AlphaBlender merge_strategy
  "learned" with switch_spatial_to_temporal_mix=True, merge_factor 0.0;
  order resnet-attn-resnet), 4x UpBlockTemporalDecoder of
  layers_per_block+1 resnets + nearest-2x Upsample2D, conv_norm_out+silu,
  conv_out, and the final (3,1,1) Conv3d `time_conv_out` over frames.

State-dict names follow diffusers conventions so
`mofa_tpu.models.weights.convert_torch_state_dict` maps them onto the
Flax tree — the same code path a real `svd_xt` vae checkpoint takes.
Used by tests/test_vae_clip_golden.py and the full-chain parity test.
"""

from __future__ import annotations

from typing import Optional, Tuple

import torch
import torch.nn as nn
import torch.nn.functional as F


class ResnetBlock2DNoTemb(nn.Module):
    """diffusers ResnetBlock2D with temb_channels=None (VAE flavor)."""

    def __init__(self, cin: int, cout: int, eps: float = 1e-6):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(32, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return sc + h


class VAEAttention(nn.Module):
    """diffusers Attention as instantiated by UNetMidBlock2D /
    MidBlockTemporalDecoder: single head (heads = C / attention_head_dim
    with attention_head_dim = C), group_norm prenorm, biased qkv + out,
    residual_connection=True, rescale_output_factor=1."""

    def __init__(self, channels: int, eps: float = 1e-6):
        super().__init__()
        self.group_norm = nn.GroupNorm(32, channels, eps=eps)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.ModuleList([nn.Linear(channels, channels)])

    def forward(self, x):
        # x [N, C, H, W]
        n, c, h, w = x.shape
        residual = x
        y = self.group_norm(x).view(n, c, h * w).transpose(1, 2)  # [N, HW, C]
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        attn = torch.softmax(
            (q @ k.transpose(1, 2)).float() * (c ** -0.5), dim=-1
        ).to(v.dtype)
        y = self.to_out[0](attn @ v)
        return y.transpose(1, 2).view(n, c, h, w) + residual


class EncoderTorch(nn.Module):
    """diffusers-0.24 vae.Encoder with double_z (SD VAE encoder)."""

    def __init__(self, in_channels: int = 3, latent_channels: int = 4,
                 block_out_channels: Tuple[int, ...] = (128, 256, 512, 512),
                 layers_per_block: int = 2):
        super().__init__()
        self.conv_in = nn.Conv2d(in_channels, block_out_channels[0], 3,
                                 padding=1)
        self.down_blocks = nn.ModuleList()
        ch = block_out_channels[0]
        for i, cout in enumerate(block_out_channels):
            block = nn.Module()
            block.resnets = nn.ModuleList(
                [ResnetBlock2DNoTemb(ch if j == 0 else cout, cout)
                 for j in range(layers_per_block)])
            if i < len(block_out_channels) - 1:
                down = nn.Module()
                # Downsample2D(padding=0): pad (0,1,0,1) then VALID stride 2
                down.conv = nn.Conv2d(cout, cout, 3, stride=2, padding=0)
                block.downsamplers = nn.ModuleList([down])
            else:
                block.downsamplers = None
            self.down_blocks.append(block)
            ch = cout
        mid = nn.Module()
        mid.resnets = nn.ModuleList(
            [ResnetBlock2DNoTemb(ch, ch), ResnetBlock2DNoTemb(ch, ch)])
        mid.attentions = nn.ModuleList([VAEAttention(ch)])
        self.mid_block = mid
        self.conv_norm_out = nn.GroupNorm(32, ch, eps=1e-6)
        self.conv_out = nn.Conv2d(ch, 2 * latent_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for block in self.down_blocks:
            for resnet in block.resnets:
                x = resnet(x)
            if block.downsamplers is not None:
                x = F.pad(x, (0, 1, 0, 1))
                x = block.downsamplers[0].conv(x)
        x = self.mid_block.resnets[0](x)
        x = self.mid_block.attentions[0](x)
        x = self.mid_block.resnets[1](x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TemporalResnetBlockNoTemb(nn.Module):
    """diffusers TemporalResnetBlock, temb_channels=None ((3,1,1) convs)."""

    def __init__(self, cin: int, cout: int, eps: float = 1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=eps)
        self.conv1 = nn.Conv3d(cin, cout, (3, 1, 1), padding=(1, 0, 0))
        self.norm2 = nn.GroupNorm(32, cout, eps=eps)
        self.conv2 = nn.Conv3d(cout, cout, (3, 1, 1), padding=(1, 0, 0))
        self.conv_shortcut = nn.Conv3d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        # x [B, C, T, H, W]
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return sc + h


class AlphaBlenderLearned(nn.Module):
    """merge_strategy='learned', switch_spatial_to_temporal_mix=True,
    merge_factor=0.0 (the TemporalDecoder flavor)."""

    def __init__(self):
        super().__init__()
        self.mix_factor = nn.Parameter(torch.tensor([0.0]))

    def forward(self, x_spatial, x_temporal):
        alpha = torch.sigmoid(self.mix_factor).to(x_spatial.dtype)
        alpha = 1.0 - alpha      # switch_spatial_to_temporal_mix
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class SpatioTemporalResBlockNoTemb(nn.Module):
    """diffusers SpatioTemporalResBlock with temb_channels=None,
    eps=1e-6, temporal_eps=1e-5, learned merge with switch."""

    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.spatial_res_block = ResnetBlock2DNoTemb(cin, cout, eps=1e-6)
        self.temporal_res_block = TemporalResnetBlockNoTemb(cout, cout,
                                                            eps=1e-5)
        self.time_mixer = AlphaBlenderLearned()

    def forward(self, x, image_only_indicator):
        # x [B*T, C, H, W]; indicator [B, T]
        num_frames = image_only_indicator.shape[-1]
        h = self.spatial_res_block(x)
        bf, c, hh, ww = h.shape
        b = bf // num_frames
        h_mix = h.reshape(b, num_frames, c, hh, ww).permute(0, 2, 1, 3, 4)
        h_temp = self.temporal_res_block(h_mix)
        out = self.time_mixer(h_mix, h_temp)
        return out.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


class TemporalDecoderTorch(nn.Module):
    """diffusers-0.24 TemporalDecoder."""

    def __init__(self, latent_channels: int = 4, out_channels: int = 3,
                 block_out_channels: Tuple[int, ...] = (128, 256, 512, 512),
                 layers_per_block: int = 2):
        super().__init__()
        self.conv_in = nn.Conv2d(latent_channels, block_out_channels[-1], 3,
                                 padding=1)
        ch = block_out_channels[-1]
        mid = nn.Module()
        mid.resnets = nn.ModuleList(
            [SpatioTemporalResBlockNoTemb(ch, ch)
             for _ in range(layers_per_block)])
        mid.attentions = nn.ModuleList([VAEAttention(ch)])
        self.mid_block = mid
        self.up_blocks = nn.ModuleList()
        rev = list(reversed(block_out_channels))
        prev = rev[0]
        for i, cout in enumerate(rev):
            block = nn.Module()
            block.resnets = nn.ModuleList(
                [SpatioTemporalResBlockNoTemb(prev if j == 0 else cout, cout)
                 for j in range(layers_per_block + 1)])
            if i < len(rev) - 1:
                up = nn.Module()
                up.conv = nn.Conv2d(cout, cout, 3, padding=1)
                block.upsamplers = nn.ModuleList([up])
            else:
                block.upsamplers = None
            self.up_blocks.append(block)
            prev = cout
        self.conv_norm_out = nn.GroupNorm(32, block_out_channels[0], eps=1e-6)
        self.conv_out = nn.Conv2d(block_out_channels[0], out_channels, 3,
                                  padding=1)
        self.time_conv_out = nn.Conv3d(out_channels, out_channels, (3, 1, 1),
                                       padding=(1, 0, 0))

    def forward(self, z, image_only_indicator):
        # z [B*T, latent, h, w]; indicator [B, T]
        x = self.conv_in(z)
        # diffusers zips resnets[1:] against the length-1 attention list:
        # at num_layers=1 the attention exists but never runs
        x = self.mid_block.resnets[0](x, image_only_indicator)
        for resnet, attn in zip(self.mid_block.resnets[1:],
                                self.mid_block.attentions):
            x = attn(x)
            x = resnet(x, image_only_indicator)
        for block in self.up_blocks:
            for resnet in block.resnets:
                x = resnet(x, image_only_indicator)
            if block.upsamplers is not None:
                x = F.interpolate(x, scale_factor=2.0, mode="nearest")
                x = block.upsamplers[0].conv(x)
        x = self.conv_out(F.silu(self.conv_norm_out(x)))
        b, t = image_only_indicator.shape
        bf, c, h, w = x.shape
        x = x.reshape(b, t, c, h, w).permute(0, 2, 1, 3, 4)
        x = self.time_conv_out(x)
        return x.permute(0, 2, 1, 3, 4).reshape(bf, c, h, w)


class AutoencoderKLTemporalDecoderTorch(nn.Module):
    def __init__(self, in_channels: int = 3, out_channels: int = 3,
                 latent_channels: int = 4,
                 block_out_channels: Tuple[int, ...] = (128, 256, 512, 512),
                 layers_per_block: int = 2,
                 scaling_factor: float = 0.18215):
        super().__init__()
        self.latent_channels = latent_channels
        self.scaling_factor = scaling_factor
        self.encoder = EncoderTorch(in_channels, latent_channels,
                                    block_out_channels, layers_per_block)
        self.decoder = TemporalDecoderTorch(latent_channels, out_channels,
                                            block_out_channels,
                                            layers_per_block)
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels,
                                    1)

    def encode_moments(self, x):
        """-> (mean, logvar) with the DiagonalGaussianDistribution clamp."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = torch.chunk(moments, 2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)

    def encode_mode(self, x):
        return self.encode_moments(x)[0]

    def decode(self, z, num_frames: int):
        b = z.shape[0] // num_frames
        indicator = torch.zeros(b, num_frames, dtype=z.dtype, device=z.device)
        return self.decoder(z, indicator)
