"""Independent torch transcription of the reference diffusion core.

The reference imports its SVD spatio-temporal blocks from diffusers 0.24
(/root/reference/MOFA-Video-Traj/models/controlnet_sdv.py:33-36), which is
not installed in this image. This module is a from-scratch torch
re-implementation of exactly the block semantics that checkpoint family
uses (diffusers 0.24 `unet_3d_blocks` / `transformer_temporal` /
`resnet` / `attention`), plus the reference's own top-level models:

- `UNetSpatioTemporalConditionControlNetModelTorch` — the frozen SVD UNet
  incl. the in-loop residual re-add quirk
  (unet_spatio_temporal_condition_controlnet.py:451-459)
- `FlowControlNetTorch` — ControlNetSDVModel trunk + MOFA flow adapter
  (controlnet_sdv.py:119-309, svdxt_featureflow_forward_controlnet_s2d_
  fixcmp_norefine.py:180-384), incl. the head-count quirk: the trunk runs
  ControlNetSDVModel's DEFAULT num_attention_heads (5,10,10,20) because
  FlowControlNet.__init__ never forwards args to super()
- `softsplat_torch` — CPU scatter-add softmax-splatting with the
  reference's 'avg' normalization (softsplat.py:232-274)

State-dict names follow diffusers conventions so
`mofa_tpu.models.weights.convert_torch_state_dict` maps them onto the
Flax trees — the same code path real checkpoints take. Used only by
tests/test_svd_golden.py: two independent transcriptions agreeing is the
strongest parity evidence obtainable without the pinned diffusers.

Deliberately replicated quirks (shared with the Flax side):
- temporal cross-attn `time_context` is built HW-major while hidden rows
  are batch-major (diffusers-0.24 TransformerSpatioTemporalModel.forward),
  so for B>1 rows attend to the *wrong batch element's* context
- eps split: plain down blocks 1e-5, cross-attn blocks 1e-6, mid 1e-5,
  up blocks 1e-6
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------- embeddings

def timestep_embedding(timesteps: torch.Tensor, dim: int) -> torch.Tensor:
    """diffusers Timesteps(flip_sin_to_cos=True, downscale_freq_shift=0)."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / half
    emb = timesteps.float()[:, None] * torch.exp(exponent)[None, :]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    # flip_sin_to_cos
    emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    if dim % 2 == 1:
        emb = F.pad(emb, (0, 1))
    return emb


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim: int, time_embed_dim: int,
                 out_dim: Optional[int] = None):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, time_embed_dim)
        self.linear_2 = nn.Linear(time_embed_dim, out_dim or time_embed_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


# ---------------------------------------------------------------- attention

class Attention(nn.Module):
    """diffusers Attention: bias-free qkv, biased out proj, SDPA."""

    def __init__(self, query_dim: int, heads: int, dim_head: int,
                 cross_attention_dim: Optional[int] = None):
        super().__init__()
        inner = heads * dim_head
        ctx = cross_attention_dim or query_dim
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(ctx, inner, bias=False)
        self.to_v = nn.Linear(ctx, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        b, l, _ = x.shape
        q = self.to_q(x).view(b, l, self.heads, self.dim_head).transpose(1, 2)
        k = self.to_k(ctx).view(b, -1, self.heads, self.dim_head).transpose(1, 2)
        v = self.to_v(ctx).view(b, -1, self.heads, self.dim_head).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, l, self.heads * self.dim_head)
        return self.to_out[0](o)


class GEGLU(nn.Module):
    def __init__(self, dim: int, inner: int):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim: int, dim_out: Optional[int] = None, mult: int = 4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList(
            [GEGLU(dim, inner), nn.Identity(), nn.Linear(inner, dim_out or dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim: int, heads: int, dim_head: int,
                 cross_attention_dim: Optional[int] = None):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, dim_head, cross_attention_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context=None):
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), context) + x
        return self.ff(self.norm3(x)) + x


class TemporalBasicTransformerBlock(nn.Module):
    """diffusers TemporalBasicTransformerBlock (is_res=True in SVD)."""

    def __init__(self, dim: int, heads: int, dim_head: int,
                 cross_attention_dim: Optional[int] = None):
        super().__init__()
        self.norm_in = nn.LayerNorm(dim)
        self.ff_in = FeedForward(dim)
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, dim_head, cross_attention_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, num_frames: int, context=None):
        bf, seq, ch = x.shape
        b = bf // num_frames
        x = x.reshape(b, num_frames, seq, ch).permute(0, 2, 1, 3)
        x = x.reshape(b * seq, num_frames, ch)

        x = self.ff_in(self.norm_in(x)) + x
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), context) + x
        x = self.ff(self.norm3(x)) + x

        x = x.reshape(b, seq, num_frames, ch).permute(0, 2, 1, 3)
        return x.reshape(bf, seq, ch)


class AlphaBlender(nn.Module):
    """merge_strategy='learned_with_images' (the only one SVD uses)."""

    def __init__(self):
        super().__init__()
        self.mix_factor = nn.Parameter(torch.tensor([0.5]))

    def get_alpha(self, image_only_indicator: torch.Tensor, ndims: int):
        alpha = torch.where(image_only_indicator.bool(),
                            torch.ones(1, 1), torch.sigmoid(self.mix_factor))
        if ndims == 5:        # [B, C, T, H, W]
            alpha = alpha[:, None, :, None, None]
        elif ndims == 3:      # [B*T, L, C]
            alpha = alpha.reshape(-1)[:, None, None]
        else:
            raise ValueError(ndims)
        return alpha

    def forward(self, x_spatial, x_temporal, image_only_indicator):
        alpha = self.get_alpha(image_only_indicator, x_spatial.ndim)
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


# ------------------------------------------------------------------ resnets

class ResnetBlock2D(nn.Module):
    def __init__(self, cin: int, cout: int, temb_channels: int, eps: float):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_channels, cout)
        self.norm2 = nn.GroupNorm(32, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return sc + h


class TemporalResnetBlock(nn.Module):
    def __init__(self, cin: int, cout: int, temb_channels: int, eps: float):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=eps)
        self.conv1 = nn.Conv3d(cin, cout, (3, 1, 1), padding=(1, 0, 0))
        self.time_emb_proj = nn.Linear(temb_channels, cout)
        self.norm2 = nn.GroupNorm(32, cout, eps=eps)
        self.conv2 = nn.Conv3d(cout, cout, (3, 1, 1), padding=(1, 0, 0))
        self.conv_shortcut = nn.Conv3d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        # x [B, C, T, H, W]; temb [B, T, temb]
        h = self.conv1(F.silu(self.norm1(x)))
        t = self.time_emb_proj(F.silu(temb))          # [B, T, C]
        h = h + t.permute(0, 2, 1)[:, :, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return sc + h


class SpatioTemporalResBlock(nn.Module):
    def __init__(self, cin: int, cout: int, temb_channels: int, eps: float):
        super().__init__()
        self.spatial_res_block = ResnetBlock2D(cin, cout, temb_channels, eps)
        self.temporal_res_block = TemporalResnetBlock(cout, cout,
                                                      temb_channels, eps)
        self.time_mixer = AlphaBlender()

    def forward(self, x, temb, image_only_indicator):
        # x [B*T, C, H, W]
        num_frames = image_only_indicator.shape[-1]
        h = self.spatial_res_block(x, temb)
        bf, c, hh, ww = h.shape
        b = bf // num_frames
        h_mix = h.reshape(b, num_frames, c, hh, ww).permute(0, 2, 1, 3, 4)
        temb_bt = temb.reshape(b, num_frames, -1)
        h_temp = self.temporal_res_block(h_mix, temb_bt)
        out = self.time_mixer(h_mix, h_temp, image_only_indicator)
        return out.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


class Downsample2D(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


# -------------------------------------------------------------- transformer

class TransformerSpatioTemporalModel(nn.Module):
    def __init__(self, heads: int, dim_head: int, in_channels: int,
                 num_layers: int, cross_attention_dim: int):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn.GroupNorm(32, in_channels, eps=1e-6)
        self.proj_in = nn.Linear(in_channels, inner)
        self.transformer_blocks = nn.ModuleList([
            BasicTransformerBlock(inner, heads, dim_head, cross_attention_dim)
            for _ in range(num_layers)])
        self.temporal_transformer_blocks = nn.ModuleList([
            TemporalBasicTransformerBlock(inner, heads, dim_head,
                                          cross_attention_dim)
            for _ in range(num_layers)])
        self.time_pos_embed = TimestepEmbedding(in_channels, in_channels * 4,
                                                out_dim=in_channels)
        self.time_mixer = AlphaBlender()
        self.proj_out = nn.Linear(inner, in_channels)
        self.in_channels = in_channels

    def forward(self, x, context, image_only_indicator):
        # x [B*T, C, H, W]; context [B*T, S, D]
        bf, c, h, w = x.shape
        num_frames = image_only_indicator.shape[-1]
        b = bf // num_frames

        # diffusers-0.24 quirk: HW-major context rows vs batch-major hidden
        tc_first = context.reshape(b, num_frames, -1, context.shape[-1])[:, 0]
        time_context = tc_first[None, :, :1].expand(
            h * w, b, 1, context.shape[-1])
        time_context = time_context.reshape(h * w * b, 1, context.shape[-1])

        residual = x
        x = self.norm(x)
        x = x.permute(0, 2, 3, 1).reshape(bf, h * w, c)
        x = self.proj_in(x)

        frame_ids = torch.arange(num_frames).repeat(b, 1).reshape(-1)
        t_emb = timestep_embedding(frame_ids, self.in_channels)
        emb = self.time_pos_embed(t_emb.to(x.dtype))[:, None, :]

        for block, tblock in zip(self.transformer_blocks,
                                 self.temporal_transformer_blocks):
            x = block(x, context)
            x_mix = tblock(x + emb, num_frames, time_context)
            x = self.time_mixer(x, x_mix, image_only_indicator)

        x = self.proj_out(x)
        x = x.reshape(bf, h, w, c).permute(0, 3, 1, 2)
        return x + residual


# ------------------------------------------------------------- unet blocks

class DownBlockSpatioTemporal(nn.Module):
    def __init__(self, cin: int, cout: int, temb_channels: int,
                 num_layers: int, add_downsample: bool):
        super().__init__()
        self.resnets = nn.ModuleList([
            SpatioTemporalResBlock(cin if i == 0 else cout, cout,
                                   temb_channels, eps=1e-5)
            for i in range(num_layers)])
        self.downsamplers = (nn.ModuleList([Downsample2D(cout)])
                             if add_downsample else None)
        self.has_cross_attention = False

    def forward(self, x, temb, image_only_indicator):
        outs = ()
        for resnet in self.resnets:
            x = resnet(x, temb, image_only_indicator)
            outs += (x,)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            outs += (x,)
        return x, outs


class CrossAttnDownBlockSpatioTemporal(nn.Module):
    def __init__(self, cin: int, cout: int, temb_channels: int,
                 num_layers: int, transformer_layers: int, heads: int,
                 cross_attention_dim: int, add_downsample: bool):
        super().__init__()
        self.resnets = nn.ModuleList([
            SpatioTemporalResBlock(cin if i == 0 else cout, cout,
                                   temb_channels, eps=1e-6)
            for i in range(num_layers)])
        self.attentions = nn.ModuleList([
            TransformerSpatioTemporalModel(heads, cout // heads, cout,
                                           transformer_layers,
                                           cross_attention_dim)
            for _ in range(num_layers)])
        self.downsamplers = (nn.ModuleList([Downsample2D(cout)])
                             if add_downsample else None)
        self.has_cross_attention = True

    def forward(self, x, temb, context, image_only_indicator):
        outs = ()
        for resnet, attn in zip(self.resnets, self.attentions):
            x = resnet(x, temb, image_only_indicator)
            x = attn(x, context, image_only_indicator)
            outs += (x,)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            outs += (x,)
        return x, outs


class UNetMidBlockSpatioTemporal(nn.Module):
    def __init__(self, ch: int, temb_channels: int, transformer_layers: int,
                 heads: int, cross_attention_dim: int):
        super().__init__()
        self.resnets = nn.ModuleList([
            SpatioTemporalResBlock(ch, ch, temb_channels, eps=1e-5),
            SpatioTemporalResBlock(ch, ch, temb_channels, eps=1e-5)])
        self.attentions = nn.ModuleList([
            TransformerSpatioTemporalModel(heads, ch // heads, ch,
                                           transformer_layers,
                                           cross_attention_dim)])

    def forward(self, x, temb, context, image_only_indicator):
        x = self.resnets[0](x, temb, image_only_indicator)
        for attn, resnet in zip(self.attentions, self.resnets[1:]):
            x = attn(x, context, image_only_indicator)
            x = resnet(x, temb, image_only_indicator)
        return x


class UpBlockSpatioTemporal(nn.Module):
    def __init__(self, cin: int, prev_out: int, cout: int,
                 temb_channels: int, num_layers: int, add_upsample: bool):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            res_skip = cin if i == num_layers - 1 else cout
            res_in = prev_out if i == 0 else cout
            resnets.append(SpatioTemporalResBlock(res_in + res_skip, cout,
                                                  temb_channels, eps=1e-6))
        self.resnets = nn.ModuleList(resnets)
        self.upsamplers = (nn.ModuleList([Upsample2D(cout)])
                           if add_upsample else None)
        self.has_cross_attention = False

    def forward(self, x, res_tuple, temb, image_only_indicator):
        for resnet in self.resnets:
            res = res_tuple[-1]
            res_tuple = res_tuple[:-1]
            x = torch.cat([x, res], dim=1)
            x = resnet(x, temb, image_only_indicator)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class CrossAttnUpBlockSpatioTemporal(nn.Module):
    def __init__(self, cin: int, prev_out: int, cout: int,
                 temb_channels: int, num_layers: int, transformer_layers: int,
                 heads: int, cross_attention_dim: int, add_upsample: bool):
        super().__init__()
        resnets, attentions = [], []
        for i in range(num_layers):
            res_skip = cin if i == num_layers - 1 else cout
            res_in = prev_out if i == 0 else cout
            resnets.append(SpatioTemporalResBlock(res_in + res_skip, cout,
                                                  temb_channels, eps=1e-6))
            attentions.append(TransformerSpatioTemporalModel(
                heads, cout // heads, cout, transformer_layers,
                cross_attention_dim))
        self.resnets = nn.ModuleList(resnets)
        self.attentions = nn.ModuleList(attentions)
        self.upsamplers = (nn.ModuleList([Upsample2D(cout)])
                           if add_upsample else None)
        self.has_cross_attention = True

    def forward(self, x, res_tuple, temb, context, image_only_indicator):
        for resnet, attn in zip(self.resnets, self.attentions):
            res = res_tuple[-1]
            res_tuple = res_tuple[:-1]
            x = torch.cat([x, res], dim=1)
            x = resnet(x, temb, image_only_indicator)
            x = attn(x, context, image_only_indicator)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


# ----------------------------------------------------------------- trunks

def _build_embeddings(m: nn.Module, cfg) -> None:
    c0 = cfg.block_out_channels[0]
    m.conv_in = nn.Conv2d(cfg.in_channels, c0, 3, padding=1)
    m.time_embedding = TimestepEmbedding(c0, cfg.time_embed_dim)
    m.add_embedding = TimestepEmbedding(
        cfg.projection_class_embeddings_input_dim, cfg.time_embed_dim)


def _embed(m: nn.Module, cfg, sample, timestep, added_time_ids):
    b = sample.shape[0]
    ts = torch.as_tensor(timestep, dtype=torch.float32).reshape(-1).expand(b)
    emb = m.time_embedding(timestep_embedding(ts, cfg.block_out_channels[0]))
    time_embeds = timestep_embedding(added_time_ids.flatten(),
                                     cfg.addition_time_embed_dim)
    emb = emb + m.add_embedding(time_embeds.reshape(b, -1).to(emb.dtype))
    return emb


def _build_down_blocks(cfg, heads) -> nn.ModuleList:
    blocks = nn.ModuleList([])
    out_ch = cfg.block_out_channels[0]
    for i, bt in enumerate(cfg.down_block_types):
        in_ch, out_ch = out_ch, cfg.block_out_channels[i]
        final = i == len(cfg.block_out_channels) - 1
        if bt == "CrossAttnDownBlockSpatioTemporal":
            blocks.append(CrossAttnDownBlockSpatioTemporal(
                in_ch, out_ch, cfg.time_embed_dim, cfg.layers_per_block,
                cfg.transformer_layers_per_block, heads[i],
                cfg.cross_attention_dim, add_downsample=not final))
        else:
            blocks.append(DownBlockSpatioTemporal(
                in_ch, out_ch, cfg.time_embed_dim, cfg.layers_per_block,
                add_downsample=not final))
    return blocks


class UNetSpatioTemporalConditionControlNetModelTorch(nn.Module):
    """Frozen SVD UNet + ControlNet-residual re-add quirk.

    cfg is a mofa_tpu SVDUNetConfig; heads come from cfg.num_attention_heads
    (the checkpoint's (5, 10, 20, 20) family).
    """

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        heads = cfg.num_attention_heads
        _build_embeddings(self, cfg)
        self.down_blocks = _build_down_blocks(cfg, heads)
        self.mid_block = UNetMidBlockSpatioTemporal(
            cfg.block_out_channels[-1], cfg.time_embed_dim,
            cfg.transformer_layers_per_block, heads[-1],
            cfg.cross_attention_dim)

        self.up_blocks = nn.ModuleList([])
        rev_ch = list(reversed(cfg.block_out_channels))
        rev_heads = list(reversed(heads))
        out_ch = rev_ch[0]
        for i, bt in enumerate(cfg.up_block_types):
            final = i == len(cfg.block_out_channels) - 1
            prev_out, out_ch = out_ch, rev_ch[i]
            in_ch = rev_ch[min(i + 1, len(cfg.block_out_channels) - 1)]
            n_layers = cfg.layers_per_block + 1
            if bt == "CrossAttnUpBlockSpatioTemporal":
                self.up_blocks.append(CrossAttnUpBlockSpatioTemporal(
                    in_ch, prev_out, out_ch, cfg.time_embed_dim, n_layers,
                    cfg.transformer_layers_per_block, rev_heads[i],
                    cfg.cross_attention_dim, add_upsample=not final))
            else:
                self.up_blocks.append(UpBlockSpatioTemporal(
                    in_ch, prev_out, out_ch, cfg.time_embed_dim, n_layers,
                    add_upsample=not final))

        self.conv_norm_out = nn.GroupNorm(32, cfg.block_out_channels[0],
                                          eps=1e-5)
        self.conv_out = nn.Conv2d(cfg.block_out_channels[0],
                                  cfg.out_channels, 3, padding=1)

    def forward(self, sample, timestep, encoder_hidden_states, added_time_ids,
                down_block_additional_residuals=None,
                mid_block_additional_residual=None):
        # sample [B, T, C, H, W]
        b, t = sample.shape[:2]
        emb = _embed(self, self.cfg, sample, timestep, added_time_ids)
        sample = sample.flatten(0, 1)
        emb = emb.repeat_interleave(t, dim=0)
        context = encoder_hidden_states.repeat_interleave(t, dim=0)
        image_only_indicator = torch.zeros(b, t, dtype=sample.dtype)

        x = self.conv_in(sample)
        down_block_res_samples = (x,)
        for block in self.down_blocks:
            if block.has_cross_attention:
                x, res = block(x, emb, context, image_only_indicator)
            else:
                x, res = block(x, emb, image_only_indicator)
            down_block_res_samples += res
            if down_block_additional_residuals is not None:
                # the quirk: re-zip the GROWING tuple against the residual
                # list every iteration (unet...controlnet.py:451-459)
                down_block_res_samples = tuple(
                    s + r for s, r in zip(down_block_res_samples,
                                          down_block_additional_residuals))

        x = self.mid_block(x, emb, context, image_only_indicator)
        if mid_block_additional_residual is not None:
            x = x + mid_block_additional_residual

        for block in self.up_blocks:
            n = len(block.resnets)
            res, down_block_res_samples = (down_block_res_samples[-n:],
                                           down_block_res_samples[:-n])
            if block.has_cross_attention:
                x = block(x, res, emb, context, image_only_indicator)
            else:
                x = block(x, res, emb, image_only_indicator)

        x = self.conv_out(F.silu(self.conv_norm_out(x)))
        return x.reshape(b, t, *x.shape[1:])


# ----------------------------------------------------------- flow adapter

def softsplat_torch(ten_in: torch.Tensor, ten_flow: torch.Tensor,
                    mode: str = "avg") -> torch.Tensor:
    """CPU forward softmax-splatting, 'avg' mode (softsplat.py:232-345).

    ten_in [N, C, H, W]; ten_flow [N, 2, H, W] (dx, dy). Each source pixel
    scatters to the 4 bilinear neighbors of (x+dx, y+dy); 'avg' splats an
    extra ones channel and divides by it + 1e-7.
    """
    assert mode == "avg"
    n, c, h, w = ten_in.shape
    ten_in = torch.cat([ten_in, ten_in.new_ones(n, 1, h, w)], dim=1)
    c1 = c + 1
    out = ten_in.new_zeros(n, c1, h, w)

    gx = torch.arange(w, dtype=torch.float32)[None, None, :] + ten_flow[:, 0]
    gy = torch.arange(h, dtype=torch.float32)[None, :, None] + ten_flow[:, 1]
    finite = torch.isfinite(gx) & torch.isfinite(gy)
    gx = torch.where(finite, gx, torch.full_like(gx, -10.0))
    gy = torch.where(finite, gy, torch.full_like(gy, -10.0))

    x0, y0 = torch.floor(gx).long(), torch.floor(gy).long()
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi, yi = x0 + dx, y0 + dy
        wgt = ((1.0 - (gx - x0.float()) if dx == 0 else gx - x0.float())
               * (1.0 - (gy - y0.float()) if dy == 0 else gy - y0.float()))
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h) & finite
        idx = (yi.clamp(0, h - 1) * w + xi.clamp(0, w - 1))  # [N, H, W]
        contrib = ten_in * torch.where(valid, wgt, torch.zeros_like(wgt))[:, None]
        out.view(n, c1, h * w).scatter_add_(
            2, idx.view(n, 1, h * w).expand(n, c1, h * w),
            contrib.view(n, c1, h * w))
    norm = out[:, -1:] + 1e-7
    return out[:, :-1] / norm


class ControlNetConditioningEmbeddingSVD(nn.Module):
    def __init__(self, emb_channels: int, block_out: Tuple[int, ...],
                 cond_channels: int = 3):
        super().__init__()
        self.conv_in = nn.Conv2d(cond_channels, block_out[0], 3, padding=1)
        blocks = []
        for i in range(len(block_out) - 1):
            blocks.append(nn.Conv2d(block_out[i], block_out[i], 3, padding=1))
            blocks.append(nn.Conv2d(block_out[i], block_out[i + 1], 3,
                                    padding=1, stride=2))
        self.blocks = nn.ModuleList(blocks)
        self.conv_out = nn.Conv2d(block_out[-1], emb_channels, 3, padding=1)

    def forward(self, x):
        x = F.silu(self.conv_in(x))
        for b in self.blocks:
            x = F.silu(b(x))
        return self.conv_out(x)


class _FirstFrameEncoderLayer(nn.Module):
    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.conv_in = nn.Conv2d(cin, cout, 3, padding=1, stride=2)

    def forward(self, x):
        return F.silu(self.conv_in(x))


class FlowControlNetFirstFrameEncoder(nn.Module):
    def __init__(self, cin: int, channels: Tuple[int, ...]):
        super().__init__()
        self.encoders = nn.ModuleList([])
        self.zeroconvs = nn.ModuleList([])
        for ch in channels:
            self.encoders.append(_FirstFrameEncoderLayer(cin, ch))
            self.zeroconvs.append(nn.Conv2d(ch, ch, 1))
            cin = ch

    def forward(self, x):
        outs = []
        for enc, zc in zip(self.encoders, self.zeroconvs):
            x = enc(x)
            outs.append(zc(x))
        return outs


class FlowControlNetTorch(nn.Module):
    """MOFA-Adapter: ControlNetSDV trunk + warped first-frame injection.

    Trunk heads come from cfg.controlnet_num_attention_heads — the
    reference quirk where super().__init__() drops the configured heads
    (svdxt...norefine.py:213) and the trunk runs ControlNetSDVModel's
    defaults (5, 10, 10, 20).
    """

    def __init__(self, cfg,
                 conditioning_embedding_out_channels=(16, 32, 96, 256)):
        super().__init__()
        self.cfg = cfg
        heads = cfg.controlnet_num_attention_heads
        _build_embeddings(self, cfg)
        self.down_blocks = _build_down_blocks(cfg, heads)
        self.mid_block = UNetMidBlockSpatioTemporal(
            cfg.block_out_channels[-1], cfg.time_embed_dim,
            cfg.transformer_layers_per_block, heads[-1],
            cfg.cross_attention_dim)

        self.controlnet_down_blocks = nn.ModuleList([])
        c0 = cfg.block_out_channels[0]
        self.controlnet_down_blocks.append(nn.Conv2d(c0, c0, 1))
        for i, ch in enumerate(cfg.block_out_channels):
            for _ in range(cfg.layers_per_block):
                self.controlnet_down_blocks.append(nn.Conv2d(ch, ch, 1))
            if i != len(cfg.block_out_channels) - 1:
                self.controlnet_down_blocks.append(nn.Conv2d(ch, ch, 1))
        cm = cfg.block_out_channels[-1]
        self.controlnet_mid_block = nn.Conv2d(cm, cm, 1)

        self.controlnet_cond_embedding = ControlNetConditioningEmbeddingSVD(
            c0, conditioning_embedding_out_channels)
        self.flow_encoder = FlowControlNetFirstFrameEncoder(
            c0, (c0,) + tuple(cfg.block_out_channels[1:3]))

    def forward(self, sample, timestep, encoder_hidden_states, added_time_ids,
                controlnet_cond, controlnet_flow, conditioning_scale=1.0):
        # sample [B, T, C, H/8, W/8]; controlnet_cond [B, 3, H, W];
        # controlnet_flow [B, T-1, 2, H, W]
        b, t = sample.shape[:2]
        emb = _embed(self, self.cfg, sample, timestep, added_time_ids)
        sample = sample.flatten(0, 1)
        emb = emb.repeat_interleave(t, dim=0)
        context = encoder_hidden_states.repeat_interleave(t, dim=0)
        image_only_indicator = torch.zeros(b, t, dtype=sample.dtype)

        x = self.conv_in(sample)

        cond = self.controlnet_cond_embedding(controlnet_cond)
        cond_features = [cond] + self.flow_encoder(cond)

        fb, fl, fc, fh, fw = controlnet_flow.shape
        scale_flows = {}
        for scale in (8, 16, 32, 64):
            sf = F.interpolate(controlnet_flow.reshape(-1, fc, fh, fw),
                               scale_factor=1 / scale)
            scale_flows[scale] = sf.reshape(fb, fl, fc, fh // scale,
                                            fw // scale) / scale

        warped_features = []
        for feat in cond_features:
            ch = feat.shape[2]
            flows = scale_flows[fh // ch]
            frames = [softsplat_torch(feat, flows[:, i]).unsqueeze(1)
                      for i in range(fl)]
            full = torch.cat([feat.unsqueeze(1)] + frames, dim=1)
            warped_features.append(full.flatten(0, 1))

        count, length = 0, len(warped_features)
        x = x + warped_features[count]
        count += 1

        down_block_res_samples = (x,)
        for block in self.down_blocks:
            if block.has_cross_attention:
                x, res = block(x, emb, context, image_only_indicator)
            else:
                x, res = block(x, emb, image_only_indicator)
            x = x + warped_features[min(count, length - 1)]
            count += 1
            down_block_res_samples += res

        x = x + warped_features[-1]
        x = self.mid_block(x, emb, context, image_only_indicator)

        ctrl = tuple(zc(s) * conditioning_scale for s, zc in
                     zip(down_block_res_samples, self.controlnet_down_blocks))
        mid = self.controlnet_mid_block(x) * conditioning_scale
        return ctrl, mid
