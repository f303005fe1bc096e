"""SVD UNet down/mid/up blocks (Flax, NHWC).

Re-derivation of diffusers-0.24 `unet_3d_blocks` spatio-temporal blocks
(imported by /root/reference/MOFA-Video-Traj/models/controlnet_sdv.py:33-36).
Eps split mirrors diffusers: cross-attn blocks 1e-6, plain blocks 1e-5.
"""

from __future__ import annotations


from flax import linen as nn

from mofa_tpu.models.resnet_blocks import SpatioTemporalResBlock, Downsample2D, Upsample2D
from mofa_tpu.models.transformer_blocks import TransformerSpatioTemporalModel


class DownBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True

    @nn.compact
    def __call__(self, x, temb, image_only_indicator):
        outputs = []
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(self.out_channels, eps=1e-5,
                                       name=f"resnets_{i}")(x, temb, image_only_indicator)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, name="downsamplers_0")(x)
            outputs.append(x)
        return x, tuple(outputs)


class CrossAttnDownBlockSpatioTemporal(nn.Module):
    out_channels: int
    heads: int
    num_layers: int = 2
    transformer_layers: int = 1
    cross_attention_dim: int = 1024
    add_downsample: bool = True
    time_context_hw_major_quirk: bool = True

    @nn.compact
    def __call__(self, x, temb, encoder_hidden_states, image_only_indicator):
        outputs = []
        dim_head = self.out_channels // self.heads
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(self.out_channels, eps=1e-6,
                                       name=f"resnets_{i}")(x, temb, image_only_indicator)
            x = TransformerSpatioTemporalModel(
                self.heads, dim_head, self.transformer_layers, self.cross_attention_dim,
                time_context_hw_major_quirk=self.time_context_hw_major_quirk,
                name=f"attentions_{i}")(x, encoder_hidden_states, image_only_indicator)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, name="downsamplers_0")(x)
            outputs.append(x)
        return x, tuple(outputs)


class UNetMidBlockSpatioTemporal(nn.Module):
    channels: int
    heads: int
    transformer_layers: int = 1
    cross_attention_dim: int = 1024
    time_context_hw_major_quirk: bool = True

    @nn.compact
    def __call__(self, x, temb, encoder_hidden_states, image_only_indicator):
        dim_head = self.channels // self.heads
        x = SpatioTemporalResBlock(self.channels, eps=1e-5,
                                   name="resnets_0")(x, temb, image_only_indicator)
        x = TransformerSpatioTemporalModel(
            self.heads, dim_head, self.transformer_layers, self.cross_attention_dim,
            time_context_hw_major_quirk=self.time_context_hw_major_quirk,
            name="attentions_0")(x, encoder_hidden_states, image_only_indicator)
        x = SpatioTemporalResBlock(self.channels, eps=1e-5,
                                   name="resnets_1")(x, temb, image_only_indicator)
        return x


class UpBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True

    @nn.compact
    def __call__(self, x, res_samples, temb, image_only_indicator):
        import jax.numpy as jnp

        for i in range(self.num_layers):
            res = res_samples[-1 - i]
            x = jnp.concatenate([x, res], axis=-1)
            # diffusers UpBlockSpatioTemporal defaults resnet_eps=1e-6
            # (unlike DownBlockSpatioTemporal's hardcoded 1e-5)
            x = SpatioTemporalResBlock(self.out_channels, eps=1e-6,
                                       name=f"resnets_{i}")(x, temb, image_only_indicator)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, name="upsamplers_0")(x)
        return x


class CrossAttnUpBlockSpatioTemporal(nn.Module):
    out_channels: int
    heads: int
    num_layers: int = 3
    transformer_layers: int = 1
    cross_attention_dim: int = 1024
    add_upsample: bool = True
    time_context_hw_major_quirk: bool = True

    @nn.compact
    def __call__(self, x, res_samples, temb, encoder_hidden_states, image_only_indicator):
        import jax.numpy as jnp

        dim_head = self.out_channels // self.heads
        for i in range(self.num_layers):
            res = res_samples[-1 - i]
            x = jnp.concatenate([x, res], axis=-1)
            x = SpatioTemporalResBlock(self.out_channels, eps=1e-6,
                                       name=f"resnets_{i}")(x, temb, image_only_indicator)
            x = TransformerSpatioTemporalModel(
                self.heads, dim_head, self.transformer_layers, self.cross_attention_dim,
                time_context_hw_major_quirk=self.time_context_hw_major_quirk,
                name=f"attentions_{i}")(x, encoder_hidden_states, image_only_indicator)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, name="upsamplers_0")(x)
        return x
