"""ControlNetSDV trunk: SVD-shaped ControlNet (Flax, NHWC).

Re-derivation of `ControlNetSDVModel`
(/root/reference/MOFA-Video-Traj/models/controlnet_sdv.py:119-571): conv_in,
time/added-time embeddings, the 4 spatio-temporal down blocks + mid block of
the SVD UNet, 12 zero-initialised 1x1 `controlnet_down_blocks` and a
`controlnet_mid_block`, plus the 4-layer conditioning embedding
(`ControlNetConditioningEmbeddingSVD`, controlnet_sdv.py:61-117).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mofa_tpu.models.layers import Conv
from mofa_tpu.models.svd_unet import (SVDUNetConfig,
                                      embed_timestep_and_ids, maybe_remat)
from mofa_tpu.models.unet_blocks import (
    DownBlockSpatioTemporal, CrossAttnDownBlockSpatioTemporal,
    UNetMidBlockSpatioTemporal,
)


class ControlNetConditioningEmbeddingSVD(nn.Module):
    """4-conv encoder image-space -> latent-space (/8): channels
    conditioning_embedding_out_channels, zero-init conv_out."""

    conditioning_embedding_channels: int
    block_out_channels: Tuple[int, ...] = (16, 32, 96, 256)

    @nn.compact
    def __call__(self, conditioning):
        # [N, H, W, C] -> [N, H/8, W/8, emb]
        x = Conv(self.block_out_channels[0], 3, name="conv_in")(conditioning)
        x = nn.silu(x)
        for i in range(len(self.block_out_channels) - 1):
            x = Conv(self.block_out_channels[i], 3, name=f"blocks_{2 * i}")(x)
            x = nn.silu(x)
            x = Conv(self.block_out_channels[i + 1], 3, stride=2,
                     name=f"blocks_{2 * i + 1}")(x)
            x = nn.silu(x)
        return Conv(self.conditioning_embedding_channels, 3, zero_init=True,
                    name="conv_out")(x)


class ControlNetTrunk(nn.Module):
    """Shared embedding trunk + down/mid blocks + zero convs.

    Subclass-style composition: FlowControlNet drives this with per-scale
    warped-feature injection; the plain ControlNetSDV path adds the cond
    embedding at conv_in only.
    """

    cfg: SVDUNetConfig = SVDUNetConfig()
    remat_blocks: bool = False

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states, added_time_ids,
                 inject_features: Optional[list] = None,
                 cond_at_conv_in=None,
                 conditioning_scale: float = 1.0):
        """sample [B, T, H, W, C_in]. inject_features: optional list of
        [B*T, h_s, w_s, c_s] tensors added into the trunk at each scale
        (index 0 applied after conv_in, index i after down block i-1, the
        last one re-applied before mid — FlowControlNet semantics,
        svdxt...norefine.py:328-357). cond_at_conv_in: plain-ControlNetSDV
        single conditioning add after conv_in (controlnet_sdv.py:517-519).
        Returns (down_residuals, mid_residual).
        """
        cfg = self.cfg
        bsz, num_frames = sample.shape[:2]
        dtype = sample.dtype

        emb = embed_timestep_and_ids(cfg, self, timestep, added_time_ids, bsz, dtype)
        x = sample.reshape((bsz * num_frames,) + sample.shape[2:])
        emb = jnp.repeat(emb, num_frames, axis=0)
        ehs = jnp.repeat(encoder_hidden_states, num_frames, axis=0)
        image_only_indicator = jnp.zeros((bsz, num_frames), dtype=dtype)

        x = Conv(cfg.block_out_channels[0], 3, name="conv_in")(x)
        from mofa_tpu.parallel.activation import constrain_batch
        x = constrain_batch(x)   # frame-parallel layout hint (no-op w/o mesh)

        if cond_at_conv_in is not None:
            x = x + cond_at_conv_in.astype(x.dtype)

        count = 0
        if inject_features is not None:
            length = len(inject_features)
            x = x + inject_features[0].astype(x.dtype)
            count = 1

        # The trunk's head counts come from ControlNetSDVModel's defaults
        # ((5, 10, 10, 20)), NOT the UNet checkpoint's (5, 10, 20, 20):
        # FlowControlNet.__init__ never forwards its args to super()
        # (svdxt...norefine.py:213, controlnet_sdv.py:180).
        heads = cfg.controlnet_num_attention_heads
        down_block_res_samples = (x,)
        for i, bt in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            if bt == "CrossAttnDownBlockSpatioTemporal":
                x, res = maybe_remat(CrossAttnDownBlockSpatioTemporal,
                                     self.remat_blocks)(
                    out_ch, heads[i], cfg.layers_per_block,
                    cfg.transformer_layers_per_block, cfg.cross_attention_dim,
                    add_downsample=not is_final,
                    time_context_hw_major_quirk=cfg.time_context_hw_major_quirk,
                    name=f"down_blocks_{i}",
                )(x, emb, ehs, image_only_indicator)
            else:
                x, res = maybe_remat(DownBlockSpatioTemporal,
                                     self.remat_blocks)(
                    out_ch, cfg.layers_per_block, add_downsample=not is_final,
                    name=f"down_blocks_{i}")(x, emb, image_only_indicator)
            if inject_features is not None:
                x = x + inject_features[min(count, length - 1)].astype(x.dtype)
                count += 1
            down_block_res_samples += res

        if inject_features is not None:
            # reference re-adds the last-scale feature once more before mid
            x = x + inject_features[-1].astype(x.dtype)

        x = maybe_remat(UNetMidBlockSpatioTemporal, self.remat_blocks)(
            cfg.block_out_channels[-1], heads[-1],
            cfg.transformer_layers_per_block, cfg.cross_attention_dim,
            time_context_hw_major_quirk=cfg.time_context_hw_major_quirk,
            name="mid_block")(x, emb, ehs, image_only_indicator)

        ctrl_residuals = []
        for i, s in enumerate(down_block_res_samples):
            r = Conv(s.shape[-1], 1, zero_init=True,
                     name=f"controlnet_down_blocks_{i}")(s)
            ctrl_residuals.append(r * conditioning_scale)
        mid_residual = Conv(x.shape[-1], 1, zero_init=True,
                            name="controlnet_mid_block")(x) * conditioning_scale
        return tuple(ctrl_residuals), mid_residual
