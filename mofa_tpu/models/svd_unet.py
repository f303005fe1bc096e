"""Frozen SVD-XT spatio-temporal UNet, ControlNet-residual-aware (Flax, NHWC).

Re-derivation of `UNetSpatioTemporalConditionControlNetModel`
(/root/reference/MOFA-Video-Traj/models/unet_spatio_temporal_condition_controlnet.py:32-502)
on top of the diffusers-0.24 SVD UNet architecture.

Bug-compat quirk replicated (default on, gated by `residual_readd_quirk`):
the reference adds ControlNet residuals inside the down-block loop by
re-zipping the *growing* skip tuple against the residual list each
iteration (unet...controlnet.py:451-459), so residual k is re-added once
per subsequent down block — effective multiplicities [4,4,4,4,3,3,3,2,2,2,1,1]
for the standard 4-block config.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mofa_tpu.models.layers import (
    GroupNorm, Conv, TimestepEmbedding, get_timestep_embedding,
)
from mofa_tpu.models.unet_blocks import (
    DownBlockSpatioTemporal, CrossAttnDownBlockSpatioTemporal,
    UNetMidBlockSpatioTemporal, UpBlockSpatioTemporal,
    CrossAttnUpBlockSpatioTemporal,
)


@dataclasses.dataclass(frozen=True)
class SVDUNetConfig:
    in_channels: int = 8
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "DownBlockSpatioTemporal",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 768
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    transformer_layers_per_block: int = 1
    num_attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    # The reference ControlNet trunk runs DIFFERENT head counts than the
    # UNet: FlowControlNet.__init__ calls super().__init__() with no args
    # (svdxt...norefine.py:213), so the trunk gets ControlNetSDVModel's
    # defaults (5, 10, 10, 20) (controlnet_sdv.py:180) while the frozen
    # SVD-XT UNet checkpoint config has (5, 10, 20, 20). Head count does
    # not change param shapes but DOES change attention outputs.
    controlnet_num_attention_heads: Tuple[int, ...] = (5, 10, 10, 20)
    # diffusers-0.24 builds the temporal cross-attn context HW-major,
    # cross-contaminating CFG batch rows (see transformer_blocks.py).
    # Default-on for reference parity; False gives the corrected batch-major
    # context (required for exact cfg_split equivalence in the pipelines).
    time_context_hw_major_quirk: bool = True
    num_frames: int = 25

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


TINY_UNET_CONFIG = SVDUNetConfig(
    block_out_channels=(32, 64, 64, 64),
    num_attention_heads=(2, 4, 4, 4),
    controlnet_num_attention_heads=(2, 4, 2, 4),  # keep the quirk exercised
    cross_attention_dim=32,
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=24,
)

# single-layer blocks: cheapest config that still exercises every block type
# (used by train-step tests / dryrun where XLA CPU compile time dominates)
MICRO_UNET_CONFIG = SVDUNetConfig(
    block_out_channels=(32, 64, 64, 64),
    num_attention_heads=(2, 4, 4, 4),
    controlnet_num_attention_heads=(2, 4, 2, 4),
    cross_attention_dim=32,
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=24,
    layers_per_block=1,
)


def embed_timestep_and_ids(cfg: SVDUNetConfig, module: nn.Module, timesteps,
                           added_time_ids, batch_size: int, dtype):
    """Shared time/added-time embedding trunk (UNet + ControlNet)."""
    t_emb = get_timestep_embedding(
        jnp.broadcast_to(jnp.atleast_1d(timesteps), (batch_size,)),
        cfg.block_out_channels[0]).astype(dtype)
    emb = TimestepEmbedding(cfg.time_embed_dim, name="time_embedding",
                            parent=module)(t_emb)
    time_embeds = get_timestep_embedding(
        added_time_ids.reshape(-1), cfg.addition_time_embed_dim)
    time_embeds = time_embeds.reshape(batch_size, -1).astype(dtype)
    aug_emb = TimestepEmbedding(cfg.time_embed_dim, name="add_embedding",
                                parent=module)(time_embeds)
    return emb + aug_emb


def apply_residuals_with_quirk(down_block_res_samples: tuple, residuals, upto: int,
                               quirk: bool):
    """Re-add residuals[0:upto] onto the first `upto` skip samples (quirk) or
    add each residual exactly once (fixed mode handled by caller)."""
    if residuals is None:
        return down_block_res_samples
    new = []
    for i, s in enumerate(down_block_res_samples):
        if i < upto:
            s = s + residuals[i].astype(s.dtype)
        new.append(s)
    return tuple(new)


def maybe_remat(cls, enable: bool):
    """Block-level gradient checkpointing: nn.remat keeps the param tree
    identical, so converted checkpoints load unchanged. Finer-grained
    than one jax.checkpoint around the whole model, whose backward must
    re-materialize every interior activation at once (OOMs at the
    reference train config on a 16 GB chip)."""
    return nn.remat(cls) if enable else cls


class UNetSpatioTemporalConditionModel(nn.Module):
    cfg: SVDUNetConfig = SVDUNetConfig()
    residual_readd_quirk: bool = True
    remat_blocks: bool = False

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states, added_time_ids,
                 down_block_additional_residuals: Optional[Sequence] = None,
                 mid_block_additional_residual=None):
        """sample [B, T, H, W, C_in]; encoder_hidden_states [B, S, D];
        added_time_ids [B, 3]. Returns [B, T, H, W, C_out]."""
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

        down_block_res_samples = (x,)
        residuals = down_block_additional_residuals
        if residuals is not None and not self.residual_readd_quirk:
            # "fixed" semantics: each residual added exactly once at the end
            pass

        for i, bt in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            if bt == "CrossAttnDownBlockSpatioTemporal":
                x, res = maybe_remat(CrossAttnDownBlockSpatioTemporal,
                                     self.remat_blocks)(
                    out_ch, cfg.num_attention_heads[i], cfg.layers_per_block,
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
            down_block_res_samples += res
            if residuals is not None and self.residual_readd_quirk:
                down_block_res_samples = apply_residuals_with_quirk(
                    down_block_res_samples, residuals,
                    upto=len(down_block_res_samples), quirk=True)

        if residuals is not None and not self.residual_readd_quirk:
            down_block_res_samples = tuple(
                s + r.astype(s.dtype)
                for s, r in zip(down_block_res_samples, residuals))

        x = maybe_remat(UNetMidBlockSpatioTemporal, self.remat_blocks)(
            cfg.block_out_channels[-1], cfg.num_attention_heads[-1],
            cfg.transformer_layers_per_block, cfg.cross_attention_dim,
            time_context_hw_major_quirk=cfg.time_context_hw_major_quirk,
            name="mid_block")(x, emb, ehs, image_only_indicator)
        if mid_block_additional_residual is not None:
            x = x + mid_block_additional_residual.astype(x.dtype)

        n_up = len(cfg.up_block_types)
        for i, bt in enumerate(cfg.up_block_types):
            rev = list(reversed(cfg.block_out_channels))
            out_ch = rev[i]
            num_layers = cfg.layers_per_block + 1
            res = down_block_res_samples[-num_layers:]
            down_block_res_samples = down_block_res_samples[:-num_layers]
            is_final = i == n_up - 1
            heads_rev = list(reversed(cfg.num_attention_heads))
            if bt == "CrossAttnUpBlockSpatioTemporal":
                x = maybe_remat(CrossAttnUpBlockSpatioTemporal,
                                self.remat_blocks)(
                    out_ch, heads_rev[i], num_layers,
                    cfg.transformer_layers_per_block, cfg.cross_attention_dim,
                    add_upsample=not is_final,
                    time_context_hw_major_quirk=cfg.time_context_hw_major_quirk,
                    name=f"up_blocks_{i}",
                )(x, res, emb, ehs, image_only_indicator)
            else:
                x = maybe_remat(UpBlockSpatioTemporal, self.remat_blocks)(
                    out_ch, num_layers, add_upsample=not is_final,
                    name=f"up_blocks_{i}")(x, res, emb, image_only_indicator)

        x = GroupNorm(32, 1e-5, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = Conv(cfg.out_channels, 3, name="conv_out")(x)
        return x.reshape((bsz, num_frames) + x.shape[1:])
