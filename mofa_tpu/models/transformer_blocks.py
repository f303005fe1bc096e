"""Spatial + temporal transformer blocks of the SVD UNet (Flax, NHWC).

Re-derivation of diffusers-0.24 `BasicTransformerBlock`,
`TemporalBasicTransformerBlock` and `TransformerSpatioTemporalModel` —
the attention stack consumed by the reference ControlNet/UNet
(/root/reference/MOFA-Video-Traj/models/controlnet_sdv.py:33-36).

Temporal attention attends over frames for every spatial token
([B*H*W, T, C] layout) and cross-attends to the *first frame's* CLIP
embedding; a learned AlphaBlender merges spatial/temporal streams.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from mofa_tpu.models.layers import (
    Attention, FeedForward, GroupNorm, LayerNorm, Dense, AlphaBlender,
    get_timestep_embedding, TimestepEmbedding, ln_ff_residual,
)


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, encoder_hidden_states=None):
        h = LayerNorm(name="norm1")(x)
        x = Attention(self.heads, self.dim_head, name="attn1")(h) + x
        if self.cross_attention_dim is not None:
            h = LayerNorm(name="norm2")(x)
            x = Attention(self.heads, self.dim_head, self.cross_attention_dim,
                          name="attn2")(h, encoder_hidden_states) + x
        return ln_ff_residual(self, x, "norm3", "ff")


class TemporalBasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, num_frames: int, encoder_hidden_states=None,
                 tmajor: bool = False):
        # x: [B*T, L, C] -> attention over frames per spatial token
        from mofa_tpu.parallel.activation import constrain_batch
        bf, seq, ch = x.shape
        bsz = bf // num_frames
        if tmajor:
            # spatial-major fast path: every op here except attn1 is
            # rowwise (row-order invariant), so the [B*T, L, C] <->
            # [B*L, T, C] transposes are dropped and attention reads the
            # natural layout via Attention(tmajor_frames=...). ctx is the
            # per-spatial-token [B, L, 1, D] form.
            x = ln_ff_residual(self, x, "norm_in", "ff_in")
            h = LayerNorm(name="norm1")(x)
            x = Attention(self.heads, self.dim_head,
                          tmajor_frames=num_frames, name="attn1")(h) + x
            if self.cross_attention_dim is not None:
                h = LayerNorm(name="norm2")(x)
                x = Attention(self.heads, self.dim_head,
                              self.cross_attention_dim,
                              tmajor_frames=num_frames,
                              name="attn2")(h, encoder_hidden_states) + x
            return ln_ff_residual(self, x, "norm3", "ff")
        x = x.reshape(bsz, num_frames, seq, ch).transpose(0, 2, 1, 3)
        x = x.reshape(bsz * seq, num_frames, ch)
        # Ulysses-style re-shard for frame-parallel inference: attention is
        # global over frames, so the frame axis must be device-local here;
        # constraining dim 0 (batch*spatial tokens) to the mesh makes the
        # spatial<->temporal transition one clean all-to-all instead of
        # SPMD-propagated frame-sharded layouts (forced full remat).
        x = constrain_batch(x)

        x = ln_ff_residual(self, x, "norm_in", "ff_in")

        h = LayerNorm(name="norm1")(x)
        x = Attention(self.heads, self.dim_head, name="attn1")(h) + x
        if self.cross_attention_dim is not None:
            h = LayerNorm(name="norm2")(x)
            x = Attention(self.heads, self.dim_head, self.cross_attention_dim,
                          name="attn2")(h, encoder_hidden_states) + x
        x = ln_ff_residual(self, x, "norm3", "ff")

        x = x.reshape(bsz, seq, num_frames, ch).transpose(0, 2, 1, 3)
        return constrain_batch(x.reshape(bf, seq, ch))


class TransformerSpatioTemporalModel(nn.Module):
    heads: int
    dim_head: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = 1024
    # diffusers-0.24 TransformerSpatioTemporalModel.forward builds the
    # temporal cross-attn context HW-major — `tc[None, :].broadcast_to(
    # (H*W, B, 1, D)).reshape(H*W*B, 1, D)` — while the temporal block's
    # hidden rows are batch-major (B*HW). For B>1 (the CFG batch!) row r of
    # the hidden states therefore attends to context (hw=r//B, b=r%B), NOT
    # its own batch element: the uncond half sees cond CLIP tokens on every
    # odd spatial token. Replicated by default for reference parity.
    time_context_hw_major_quirk: bool = True

    @nn.compact
    def __call__(self, x, encoder_hidden_states, image_only_indicator):
        # x: [B*T, H, W, C]; encoder_hidden_states: [B*T, S, D]
        bf, h, w, ch = x.shape
        bsz, num_frames = image_only_indicator.shape
        inner = self.heads * self.dim_head

        # temporal cross-attn context = first frame's CLIP tokens per spatial pos
        tc = encoder_hidden_states.reshape(bsz, num_frames, -1, encoder_hidden_states.shape[-1])[:, 0]

        # spatial-major fast path (no [B*T,L,C]<->[B*L,T,C] transposes):
        # needs a per-(batch, spatial token) SINGLE-token context, which
        # exists for S=1 contexts in every quirk mode except the odd-B>1
        # raw-quirk corner (its hw-major flattening interleaves batch).
        # Policy coupling (parallel/activation.py): under token-parallel
        # sharding ("tokens") tmajor is REQUIRED — its layouts keep the
        # token dim intact so the S-sharding flows collective-free (the
        # kernel dispatch swaps Pallas for a sharded-safe einsum). Under
        # "frames" sharding (training) tmajor is off: the frame-parallel
        # all-to-all rides the classic transposes.
        import os
        from mofa_tpu.parallel.activation import sharding_policy
        tmajor = (os.environ.get("MOFA_TMAJOR", "") != "0"
                  and sharding_policy() != "frames"
                  and tc.shape[1] == 1
                  and (bsz == 1 or bsz % 2 == 0
                       or not self.time_context_hw_major_quirk))
        if self.time_context_hw_major_quirk and bsz % 2 == 0:
            # PAIRWISE quirk semantics. The reference only ever runs the
            # quirk at B=2 (one CFG pair); for it, hidden row (b2, hw)
            # reads context side (b2*HW + hw) % 2 of that pair. When this
            # framework stacks several CFG pairs on the batch axis
            # (keypoint --window_batch groups windows CFG-major as
            # [uncond_0..uncond_{V-1}, cond_0..cond_{V-1}]), applying the
            # raw HW-major reshape at the ACTUAL batch would cross-
            # contaminate *windows* — something the reference never does.
            # Instead each pair (v, half+v) gets exactly the reference's
            # B=2 misalignment: bit-identical at B=2, and window-batched
            # denoising stays exactly equal to the window-at-a-time scan.
            half = bsz // 2
            tcs = tc[:, 0]                          # [B, D] (S=1, as ref :1)
            tc2 = tcs.reshape(2, half, -1)
            sides = jnp.arange(bsz) // half         # CFG side per batch row
            vs = jnp.arange(bsz) % half             # pair (window) index
            hw_idx = jnp.arange(h * w)
            sel = (sides[:, None] * (h * w) + hw_idx[None, :]) % 2  # [B, HW]
            ctx = jnp.where(sel[..., None] == 0,
                            tc2[0][vs][:, None, :], tc2[1][vs][:, None, :])
            if tmajor:
                time_context = ctx[:, :, None, :]        # [B, HW, 1, D]
            else:
                time_context = ctx.reshape(bsz * h * w, 1, tcs.shape[-1])
        elif self.time_context_hw_major_quirk and tmajor:
            # bsz == 1 here (tmajor excludes odd B>1 with the quirk): the
            # hw-major flattening degenerates to a plain broadcast
            time_context = jnp.broadcast_to(
                tc[:, None, :1], (bsz, h * w, 1, tc.shape[-1]))
        elif self.time_context_hw_major_quirk:
            # odd batch: the raw reference indexing (for B=1 it reduces to
            # the batch-major no-quirk layout)
            # [B, S, D] -> [H*W, B, 1, D] -> [H*W*B, 1, D] (S collapses to 1
            # exactly as the reference broadcast does; SVD always has S=1)
            time_context = jnp.broadcast_to(
                tc[None, :, :1], (h * w, bsz, 1, tc.shape[-1]))
            time_context = time_context.reshape(h * w * bsz, 1, tc.shape[-1])
        elif tmajor:
            time_context = jnp.broadcast_to(
                tc[:, None], (bsz, h * w) + tc.shape[1:])  # [B, HW, 1, D]
        else:
            time_context = jnp.broadcast_to(tc[:, None], (bsz, h * w) + tc.shape[1:])
            time_context = time_context.reshape(bsz * h * w, *tc.shape[1:])

        residual = x
        x = GroupNorm(32, 1e-6, name="norm")(x)
        x = x.reshape(bf, h * w, ch)
        x = Dense(inner, name="proj_in")(x)

        # frame-index positional embedding for the temporal stream
        frame_ids = jnp.tile(jnp.arange(num_frames), bsz)
        t_emb = get_timestep_embedding(frame_ids, inner)
        emb = TimestepEmbedding(inner * 4, out_dim=inner, name="time_pos_embed")(
            t_emb.astype(x.dtype))
        emb = emb[:, None, :]

        for i in range(self.num_layers):
            x_spatial = BasicTransformerBlock(
                self.heads, self.dim_head, self.cross_attention_dim,
                name=f"transformer_blocks_{i}")(x, encoder_hidden_states)
            x_mix = x_spatial + emb
            x_mix = TemporalBasicTransformerBlock(
                self.heads, self.dim_head, self.cross_attention_dim,
                name=f"temporal_transformer_blocks_{i}")(
                x_mix, num_frames, time_context, tmajor=tmajor)
            x = AlphaBlender(name="time_mixer")(x_spatial, x_mix, image_only_indicator)

        x = Dense(ch, name="proj_out")(x)
        return x.reshape(bf, h, w, ch) + residual
