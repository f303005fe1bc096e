"""MOFA-Adapter: flow-warping ControlNet branches (Flax, NHWC).

- `FlowControlNet` — trajectory variant
  (/root/reference/MOFA-Video-Traj/models/svdxt_featureflow_forward_controlnet_s2d_fixcmp_norefine.py:181-384)
- `LdmkFlowControlNet` — landmark/face variant with a second conditioning
  embedding for rasterized landmark frames and per-scale occlusion matting
  (/root/reference/MOFA-Video-Hybrid/models/ldmk_ctrlnet.py:190-575)

TPU-first split: the warped multi-scale feature stack depends only on
(first frame, flow) — NOT on the latent or timestep — so it is exposed as a
separate `encode_features` method that pipelines call ONCE per video and
reuse across all denoise steps and the CFG batch. The reference recomputes
~4,800 softsplat launches per video inside the denoise loop (SURVEY.md §3.1);
here warping runs once.

Warp batching: all (T-1) frames are splatted in a single batched kernel call
(frames folded into the batch axis) instead of the reference's per-frame
Python loop.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from mofa_tpu.kernels.softsplat import softsplat
from mofa_tpu.models.controlnet_sdv import (
    ControlNetConditioningEmbeddingSVD, ControlNetTrunk,
)
from mofa_tpu.models.hourglass import ForegroundMatting
from mofa_tpu.models.layers import Conv
from mofa_tpu.models.svd_unet import SVDUNetConfig
from mofa_tpu.ops.resize import resize_nhwc


class FirstFrameEncoder(nn.Module):
    """Pyramid encoder of the /8 cond embedding: stride-2 conv+silu per level
    with zero-init 1x1 output convs (svdxt...norefine.py:104-155).

    The LANDMARK adapter's copy of this encoder has the zeroconvs commented
    out (ldmk_ctrlnet.py:145,155-160) and returns the raw conv features —
    use_zeroconv=False reproduces that variant (and its checkpoint keys).
    """

    channels: tuple = (320, 640, 1280)
    use_zeroconv: bool = True

    @nn.compact
    def __call__(self, feature):
        outs = []
        for i, ch in enumerate(self.channels):
            feature = Conv(ch, 3, stride=2, name=f"encoders_{i}_conv_in")(feature)
            feature = nn.silu(feature)
            if self.use_zeroconv:
                outs.append(Conv(ch, 1, zero_init=True,
                                 name=f"zeroconvs_{i}")(feature))
            else:
                outs.append(feature)
        return outs


def _batched_warp(cond: jnp.ndarray, flows: jnp.ndarray, backend: str):
    """cond [N, h, w, c], flows [N, T-1, h, w, 2] -> warped [N, T-1, h, w, c]."""
    n, tm1 = flows.shape[0], flows.shape[1]
    h, w, c = cond.shape[1:]
    cond_rep = jnp.broadcast_to(cond[:, None], (n, tm1, h, w, c)).reshape(n * tm1, h, w, c)
    flow_flat = flows.reshape(n * tm1, h, w, 2)
    warped = softsplat(cond_rep, flow_flat, None, "avg", backend=backend)
    return warped.reshape(n, tm1, h, w, c)


class FlowControlNet(nn.Module):
    """Trajectory MOFA-Adapter."""

    cfg: SVDUNetConfig = SVDUNetConfig()
    conditioning_embedding_out_channels: tuple = (16, 32, 96, 256)
    splat_backend: str = "xla"
    remat_blocks: bool = False

    def setup(self):
        self.controlnet_cond_embedding = ControlNetConditioningEmbeddingSVD(
            self.cfg.block_out_channels[0], self.conditioning_embedding_out_channels)
        self.flow_encoder = FirstFrameEncoder(
            (self.cfg.block_out_channels[0],) + tuple(self.cfg.block_out_channels[1:3]))
        self.trunk = ControlNetTrunk(self.cfg,
                                     remat_blocks=self.remat_blocks)

    def encode_features(self, controlnet_cond, controlnet_flow):
        """Step-independent warped feature stack.

        controlnet_cond: [N, H, W, 3] first frame (pixel res);
        controlnet_flow: [N, T-1, H, W, 2] dense flow (pixel res).
        Returns list of 4 tensors [N*T, h_s, w_s, c_s] at /8../64.
        """
        cond = self.controlnet_cond_embedding(controlnet_cond)      # [N, H/8, W/8, 320]
        cond_features = [cond] + list(self.flow_encoder(cond))
        fh = controlnet_flow.shape[2]

        inject = []
        for feat in cond_features:
            scale = fh // feat.shape[1]
            n, tm1 = controlnet_flow.shape[0], controlnet_flow.shape[1]
            # nearest-downsample flow to feature res, values / scale
            f = resize_nhwc(controlnet_flow, feat.shape[1:3], method="nearest") / scale
            warped = _batched_warp(feat, f, self.splat_backend)     # [N, T-1, h, w, c]
            full = jnp.concatenate([feat[:, None], warped], axis=1)  # [N, T, h, w, c]
            inject.append(full.reshape((n * (tm1 + 1),) + full.shape[2:]))
        return inject

    def __call__(self, sample, timestep, encoder_hidden_states, added_time_ids,
                 controlnet_cond=None, controlnet_flow=None,
                 conditioning_scale: float = 1.0,
                 precomputed_features: Optional[list] = None):
        """Returns (down_block_res_samples, mid_block_res_sample)."""
        inject = precomputed_features
        if inject is None:
            inject = self.encode_features(controlnet_cond, controlnet_flow)
        return self.trunk(sample, timestep, encoder_hidden_states, added_time_ids,
                          inject_features=inject,
                          conditioning_scale=conditioning_scale)


class LdmkFlowControlNet(nn.Module):
    """Landmark/face MOFA-Adapter (dual conditioning + occlusion matting)."""

    cfg: SVDUNetConfig = SVDUNetConfig()
    conditioning_embedding_out_channels: tuple = (16, 32, 96, 256)
    splat_backend: str = "xla"
    remat_blocks: bool = False

    def setup(self):
        c0 = self.cfg.block_out_channels[0]
        self.controlnet_cond_embedding = ControlNetConditioningEmbeddingSVD(
            c0, self.conditioning_embedding_out_channels)
        self.controlnet_ldmk_embedding = ControlNetConditioningEmbeddingSVD(
            c0, (16, 32, 64, 128))
        # ldmk variant: raw encoder features, zeroconvs commented out in the
        # reference (ldmk_ctrlnet.py:145)
        self.flow_encoder = FirstFrameEncoder(
            (c0,) + tuple(self.cfg.block_out_channels[1:3]),
            use_zeroconv=False)
        chans = {8: c0, 16: c0, 32: self.cfg.block_out_channels[1],
                 64: self.cfg.block_out_channels[2]}
        self.occlusions = {str(s): ForegroundMatting(chans[s], name=f"occlusions_{s}")
                           for s in (8, 16, 32, 64)}
        self.zero_outs = {str(s): Conv(chans[s], 1, zero_init=True, name=f"zero_outs_{s}")
                          for s in (8, 16, 32, 64)}
        self.trunk = ControlNetTrunk(self.cfg,
                                     remat_blocks=self.remat_blocks)

    def encode_features(self, controlnet_cond, controlnet_flow, landmarks):
        """controlnet_cond [N, H, W, 3]; controlnet_flow [N, T-1, H, W, 2];
        landmarks [N, T, H, W, 3] rasterized landmark frames.

        Returns (inject list incl. landmark adds, occlusion_masks list).
        """
        cond = self.controlnet_cond_embedding(controlnet_cond)
        cond_features = [cond] + list(self.flow_encoder(cond))
        fh = controlnet_flow.shape[2]
        n, t = landmarks.shape[0], landmarks.shape[1]

        lm = landmarks.reshape((n * t,) + landmarks.shape[2:])
        lm = self.controlnet_ldmk_embedding(lm)                      # [N*T, H/8, W/8, 320]
        ldmk_by_size = {lm.shape[1]: lm}
        for s in (2, 4):
            scaled = resize_nhwc(lm, (lm.shape[1] // s, lm.shape[2] // s), method="nearest")
            ldmk_by_size[scaled.shape[1]] = scaled

        inject = []
        occ_masks = []
        for feat in cond_features:
            scale = fh // feat.shape[1]
            tm1 = controlnet_flow.shape[1]
            f = resize_nhwc(controlnet_flow, feat.shape[1:3], method="nearest") / scale
            warped = _batched_warp(feat, f, self.splat_backend)      # [N, T-1, h, w, c]
            # occlusion matting per warped frame, then zero conv (ldmk_ctrlnet.py:293-320)
            h, w, c = feat.shape[1:]
            ref_rep = jnp.broadcast_to(feat[:, None], warped.shape).reshape(n * tm1, h, w, c)
            occ = self.occlusions[str(scale)]
            matted, mask = occ(ref_rep, f.reshape(n * tm1, h, w, 2),
                               warped.reshape(n * tm1, h, w, c))
            matted = self.zero_outs[str(scale)](matted)
            matted = matted.reshape(n, tm1, h, w, c)
            occ_masks.append(mask.reshape(n, tm1, h, w, 1))
            full = jnp.concatenate([feat[:, None], matted], axis=1)
            feat_full = full.reshape((n * t,) + full.shape[2:])
            # landmark features join at the 320-channel scales (ldmk_ctrlnet.py:474,501-504)
            if c == self.cfg.block_out_channels[0] and feat_full.shape[1] in ldmk_by_size:
                feat_full = feat_full + ldmk_by_size[feat_full.shape[1]]
            inject.append(feat_full)
        return inject, occ_masks

    def __call__(self, sample, timestep, encoder_hidden_states, added_time_ids,
                 controlnet_cond=None, controlnet_flow=None, landmarks=None,
                 conditioning_scale: float = 1.0,
                 precomputed_features: Optional[list] = None):
        inject = precomputed_features
        if inject is None:
            inject, _ = self.encode_features(controlnet_cond, controlnet_flow, landmarks)
        return self.trunk(sample, timestep, encoder_hidden_states, added_time_ids,
                          inject_features=inject,
                          conditioning_scale=conditioning_scale)
