"""Stage-2 control-flow synthesis: dense teacher flow -> sparse -> CMP.

Re-derivation of `sample_inputs` / `get_cmp_flow`
(/root/reference/Training/train_stage2.py:78-159), channel-last:
the clip's dense flow is masked by (grid, watershed) samples from its last
frame, rescaled to the 384^2 CMP canvas (component-scaled), completed by
CMP, and returned at the training resolution. The mask sampling is host
numpy (scipy); the CMP completion is one batched jit call.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mofa_tpu.models.cmp.model import cmp_preprocess
from mofa_tpu.ops.resize import resize_nhwc
from mofa_tpu.ops.flow import rescale_flow
from mofa_tpu.train.flow_sampler import clip_sample_mask


def scale_flow_to(flow: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear-free reference semantics: F.interpolate default (nearest)
    + per-component scale (train_stage2.py:133-137 uses interpolate with
    default mode then multiplies components)."""
    return rescale_flow(flow, height, width)


def stage2_control_flow(cmp, cmp_params, pixel_values01: np.ndarray,
                        flows: np.ndarray, train_size: tuple[int, int],
                        rng=None):
    """pixel_values01 [b,t,h,w,3] (0,1); flows [b,t-1,h,w,2] dense teacher
    flow at (h,w). Returns (controlnet_flow [b,t-1,H,W,2] jnp at train_size,
    mask [b,t-1,h,w,2] np)."""
    b, tm1 = flows.shape[:2]
    h, w = flows.shape[2:4]

    mask = clip_sample_mask(flows, rng=rng)                 # [b, t-1, h, w, 2]
    sparse = flows * mask

    px = jnp.asarray(pixel_values01[:, :tm1])
    sp = jnp.asarray(sparse)
    mk = jnp.asarray(mask)
    if (h, w) != (384, 384):
        px = resize_nhwc(px, (384, 384), method="nearest")
        sp = rescale_flow(sp, 384, 384)
        mk = resize_nhwc(mk, (384, 384), method="nearest")

    flat = lambda x: x.reshape((b * tm1,) + x.shape[2:])
    dense = cmp.apply(cmp_params, cmp_preprocess(flat(px)), flat(sp), flat(mk))
    dense = dense.reshape((b, tm1) + dense.shape[1:])
    dense = rescale_flow(dense, *train_size)
    return dense, mask


def make_stage2_batch(cmp, cmp_params, pixel_values01: np.ndarray,
                      flows: np.ndarray, rng=None) -> dict:
    """Assemble the EDM train-step batch dict for stage 2."""
    h, w = pixel_values01.shape[2:4]
    dense, _ = stage2_control_flow(cmp, cmp_params, pixel_values01, flows,
                                   (h, w), rng=rng)
    return {"pixel_values01": jnp.asarray(pixel_values01), "flows": dense}


def make_stage1_batch(gmflow, gmflow_params, pixel_values01,
                      inference_size=(384, 512)) -> dict:
    """Stage-1 batch: dense GMFlow teacher flow as the control signal
    (Training/train_stage1.py:113-143, batched over all frame pairs)."""
    from mofa_tpu.models.gmflow.model import get_optical_flows
    px = jnp.asarray(pixel_values01)
    flows = get_optical_flows(gmflow, gmflow_params, px,
                              inference_size=inference_size)
    return {"pixel_values01": px, "flows": flows}
