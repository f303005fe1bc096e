"""Flow-field transforms (device-side jnp).

Layout: flows are [..., H, W, 2] channel-last (TPU-native); channel 0 = dx
(columns), channel 1 = dy (rows). The reference keeps [..., 2, H, W]; weight
converters and app shims transpose at the boundary.
"""

from __future__ import annotations

import jax.numpy as jnp

from mofa_tpu.ops.resize import resize_nhwc


def flow_pyramid(flow: jnp.ndarray, scales=(8, 16, 32, 64)) -> dict[int, jnp.ndarray]:
    """Multi-scale flow pyramid for the MOFA adapter.

    Matches svdxt_featureflow_forward_controlnet_s2d_fixcmp_norefine.py:302-309:
    nearest-downsample by 1/scale (F.interpolate default mode) and divide flow
    values by scale.
    """
    h, w = flow.shape[-3], flow.shape[-2]
    out = {}
    for s in scales:
        f = resize_nhwc(flow, (h // s, w // s), method="nearest")
        out[s] = f / s
    return out


def rescale_flow(flow: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Nearest-resize a [..., h, w, 2] flow to (height,width), scaling values.

    Matches Drag.get_flow (run_gradio.py:261-277): nearest spatial resize,
    then dx *= width/w_in, dy *= height/h_in.
    """
    h, w = flow.shape[-3], flow.shape[-2]
    if (h, w) == (height, width):
        return flow
    f = resize_nhwc(flow, (height, width), method="nearest")
    scale = jnp.asarray([width / w, height / h], dtype=f.dtype)
    return f * scale


def merge_flows(flow_inmask: jnp.ndarray, flow_outmask: jnp.ndarray) -> jnp.ndarray:
    """Combine brush-in/brush-out flows (run_gradio.py:330-333).

    Where the in-mask flow has BOTH components nonzero, take it; else the
    out-mask flow.
    """
    nonzero = jnp.all(flow_inmask != 0, axis=-1, keepdims=True)
    return jnp.where(nonzero, flow_inmask, flow_outmask)
