"""Occlusion/matting hourglass for the landmark MOFA-Adapter (Flax, NHWC).

Re-derivation of /root/reference/MOFA-Video-Hybrid/models/occlusion/hourglass.py:
3 conv+relu "down" blocks (no spatial change), U-style decoder with skip
concats, then 7x7 matting-mask (sigmoid) and matting-image heads;
output = warped * mask + matting * (1 - mask).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mofa_tpu.models.layers import Conv


class Hourglass(nn.Module):
    block_expansion: int = 64
    num_blocks: int = 3
    max_features: int = 512

    @nn.compact
    def __call__(self, x):
        be, mf, nb = self.block_expansion, self.max_features, self.num_blocks
        outs = []
        h = x
        for i in range(nb):
            h = Conv(min(mf, be * 2 ** (i + 1)), 3, name=f"encoder_down_blocks_{i}_conv")(h)
            h = nn.relu(h)
            outs.append(h)
        new_out = None
        for j, i in enumerate(reversed(range(nb))):
            out = outs.pop()
            if new_out is not None:
                out = jnp.concatenate([out, new_out], axis=-1)
            out = Conv(min(mf, be * 2 ** i), 3, name=f"decoder_up_blocks_{j}_conv")(out)
            new_out = nn.relu(out)
        return new_out  # [N, H, W, block_expansion]


class ForegroundMatting(nn.Module):
    """Per-scale occlusion head (ldmk_ctrlnet.py:247-254, hourglass.py:227-280)."""

    num_channels: int
    block_expansion: int = 64
    num_blocks: int = 3
    max_features: int = 512

    @nn.compact
    def __call__(self, reference_feat, dense_flow, warped_feat):
        """All [N, H, W, *]: feat C channels, flow 2 channels."""
        h = jnp.concatenate([reference_feat, dense_flow, warped_feat], axis=-1)
        h = Hourglass(self.block_expansion, self.num_blocks, self.max_features,
                      name="hourglass")(h)
        mask = nn.sigmoid(Conv(1, 7, name="matting_mask")(h).astype(jnp.float32)).astype(h.dtype)
        matting = Conv(self.num_channels, 7, name="matting")(h)
        out = warped_feat * mask + matting * (1.0 - mask)
        return out, mask
