"""Mixed-precision policy for TPU.

TPU MXU native dtype is bfloat16; normalization statistics, softmax, time
embeddings and the Euler integrator state are kept in float32. The reference
runs fp16 with fp32-cast custom ops (softsplat casts to fp32,
/root/reference/MOFA-Video-Traj/models/softsplat.py:279); we mirror that
split as (param, compute, accum) dtypes.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    accum_dtype: Any = jnp.float32

    def cast_to_compute(self, tree):
        import jax

        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)
