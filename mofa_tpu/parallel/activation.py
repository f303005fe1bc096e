"""Activation-sharding hook for frame-parallel inference.

MOFA inference is embarrassingly parallel over video frames except for the
temporal-attention/temporal-resnet mixing layers (SURVEY §2.7). The SVD
UNet runs spatial work on a flattened [B*T, H, W, C] axis, so frame
parallelism = sharding THAT axis: one `with_sharding_constraint` after
conv_in lets GSPMD propagate the layout through every conv/spatial-attn
layer and insert the (all-to-all) collective only where temporal layers
transpose (B*T, HW) -> (B*HW, T).

Models call `constrain_batch(x)`; it is a no-op unless a mesh context is
active (zero cost for the single-chip path).
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mofa_tpu.core.mesh import AXES

_CTX: contextvars.ContextVar = contextvars.ContextVar(
    "mofa_activation_sharding", default=None)


@contextlib.contextmanager
def frame_parallel(mesh: Mesh, axis: str = AXES.frames):
    """Within this context, constrain_batch shards activation axis 0 over
    `axis` (the flattened batch*frames axis of UNet activations)."""
    token = _CTX.set((mesh, axis))
    try:
        yield
    finally:
        _CTX.reset(token)


def constrain_batch(x: jax.Array) -> jax.Array:
    ctx = _CTX.get()
    if ctx is None:
        return x
    mesh, axis = ctx
    spec = [None] * x.ndim
    spec[0] = axis
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
