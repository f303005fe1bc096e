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


_SHARDED: contextvars.ContextVar = contextvars.ContextVar(
    "mofa_sharded_execution", default=False)


@contextlib.contextmanager
def frame_parallel(mesh: Mesh, axis: str = AXES.frames):
    """Within this context, constrain_batch shards activation axis 0 over
    `axis` (the flattened batch*frames axis of UNet activations)."""
    token = _CTX.set((mesh, axis))
    try:
        yield
    finally:
        _CTX.reset(token)


@contextlib.contextmanager
def sharded_execution():
    """Mark the enclosed trace as compiling for a >1-device mesh.

    Kernel dispatch consults `is_sharded_execution()` to route around
    Pallas kernels: a `pallas_call` is an opaque custom call to the SPMD
    partitioner, so on a sharded operand it forces a full all-gather,
    while the equivalent XLA ops partition cleanly. The single-chip hot
    path (no context) is unaffected. Entered by `frame_parallel` users
    implicitly via the activation ctx, and by the train step when its
    mesh has more than one device."""
    token = _SHARDED.set(True)
    try:
        yield
    finally:
        _SHARDED.reset(token)


def is_sharded_execution() -> bool:
    return _SHARDED.get() or _CTX.get() is not None


def constrain_batch(x: jax.Array) -> jax.Array:
    ctx = _CTX.get()
    if ctx is None:
        return x
    mesh, axis = ctx
    if x.shape[0] < mesh.shape[axis]:
        # dim 0 can't fill the axis (e.g. a 1x1-spatial mid block at tiny
        # configs): constraining would force replicate-and-pad churn;
        # leave the layout to GSPMD propagation instead
        return x
    spec = [None] * x.ndim
    spec[0] = axis
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
