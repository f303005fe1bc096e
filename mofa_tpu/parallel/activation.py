"""Activation-sharding hook for sharded (multi-chip) inference.

MOFA inference splits into per-frame spatial work and per-token temporal
work (SURVEY §2.7). Two layout policies map that onto the mesh axis:

- "tokens" (deployment default since r05): shard the spatial TOKEN dim
  (H rows / HW). The flagship shapes divide evenly at every UNet scale
  (HW = 9216/2304/576/144 at 576x1024, all % 8 == 0) while the frame dim
  does NOT (B*T = 50 over 8 chips), and GSPMD REPLICATES any reshard of
  an indivisible dim — measured 660 MB+ all-gathers per temporal site at
  the deploy shape (PROJECTION_v5e8.json, r05). Token-sharded, the
  temporal resnets/attention are device-local (zero collectives), convs
  pay halo collective-permutes, and only spatial attention gathers K/V:
  full-shape sharded-HLO accounting dropped 59 -> 19.9 GB/step and the
  projected v5e-8 e2e to 11.8 s (< the 20 s target).
- "frames": the legacy frame-major layout (dim 0 = B*T), still used by
  training, whose batch dim shards evenly over the data axis.

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
def frame_parallel(mesh: Mesh, axis: str = AXES.frames,
                   policy: str = "tokens"):
    """Activation-sharding context for sharded inference.

    policy="tokens" (deployment default): shard the spatial TOKEN dim —
    dim 1 of both the [B*T, H, W, C] conv layout (H) and the
    [B*T, HW, C] attention layout (HW, H-major, so the two are the same
    bytes). Chosen because the flagship shapes divide evenly at every
    UNet scale (H = 72/36/18/9 rows x 128-lane W at 576x1024; HW = 9216/
    2304/576/144 all % 8 == 0) while the frame count does NOT (B*T = 50
    over 8), and a reshard of an indivisible dim makes GSPMD replicate —
    measured 660 MB+ all-gathers per temporal site (PROJECTION_v5e8).
    Under tokens policy the temporal resnets/attention are token-local
    (ZERO collectives: every frame of a token shard is on-device); convs
    pay tiny halo exchanges; only spatial attention gathers K/V.

    policy="frames": the legacy frame-major layout (dim 0 = B*T). Still
    what training uses (batch rides the data axis there, so dim-0 shards
    stay even)."""
    assert policy in ("tokens", "frames"), policy
    token = _CTX.set((mesh, axis, policy))
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
    """Constrain a UNet activation ([B*T, H, W, C] or [B*T, S, C]) to the
    active policy's layout: token dim (1) under "tokens", batch*frames
    dim (0) under "frames". No-op without a ctx."""
    ctx = _CTX.get()
    if ctx is None:
        return x
    return constrain_dim(x, 1 if ctx[2] == "tokens" and x.ndim >= 3 else 0)


def sharding_policy():
    """"tokens" | "frames" inside a frame_parallel ctx; "frames" under a
    bare sharded_execution ctx (training); None single-chip."""
    ctx = _CTX.get()
    if ctx is not None:
        return ctx[2]
    return "frames" if _SHARDED.get() else None


def constrain_dim(x: jax.Array, dim: int) -> jax.Array:
    """Put the frame-parallel mesh axis on dimension `dim` (no-op outside
    a frame_parallel ctx, or when the dim can't fill the axis).

    The load-bearing use is RESHARD-BEFORE-RESHAPE: a reshape that SPLITS
    a sharded dimension (e.g. [B*T, ...] -> [B, T, ...]) is inexpressible
    to the SPMD partitioner, which then replicates — measured as 660 MB
    all-gathers per temporal-res-block site at the 576x1024/T=25 deploy
    shape (tools/project_v5e8.py). Constraining the frames axis onto the
    TOKEN dim on the *unsplit* shape first turns the transition into one
    all-to-all (bytes/device = size/n), after which the split reshape
    propagates cleanly — the same Ulysses pattern the temporal
    transformer path already rides (transformer_blocks.py:73-78)."""
    ctx = _CTX.get()
    if ctx is None:
        return x
    mesh, axis, _policy = ctx
    if x.shape[dim] < mesh.shape[axis]:
        # dim can't fill the axis (e.g. a 1x1-spatial mid block at tiny
        # configs): constraining would force replicate-and-pad churn;
        # leave the layout to GSPMD propagation instead
        return x
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def frame_ctx_active() -> bool:
    """True inside a frame_parallel ctx (models branch to the
    token-sharded temporal layouts only then — the single-chip layouts
    stay byte-identical)."""
    return _CTX.get() is not None
