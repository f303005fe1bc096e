"""Pallas GroupNorm statistics kernel (TPU).

**Status: measured experiment, NOT wired into the models.** On-chip
microbench (tools/bench_gn.py, v5e): 1.53 ms at [14,72,128,320] vs
1.42 ms for the lane-friendly jnp path in models/layers.py (pure-copy
floor 1.22 ms) — after commit 94c3005 the jnp formulation already sits
at the bandwidth floor, and routing GroupNorm through pallas_call also
blocks XLA from fusing the normalize/affine into neighboring ops
(end-to-end bench regressed 0.406 -> 0.386 frames/s/chip when wired in).
Kept (with passing interpret-mode tests) as the baseline for any future
producer-fused-stats attempt (see kernels/conv_fused.py emit_sums).

GroupNorm is the most-instantiated norm in the SVD UNet/ControlNet stack
(reference: torch.nn.GroupNorm inside every diffusers ResnetBlock2D /
TemporalResnetBlock / attention proj-in, e.g.
/root/reference/MOFA-Video-Traj/models/controlnet_sdv.py via
diffusers.models.resnet).

The kernel computes per-(N, C) fp32 sum and sum-of-squares in ONE pass
over the activation: grid (N, S/bs), each step reads a [bs, C] bf16 block
and accumulates into a revisited [1, C] output block that stays in VMEM
across the S loop. The group combine (C -> G -> C broadcast) and the
normalize/affine apply are left to XLA on the tiny [N, C] stats so they
fuse into the surrounding elementwise/conv ops.

Numerics: exact fp32 sums with the same granularity as models/layers.py;
the apply is algebraically refactored from (x - mean) * inv * gamma + beta
to x * a + b with a = inv*gamma, b = beta - mean*a (~1e-6 relative
difference, far below bf16 resolution and the 1e-4 golden tolerances).

Backward: jax.custom_vjp recomputing through the plain-jnp formulation,
so training gradients match the unfused GroupNorm exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows per grid step. VMEM peak per step at C=1280:
# in 1024*1280*2 = 2.6 MB bf16 (x2 buffered) + ~5.2 MB fp32 temps x2
# + 2 * [1, C] acc — inside the 32 MB raised scope.
_MAX_BLOCK_ROWS = 1024
_MIN_ROWS = 1024  # below this the stats are cheap; keep the jnp path


def _pick_block_rows(s: int) -> int:
    """Largest divisor of s that is <= _MAX_BLOCK_ROWS."""
    if s <= _MAX_BLOCK_ROWS:
        return s
    k = -(-s // _MAX_BLOCK_ROWS)  # ceil
    while s % k:
        k += 1
    return s // k


def pallas_stats_applicable(shape) -> bool:
    if jax.default_backend() != "tpu":
        return False
    s = 1
    for d in shape[1:-1]:
        s *= d
    return s >= _MIN_ROWS and shape[-1] % 8 == 0


def _stats_kernel(x_ref, s1_ref, s2_ref):
    j = pl.program_id(1)
    xf = x_ref[0].astype(jnp.float32)            # [bs, C]
    p1 = jnp.sum(xf, axis=0, keepdims=True)      # [1, C]
    p2 = jnp.sum(xf * xf, axis=0, keepdims=True)

    @pl.when(j == 0)
    def _init():
        s1_ref[0] = p1
        s2_ref[0] = p2

    @pl.when(j > 0)
    def _acc():
        s1_ref[0] += p1
        s2_ref[0] += p2


@functools.partial(jax.jit, static_argnums=(1,))
def _channel_sums(x3, bs):
    """x3 [N, S, C] -> (s1, s2) each [N, C] fp32, one HBM pass."""
    n, s, c = x3.shape
    out_shape = [jax.ShapeDtypeStruct((n, 1, c), jnp.float32)] * 2
    s1, s2 = pl.pallas_call(
        _stats_kernel,
        grid=(n, s // bs),
        in_specs=[pl.BlockSpec((1, bs, c), lambda i, j: (i, j, 0))],
        out_specs=[pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0))] * 2,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x3)
    return s1[:, 0], s2[:, 0]


@jax.custom_vjp
def channel_sums(x3):
    """x3 [N, S, C] -> (s1, s2) [N, C] fp32 in one Pallas HBM pass.
    VJP: d/dx (sum, sum_sq) = (g1, 2*x*g2) broadcast over S."""
    return _channel_sums(x3, _pick_block_rows(x3.shape[1]))


def _cs_fwd(x3):
    return channel_sums(x3), x3


def _cs_bwd(x3, g):
    g1, g2 = g
    dx = g1[:, None, :] + 2.0 * x3.astype(jnp.float32) * g2[:, None, :]
    return (dx.astype(x3.dtype),)


channel_sums.defvjp(_cs_fwd, _cs_bwd)


def stats_from_sums(s1, s2, spatial_count: int, num_groups: int, eps: float):
    """(s1, s2) [N, C] per-channel sums -> (mean_c, inv_c) [N, C] fp32
    with group-combined statistics (same math as torch GroupNorm)."""
    n0, c = s1.shape
    g = num_groups
    cnt = spatial_count * (c // g)
    gs1 = s1.reshape(n0, g, c // g).sum(-1)
    gs2 = s2.reshape(n0, g, c // g).sum(-1)
    mean = gs1 / cnt
    var = jnp.maximum(gs2 / cnt - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, c // g, axis=-1)
    inv_c = jnp.repeat(inv, c // g, axis=-1)
    return mean_c, inv_c


def _gn_ref(x, scale, bias, num_groups, eps):
    """Plain-jnp GroupNorm, identical math to models/layers.py GroupNorm."""
    c = x.shape[-1]
    g = num_groups
    dt = x.dtype
    xf = x.astype(jnp.float32)
    axes = tuple(range(1, xf.ndim - 1))
    s1 = jnp.sum(xf, axis=axes)
    s2 = jnp.sum(jnp.square(xf), axis=axes)
    n = (xf.size // xf.shape[0] // c) * (c // g)
    gs1 = s1.reshape(-1, g, c // g).sum(-1)
    gs2 = s2.reshape(-1, g, c // g).sum(-1)
    mean = gs1 / n
    var = jnp.maximum(gs2 / n - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    bshape = (xf.shape[0],) + (1,) * (xf.ndim - 2) + (c,)
    mean_c = jnp.repeat(mean, c // g, axis=-1).reshape(bshape)
    inv_c = jnp.repeat(inv, c // g, axis=-1).reshape(bshape)
    return ((xf - mean_c) * (inv_c * scale.astype(jnp.float32))
            + bias.astype(jnp.float32)).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_group_norm(x, scale, bias, num_groups: int = 32, eps: float = 1e-5):
    """GroupNorm with Pallas one-pass statistics. x [N, ..., C];
    scale/bias [C]. Stats over all middle axes + within-group channels."""
    c = x.shape[-1]
    n0 = x.shape[0]
    x3 = x.reshape(n0, -1, c)
    s = x3.shape[1]
    s1, s2 = _channel_sums(x3, _pick_block_rows(s))       # [N, C] fp32
    mean_c, inv_c = stats_from_sums(s1, s2, s, num_groups, eps)
    a = inv_c * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - mean_c * a
    bshape = (n0,) + (1,) * (x.ndim - 2) + (c,)
    y = x.astype(jnp.float32) * a.reshape(bshape) + b.reshape(bshape)
    return y.astype(x.dtype)


def _fwd(x, scale, bias, num_groups, eps):
    return fused_group_norm(x, scale, bias, num_groups, eps), (x, scale, bias)


def _bwd(num_groups, eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda *a: _gn_ref(*a, num_groups, eps), x, scale, bias)
    return vjp(g)


fused_group_norm.defvjp(_fwd, _bwd)
