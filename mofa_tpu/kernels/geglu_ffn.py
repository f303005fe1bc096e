"""Fused GEGLU feed-forward Pallas kernel (proj -> geglu -> proj).

The SVD transformer blocks' FeedForward (layers.py; diffusers GEGLU,
/root/reference/MOFA-Video-Traj/models/controlnet_sdv.py via diffusers
attention.py FeedForward) expands C -> 8C -> gelu-gate -> 4C -> C. Run
unfused, XLA materializes the [tokens, 8C] projection and [tokens, 4C]
gate product in HBM — ~2 GB of traffic per FF call at the 320-channel
bench shape ([129024, 320] tokens), ~4.3 ms measured. This kernel keeps
both weight matrices and the whole intermediate in VMEM: HBM traffic is
exactly read-x + write-out (~160 MB), one grid pass over token blocks.

Numerics: bf16 matmuls with fp32 accumulation (preferred_element_type),
gelu (erf form, approximate=False like diffusers GEGLU) in fp32, output
cast to the input dtype. Backward (training) recomputes through the
plain-jnp reference via jax.custom_vjp, so gradients match the unfused
formulation exactly.

Gate (see fused_ffn_applicable): C <= 640 so both weights fit VMEM, and
a token count that divides the block (bench/training shapes all do).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# token-block rows per grid step: VMEM peak at C=320 is ~7 MB
# (w0 1.6 + w2 0.8 + h fp32 2.6 + act 1.3 + x/out blocks)
_BLOCK_ROWS = {320: 512, 640: 256}
MAX_FUSED_DIM = 640
MIN_FUSED_ROWS = 4096


def fused_ffn_applicable(rows: int, dim: int, dim_out: int) -> bool:
    """True when the fused kernel handles this FF shape well."""
    if jax.default_backend() not in ("tpu",):
        return False
    from mofa_tpu.parallel.activation import is_sharded_execution
    if is_sharded_execution():
        # pallas_call is opaque to the SPMD partitioner (would all-gather
        # the sharded activation); the plain-jnp FF partitions cleanly
        return False
    if dim > MAX_FUSED_DIM or dim_out != dim or rows < MIN_FUSED_ROWS:
        return False
    return rows % _BLOCK_ROWS[dim] == 0


def _ffn_ref(x, w0, b0, w2, b2):
    """Plain-jnp reference (identical math to layers.FeedForward)."""
    h = (x @ w0.astype(x.dtype)) + b0.astype(x.dtype)
    a, g = jnp.split(h, 2, axis=-1)
    act = a * jax.nn.gelu(g, approximate=False)
    return (act @ w2.astype(x.dtype)) + b2.astype(x.dtype)


def _ffn_kernel(x_ref, w0_ref, b0_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[:]                                           # [BR, C] bf16
    h = jax.lax.dot_general(
        x, w0_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [BR, 2I] fp32
    h = h + b0_ref[:].astype(jnp.float32)
    inner = h.shape[-1] // 2
    a = h[:, :inner]
    g = h[:, inner:]
    # erf-form gelu; Mosaic lowers neither erf nor erfc, so erf is inlined
    # as Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7 — far below the
    # bf16 output resolution)
    xs = g * 0.7071067811865476
    ax = jnp.abs(xs)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = jnp.sign(xs) * (1.0 - poly * jnp.exp(-ax * ax))
    gelu = 0.5 * g * (1.0 + erf)
    act = (a * gelu).astype(x.dtype)
    out = jax.lax.dot_general(
        act, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [BR, C] fp32
    out = out + b2_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


@jax.jit
def _ffn_fwd(x2, w0, b0, w2, b2):
    """x2 [R, C] (R % block == 0), weights in x2.dtype. Returns [R, C]."""
    r, c = x2.shape
    two_i = w0.shape[1]
    br = _BLOCK_ROWS[c]
    out = pl.pallas_call(
        _ffn_kernel,
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0)),
            pl.BlockSpec((c, two_i), lambda i: (0, 0)),
            pl.BlockSpec((1, two_i), lambda i: (0, 0)),
            pl.BlockSpec((two_i // 2, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, c), x2.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x2, w0, b0.reshape(1, -1), w2, b2.reshape(1, -1))
    return out


@jax.custom_vjp
def geglu_ffn(x, w0, b0, w2, b2):
    """Fused GEGLU FF. x [..., C]; w0 [C, 2I], b0 [2I], w2 [I, C], b2 [C]
    (weights any float dtype — cast to x.dtype like layers.Dense)."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    dt = x.dtype
    out = _ffn_fwd(x2, w0.astype(dt), b0.astype(dt), w2.astype(dt),
                   b2.astype(dt))
    return out.reshape(shape)


def _fwd_rule(x, w0, b0, w2, b2):
    return geglu_ffn(x, w0, b0, w2, b2), (x, w0, b0, w2, b2)


def _bwd_rule(res, g):
    x, w0, b0, w2, b2 = res
    _, vjp = jax.vjp(_ffn_ref, x, w0, b0, w2, b2)
    return vjp(g)


geglu_ffn.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# LayerNorm -> GEGLU FF -> +residual, one kernel. This is the exact shape of
# all three FF sites in the SVD transformer blocks (norm3+ff spatial/temporal,
# norm_in+ff_in temporal) — fusing the LN and the residual add removes two
# extra full-activation HBM round trips per site.
# ---------------------------------------------------------------------------

LN_EPS = 1e-5
_LOG2E_FFN = 1.4426950408889634


def _ln_ffn_ref(x, ls, lb, w0, b0, w2, b2):
    """Plain-jnp reference: LayerNorm (fp32 stats, models/layers.py
    formulation) -> FeedForward -> residual."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    meansq = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    h = ((xf - mean) * jax.lax.rsqrt(var + LN_EPS) * ls + lb).astype(x.dtype)
    return _ffn_ref(h, w0, b0, w2, b2) + x


def _ln_ffn_kernel(x_ref, ls_ref, lb_ref, w0_ref, b0_ref, w2_ref, b2_ref,
                   o_ref, *, tanh_gelu: bool = False):
    x = x_ref[:]                                           # [BR, C] bf16
    xf = x.astype(jnp.float32)
    c = xf.shape[-1]
    mean = jnp.sum(xf, axis=-1, keepdims=True) / c
    meansq = jnp.sum(xf * xf, axis=-1, keepdims=True) / c
    var = jnp.maximum(meansq - mean * mean, 0.0)
    ln = (xf - mean) * jax.lax.rsqrt(var + LN_EPS)
    h_in = (ln * ls_ref[:].astype(jnp.float32)
            + lb_ref[:].astype(jnp.float32)).astype(x.dtype)
    h = jax.lax.dot_general(
        h_in, w0_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = h + b0_ref[:].astype(jnp.float32)
    inner = h.shape[-1] // 2
    a = h[:, :inner]
    g = h[:, inner:]
    if tanh_gelu:
        # tanh-approx gelu (variant="tanh"): PER-ELEMENT |err| vs
        # erf-gelu is ~3e-4, but the error correlates across the inner
        # axis and amplifies through the second GEMM — measured ~3.1e-2
        # on-chip after GEMM2 (tools/bench_ffn.py, 2026-08-20), far above
        # bf16 rounding. A measured numerics NEGATIVE. Cheaper
        # VPU tail: tanh(y) via one exp2 + one reciprocal (sign-free:
        # u = exp2(-2y/ln2 * log2e) form keeps the argument bounded for
        # y >= 0 after abs folding). OPT-IN, never default: exact erf
        # parity is the repo-wide contract.
        y = 0.7978845608028654 * (g + 0.044715 * g * g * g)
        u = jnp.exp2(-2.0 * _LOG2E_FFN * jnp.abs(y))
        th = jnp.sign(y) * (1.0 - u) / (1.0 + u)
        act = (a * (0.5 * g * (1.0 + th))).astype(x.dtype)
        out = jax.lax.dot_general(
            act, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out + b2_ref[:].astype(jnp.float32) + xf
        o_ref[:] = out.astype(o_ref.dtype)
        return
    xs = g * 0.7071067811865476
    ax = jnp.abs(xs)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = jnp.sign(xs) * (1.0 - poly * jnp.exp(-ax * ax))
    act = (a * (0.5 * g * (1.0 + erf))).astype(x.dtype)
    out = jax.lax.dot_general(
        act, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out + b2_ref[:].astype(jnp.float32) + xf
    o_ref[:] = out.astype(o_ref.dtype)


def _ln_ffn_kernel_pipe(x_ref, ls_ref, lb_ref, w0_ref, b0_ref, w2_ref,
                        b2_ref, o_ref, h_scr, x_scr, *, n_blocks: int):
    """Software-pipelined variant: grid step i runs stage A (LN + first
    GEMM) for block i and stage B (gelu-gate + second GEMM + residual)
    for block i-1 from VMEM scratch. A's MXU work and B's VPU gelu have
    no data dependence inside a step, so the scheduler can overlap them
    (the plain kernel serializes matmul1 -> gelu -> matmul2, leaving the
    MXU idle through ~1 ms of VPU transcendentals per block).

    Grid is n_blocks+1: i==0 runs only A, i==n_blocks only B. Scratch is
    double-buffered on grid parity; the out BlockSpec maps step i to
    block i-1 (clamped at 0 — that write is skipped)."""
    i = pl.program_id(0)
    par = i % 2

    @pl.when(i < n_blocks)
    def stage_a():
        x = x_ref[:]                                       # [BR, C] bf16
        xf = x.astype(jnp.float32)
        c = xf.shape[-1]
        mean = jnp.sum(xf, axis=-1, keepdims=True) / c
        meansq = jnp.sum(xf * xf, axis=-1, keepdims=True) / c
        var = jnp.maximum(meansq - mean * mean, 0.0)
        ln = (xf - mean) * jax.lax.rsqrt(var + LN_EPS)
        h_in = (ln * ls_ref[:].astype(jnp.float32)
                + lb_ref[:].astype(jnp.float32)).astype(x.dtype)
        h = jax.lax.dot_general(
            h_in, w0_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h_scr[par] = h + b0_ref[:].astype(jnp.float32)
        x_scr[par] = x

    @pl.when(i > 0)
    def stage_b():
        h = h_scr[1 - par]
        inner = h.shape[-1] // 2
        a = h[:, :inner]
        g = h[:, inner:]
        xs = g * 0.7071067811865476
        ax = jnp.abs(xs)
        t = 1.0 / (1.0 + 0.3275911 * ax)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (
            1.421413741 + t * (-1.453152027 + t * 1.061405429))))
        erf = jnp.sign(xs) * (1.0 - poly * jnp.exp(-ax * ax))
        act = (a * (0.5 * g * (1.0 + erf))).astype(o_ref.dtype)
        out = jax.lax.dot_general(
            act, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out + b2_ref[:].astype(jnp.float32) \
            + x_scr[1 - par].astype(jnp.float32)
        o_ref[:] = out.astype(o_ref.dtype)


def _gelu_gate(h, out_dtype):
    """bias-added GEMM1 output [rows, 2I] fp32 -> a*gelu(g) in out_dtype.
    erf inlined as Abramowitz-Stegun 7.1.26 (Mosaic lowers no erf)."""
    inner = h.shape[-1] // 2
    a = h[:, :inner]
    g = h[:, inner:]
    xs = g * 0.7071067811865476
    ax = jnp.abs(xs)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = jnp.sign(xs) * (1.0 - poly * jnp.exp(-ax * ax))
    return (a * (0.5 * g * (1.0 + erf))).astype(out_dtype)


def _ln_ffn_kernel_ilv(x_ref, ls_ref, lb_ref, w0_ref, b0_ref, w2_ref,
                       b2_ref, o_ref, *, n_split: int):
    """Split-half interleaved variant: identical math to _ln_ffn_kernel,
    but the block is processed as n_split independent row sub-blocks so
    the static scheduler can overlap sub-block k's VPU gelu with
    sub-block k+1's MXU GEMM1 (and k's GEMM2 with k+1's gelu). No extra
    scratch — the fp32 intermediate exists one sub-block at a time, so
    VMEM peak is LOWER than the plain kernel's."""
    x = x_ref[:]                                           # [BR, C] bf16
    xf = x.astype(jnp.float32)
    c = xf.shape[-1]
    mean = jnp.sum(xf, axis=-1, keepdims=True) / c
    meansq = jnp.sum(xf * xf, axis=-1, keepdims=True) / c
    var = jnp.maximum(meansq - mean * mean, 0.0)
    ln = (xf - mean) * jax.lax.rsqrt(var + LN_EPS)
    h_in = (ln * ls_ref[:].astype(jnp.float32)
            + lb_ref[:].astype(jnp.float32)).astype(x.dtype)
    br = x.shape[0]
    assert br % n_split == 0, (
        "ilv variant requires block rows divisible by n_split "
        f"(br={br}, n_split={n_split}); trailing rows would go unwritten")
    sr = br // n_split
    b0f = b0_ref[:].astype(jnp.float32)
    b2f = b2_ref[:].astype(jnp.float32)
    for k in range(n_split):
        hk = jax.lax.dot_general(
            h_in[k * sr:(k + 1) * sr], w0_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b0f
        act = _gelu_gate(hk, x.dtype)
        ok = jax.lax.dot_general(
            act, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ok = ok + b2f + xf[k * sr:(k + 1) * sr]
        o_ref[k * sr:(k + 1) * sr] = ok.astype(o_ref.dtype)


# Variant selection. "pipe" (double-buffered fp32 h-scratch) is a
# MEASURED NEGATIVE (tools/bench_ffn.py on v5e, 2026-08-20): exact
# (0.0 err) but SLOWER at the C=320 bench site (4.43-4.50 vs plain
# 4.08-4.11 ms / 129024 rows, matching STATUS.md) — the extra VMEM
# pressure costs more than the MXU/VPU overlap wins — and at C=640 its
# scratch (2x256x5120 fp32 = 10.5 MB) blows the 16 MB scoped-vmem limit
# outright. Kept as a documented experiment via variant="pipe".

# split-half interleave (variant="ilv"): sub-block count per token block.
# Exact math, LOWER VMEM than plain. MEASURED NEGATIVE on-chip
# (tools/bench_ffn.py on v5e, 2026-08-20): a wash at the C=320 spatial
# site (4.083 vs 4.081 ms / 129024 rows), SLOWER at C=640 (3.086 vs
# 2.784 ms) and at the temporal C=320 site (4.357 vs 4.109 ms) — Mosaic's
# static scheduler already overlaps the plain kernel's gelu tail with the
# next grid block's DMA/GEMM, so hand-splitting only shrinks the MXU
# tiles. Both alt variants stay available for A/Bs; plain is the default.
_ILV_SPLIT = 4
_VARIANT = "plain"


@functools.partial(jax.jit, static_argnames=("variant",))
def _ln_ffn_fwd(x2, ls, lb, w0, b0, w2, b2, variant: str = None):
    r, c = x2.shape
    two_i = w0.shape[1]
    br = _BLOCK_ROWS[c]
    n_blocks = r // br
    if variant is None:
        variant = _VARIANT
    pipelined = variant == "pipe"
    if variant == "ilv":
        kernel = functools.partial(_ln_ffn_kernel_ilv, n_split=_ILV_SPLIT)
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((br, c), lambda i: (i, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((c, two_i), lambda i: (0, 0)),
                pl.BlockSpec((1, two_i), lambda i: (0, 0)),
                pl.BlockSpec((two_i // 2, c), lambda i: (0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((br, c), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((r, c), x2.dtype),
            interpret=jax.default_backend() == "cpu",
        )(x2, ls.reshape(1, -1), lb.reshape(1, -1), w0, b0.reshape(1, -1),
          w2, b2.reshape(1, -1))
    if pipelined and jax.default_backend() == "tpu":
        kernel = functools.partial(_ln_ffn_kernel_pipe, n_blocks=n_blocks)
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks + 1,),
            in_specs=[
                # clamp: at the drain step (i == n_blocks) stage A is
                # skipped but the block DMA still prefetches — an
                # unclamped index reads one block past the array
                pl.BlockSpec((br, c),
                             lambda i: (jnp.minimum(i, n_blocks - 1), 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((c, two_i), lambda i: (0, 0)),
                pl.BlockSpec((1, two_i), lambda i: (0, 0)),
                pl.BlockSpec((two_i // 2, c), lambda i: (0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (br, c), lambda i: (jnp.maximum(i - 1, 0), 0)),
            out_shape=jax.ShapeDtypeStruct((r, c), x2.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, br, two_i), jnp.float32),
                pltpu.VMEM((2, br, c), x2.dtype),
            ],
            interpret=False,
        )(x2, ls.reshape(1, -1), lb.reshape(1, -1), w0, b0.reshape(1, -1),
          w2, b2.reshape(1, -1))
        return out
    out = pl.pallas_call(
        functools.partial(_ln_ffn_kernel, tanh_gelu=(variant == "tanh")),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, two_i), lambda i: (0, 0)),
            pl.BlockSpec((1, two_i), lambda i: (0, 0)),
            pl.BlockSpec((two_i // 2, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, c), x2.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x2, ls.reshape(1, -1), lb.reshape(1, -1), w0, b0.reshape(1, -1),
      w2, b2.reshape(1, -1))
    return out


@jax.custom_vjp
def ln_geglu_ffn(x, ls, lb, w0, b0, w2, b2):
    """Fused LayerNorm + GEGLU FF + residual. x [..., C]; ls/lb [C] fp32;
    weights as in geglu_ffn. Returns x + FF(LN(x))."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    dt = x.dtype
    out = _ln_ffn_fwd(x2, ls.astype(jnp.float32), lb.astype(jnp.float32),
                      w0.astype(dt), b0.astype(dt), w2.astype(dt),
                      b2.astype(dt))
    return out.reshape(shape)


def _ln_fwd_rule(x, ls, lb, w0, b0, w2, b2):
    return ln_geglu_ffn(x, ls, lb, w0, b0, w2, b2), (x, ls, lb, w0, b0, w2, b2)


def _ln_bwd_rule(res, g):
    _, vjp = jax.vjp(_ln_ffn_ref, *res)
    return vjp(g)


ln_geglu_ffn.defvjp(_ln_fwd_rule, _ln_bwd_rule)
