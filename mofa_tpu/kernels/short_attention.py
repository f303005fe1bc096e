"""Pallas TPU attention for SHORT sequences (SVD temporal attention).

The SVD temporal self-attention is [B*HW, T, H, D] with T <= 25 — tiny
compute, giant batch. The XLA packed formulation
(kernels/attention.py::_packed_short_attention) folds nb batch elements
and H heads into one masked [rows, rows] attention, which is MXU-shaped
but materializes fp32 logits AND probs in HBM: at the 576x1024 bench
shape that is 2 x ~350 MB per site (f32[6144,105,105] round trips,
~2.1 ms) plus full-relayout reshapes ([18432,7,320] -> [6144,105,64],
~1.0 ms) — ~3.5 ms per site where the optimal is one q/k/v read + one
out write (~0.45 ms). Device trace: tools/trace_step.py --full_names.

This kernel keeps the [rows, rows] logits in VMEM: grid over blocks of
BN sequences, each kernel instance loads q/k/v [BN*L, H*D] (the NATURAL
layout coming out of the to_q/k/v projections — zero reshapes), loops
over heads with lane slices, computes the block-diagonal-masked softmax
attention in fp32 on-core, and writes only the output. HBM traffic is
exactly 3 reads + 1 write of the activation.

Reference semantics match (/root/reference/MOFA-Video-Traj/models/
controlnet_sdv.py via diffusers TemporalBasicTransformerBlock):
plain softmax(QK^T/sqrt(D))V per (batch row, head), fp32 softmax.

Backward (training) recomputes through the plain-jnp reference via
jax.custom_vjp, like kernels/geglu_ffn.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30
# rows per kernel instance: the kernel is VPU-bound (exp over the
# [rows, rows] block-diagonal tile, rows/L-fold redundant), so smaller
# blocks win until grid overhead bites. v5e sweep at the SVD temporal
# shapes (tools/bench_short_attn.py): 224 best at /8 (3.35 vs 4.21 ms
# packed-XLA), /16 (2.14 vs 2.80), /32 (1.30 vs 2.38), T25 (3.25 vs 3.94)
_TARGET_ROWS = 224
MAX_SHORT_SEQ = 32

_LOG2E = 1.4426950408889634
# exp2 clamp (base-2 logits): exact vs the max-subtracted softmax for
# natural logits <= 55 (trained attention sits within +-30); guards fp32
# exp2 overflow above. Same tradeoff as the flash kernel's fixed-max
# default (kernels/flash_attention.py).
_FIXED_MAX_CLAMP = 80.0


def short_attention_applicable(b: int, l_q: int, l_k: int, h: int,
                               d: int) -> bool:
    """True when this kernel handles the attention shape well."""
    if jax.default_backend() != "tpu":
        return False
    from mofa_tpu.parallel.activation import is_sharded_execution
    if is_sharded_execution():
        # pallas_call is opaque to the SPMD partitioner; the packed-XLA
        # path partitions cleanly over the sharded batch dim
        return False
    if l_q != l_k or l_q > MAX_SHORT_SEQ or d > 128:
        return False
    # need at least one full block of sequences to be worth a kernel
    return b * l_q >= _TARGET_ROWS


def _short_attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, h: int,
                       d: int, scale: float, fixed_max: bool):
    """One block: q/k/v/o refs [BN*L, H*D]; bias_ref [BN*L, BN*L] is the
    precomputed block-diagonal mask (grid-invariant input — loaded once,
    no per-step iota/int-div VPU work). Per head: lane-slice, masked
    softmax attention, all buffers VMEM-resident.

    fixed_max drops the row-max pass (clamped base-2 exp, like the flash
    kernel's default) and normalizes AFTER the PV matmul — the divide
    runs over [rows, D] instead of [rows, rows]. Unnormalized bf16 probs
    lose nothing (bf16 precision is scale-free, max 2^128 >> 2^80)."""
    bias = bias_ref[:]
    scale2 = scale * _LOG2E

    for hh in range(h):
        sl = pl.ds(hh * d, d)
        qh = q_ref[:, sl]
        kh = k_ref[:, sl]
        vh = v_ref[:, sl]
        if fixed_max:
            logits = scale2 * jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) + bias  # base-2 logits
            p = jnp.exp2(jnp.minimum(logits, _FIXED_MAX_CLAMP))
            # all-masked rows can't occur (a row always sees its own
            # sequence), but guard underflow like flash does
            s = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
            acc = jax.lax.dot_general(
                p.astype(qh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [rows, D]
            o_ref[:, sl] = (acc / s).astype(o_ref.dtype)
            continue
        logits = scale * jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + bias      # [rows, rows]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        probs = (p / s).astype(qh.dtype)
        o_ref[:, sl] = jax.lax.dot_general(
            probs, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("l", "h", "d", "block_rows",
                                    "fixed_max"))
def _short_attn_fwd(q2, k2, v2, l: int, h: int, d: int,
                    block_rows: int = 0, fixed_max: bool = False):
    """q2/k2/v2 [B*L, H*D] (B*L divisible by block rows after padding)."""
    rows_total, hd = q2.shape
    b = rows_total // l
    # block rows bn*l must be a multiple of the bf16 sublane tile (16);
    # the lane dim is fine at any size because the block spans it fully
    bn = max(1, (block_rows or _TARGET_ROWS) // l)
    while (bn * l) % 16:
        bn += 1
    pad_seqs = (-b) % bn
    if pad_seqs:
        q2, k2, v2 = (jnp.pad(x, ((0, pad_seqs * l), (0, 0)))
                      for x in (q2, k2, v2))
    grid = ((b + pad_seqs) // bn,)
    br = bn * l
    # block-diagonal mask, computed once on the host side of the jit
    r = jnp.arange(br) // l
    bias = jnp.where(r[:, None] == r[None, :], 0.0, NEG_INF
                     ).astype(jnp.float32)
    kernel = functools.partial(_short_attn_kernel, h=h, d=d,
                               scale=d ** -0.5, fixed_max=fixed_max)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((br, hd), lambda i: (i, 0))] * 3
        + [pl.BlockSpec((br, br), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((br, hd), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(((b + pad_seqs) * l, hd), q2.dtype),
        interpret=jax.default_backend() == "cpu",
    )(q2, k2, v2, bias)
    return out[:rows_total] if pad_seqs else out


def _tmajor_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, h: int, d: int,
                   scale: float, fixed_max: bool):
    """Frame-major variant: refs are [1, T, BN, H*D] blocks of the
    NATURAL [B, T, S, H*D] activation layout (no host-level transpose);
    rows r = t*BN + s attend iff same spatial slot (r % BN == r' % BN) —
    the strided analog of the block-diagonal mask. Same math as
    _short_attn_kernel otherwise."""
    bias = bias_ref[:]
    scale2 = scale * _LOG2E
    t, bn = q_ref.shape[1], q_ref.shape[2]
    rows = t * bn
    # ONE [T, BN, H*D] -> [rows, H*D] merge per operand per block (the
    # sublane-dim merge is a relayout in Mosaic — doing it per head cost
    # 3*H relayouts and made the /32 H=20 site 4x slower)
    q_all = q_ref[0].reshape(rows, h * d)
    k_all = k_ref[0].reshape(rows, h * d)
    v_all = v_ref[0].reshape(rows, h * d)

    for hh in range(h):
        sl = pl.ds(hh * d, d)          # ref write slice (output only)
        qh = q_all[:, hh * d:(hh + 1) * d]
        kh = k_all[:, hh * d:(hh + 1) * d]
        vh = v_all[:, hh * d:(hh + 1) * d]
        if fixed_max:
            logits = scale2 * jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) + bias
            p = jnp.exp2(jnp.minimum(logits, _FIXED_MAX_CLAMP))
            s = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
            acc = jax.lax.dot_general(
                p.astype(qh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, :, :, sl] = (acc / s).astype(o_ref.dtype).reshape(
                t, bn, d)          # inverse merge, once per head on [rows, d]
            continue
        logits = scale * jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + bias
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        probs = (p / s).astype(qh.dtype)
        o_ref[0, :, :, sl] = jax.lax.dot_general(
            probs, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype).reshape(
            t, bn, d)


def tmajor_block_shape(t: int, block_rows: int = 0) -> tuple[int, int]:
    """(bn, rows) for the tmajor kernel: BN spatial slots per block with
    t*bn ~ target rows, rounded up to a multiple of the bf16 sublane
    tile (16). Shared with the dispatch-side VMEM estimate
    (kernels/attention.py) so gate and kernel can't drift."""
    bn = max(1, (block_rows or _TARGET_ROWS) // t)
    while (t * bn) % 16:
        bn += 1
    return bn, t * bn


def tmajor_vmem_estimate(t: int, hd: int, itemsize: int) -> int:
    """Scoped-vmem bytes the tmajor kernel's block needs: q/k/v/out
    blocks PLUS the in-kernel [T,BN,HD]->[rows,HD] merged copies (~2x
    the operands) and the fp32 [rows, rows] bias/logits/probs/max
    intermediates. Calibrated against the measured fp32 T=25 HD=1280
    failure (20.3 MB actual vs 19 MB est > 16 MB limit) and the
    measured-fitting bf16 T=25 HD=1280 ldmk fullres compile (~10.8 MB
    est). The dispatch gate (kernels/attention.py) checks this against
    14 MB — a 2 MB margin below the 16 MB scoped-vmem limit; fp32
    inputs double the operand term, so new fp32 shapes sit closer to
    the line than the bf16 calibration points (tools/bench_short_attn.py
    --tmajor prints est-vs-actual for every shape it runs)."""
    _, rows = tmajor_block_shape(t)
    return 8 * rows * hd * itemsize + rows * rows * 4 * 4


@functools.partial(jax.jit,
                   static_argnames=("nf", "h", "d", "block_rows",
                                    "fixed_max"))
def _tmajor_fwd(q, k, v, nf: int, h: int, d: int, block_rows: int = 0,
                fixed_max: bool = False):
    """q/k/v [B, T, S, H*D] in the natural spatial-major layout."""
    b, t, s, hd = q.shape
    bn, _ = tmajor_block_shape(t, block_rows)
    pad_s = (-s) % bn
    if pad_s:
        q, k, v = (jnp.pad(x, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
                   for x in (q, k, v))
    sp = s + pad_s
    grid = (b, sp // bn)
    rows = t * bn
    # strided mask: row r = t*bn + s_local attends its own spatial slot
    r = jnp.arange(rows) % bn
    bias = jnp.where(r[:, None] == r[None, :], 0.0, NEG_INF
                     ).astype(jnp.float32)
    kernel = functools.partial(_tmajor_kernel, h=h, d=d, scale=d ** -0.5,
                               fixed_max=fixed_max)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, t, bn, hd), lambda i, j: (i, 0, j, 0))] * 3
        + [pl.BlockSpec((rows, rows), lambda i, j: (0, 0))],
        out_specs=pl.BlockSpec((1, t, bn, hd), lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, sp, hd), q.dtype),
        interpret=jax.default_backend() == "cpu",
    )(q, k, v, bias)
    return out[:, :, :s] if pad_s else out


def _tmajor_ref(q2, k2, v2, num_frames: int, heads: int):
    """Plain-jnp reference for the tmajor layout (transpose +
    per-(b, s, head) softmax attention + transpose back), fp32 softmax."""
    bt, s, hd = q2.shape
    b = bt // num_frames
    d = hd // heads

    def to_bshd(x):
        x = x.reshape(b, num_frames, s, heads, d)
        return x.transpose(0, 2, 3, 1, 4)            # [B, S, H, T, D]

    q, k, v = to_bshd(q2), to_bshd(k2), to_bshd(v2)
    logits = jnp.einsum("bshtd,bshud->bshtu", q, k,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(q2.dtype)
    out = jnp.einsum("bshtu,bshud->bshtd", probs, v)
    out = out.transpose(0, 3, 1, 2, 4)               # [B, T, S, H, D]
    return out.reshape(bt, s, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def short_attention_tmajor(q2, k2, v2, num_frames: int, heads: int,
                           block_rows: int = 0, fixed_max: bool = False):
    """Temporal self-attention WITHOUT the spatial<->temporal transpose.

    q2/k2/v2: [B*T, S, H*D] — the projections' natural output rows.
    Attention runs over the frame axis for each (batch, spatial token):
    the kernel reads [T, BN, H*D] blocks of the [B, T, S, H*D] view
    (leading-dim split, layout-free) and applies the strided same-slot
    mask, so the two host-level [B*T, S, C] <-> [B*S, T, C] transposes of
    the classic layout (2 copies x 23 temporal sites per denoise step)
    never materialize. Backward recomputes through the plain-jnp
    reference (training uses the classic layout anyway)."""
    bt, s, hd = q2.shape
    b = bt // num_frames
    d = hd // heads
    shape4 = (b, num_frames, s, hd)
    out = _tmajor_fwd(q2.reshape(shape4), k2.reshape(shape4),
                      v2.reshape(shape4), num_frames, heads, d, block_rows,
                      fixed_max)
    return out.reshape(bt, s, hd)


def _tmajor_fwd_rule(q2, k2, v2, num_frames, heads, block_rows, fixed_max):
    return (short_attention_tmajor(q2, k2, v2, num_frames, heads,
                                   block_rows, fixed_max), (q2, k2, v2))


def _tmajor_bwd_rule(num_frames, heads, block_rows, fixed_max, res, g):
    _, vjp = jax.vjp(
        lambda a, b_, c: _tmajor_ref(a, b_, c, num_frames, heads), *res)
    return vjp(g)


short_attention_tmajor.defvjp(_tmajor_fwd_rule, _tmajor_bwd_rule)


def _short_attn_ref(q, k, v):
    """Plain-jnp reference ([B, L, H, D]), fp32 softmax — identical math
    to attention.py's naive path."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def short_attention(q, k, v, block_rows: int = 0,
                    fixed_max: bool = False):
    """[B, L, H, D] q/k/v (L <= 32) -> [B, L, H, D]; fp32 softmax.

    The [B, L, H, D] -> [B*L, H*D] flatten is layout-free (row-major),
    so the kernel sees the projections' natural output layout.
    block_rows overrides the 224-row default block (swept on-chip in
    tools/bench_short_attn.py); fixed_max selects the clamped
    no-running-max softmax (exact for natural logits <= 55)."""
    b, l, h, d = q.shape
    out = _short_attn_fwd(q.reshape(b * l, h * d), k.reshape(b * l, h * d),
                          v.reshape(b * l, h * d), l, h, d, block_rows,
                          fixed_max)
    return out.reshape(b, l, h, d)


def _fwd_rule(q, k, v, block_rows, fixed_max):
    return short_attention(q, k, v, block_rows, fixed_max), (q, k, v)


def _bwd_rule(block_rows, fixed_max, res, g):
    _, vjp = jax.vjp(_short_attn_ref, *res)
    return vjp(g)


short_attention.defvjp(_fwd_rule, _bwd_rule)
