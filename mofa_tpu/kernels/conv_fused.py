"""Fused GroupNorm-apply + SiLU + 3x3 conv Pallas kernel (TPU).

**Status: measured experiment, NOT wired into the models.** On-chip
microbench (tools/bench_conv.py, v5e, [14,72,128,320]->320 bf16):
XLA conv 2.92 ms (81 TF/s), XLA apply+silu+conv chain 2.96 ms (XLA fuses
the pre-activation into the conv for free), this kernel 4.75 ms
(50 TF/s) — the 9-shifted-matmul im2col formulation loses ~40% MXU
efficiency to XLA's native conv emitter (sublane-misaligned dx shifts +
K=320->384 pad), which swamps the ~1.5 ms/site saved on stats/apply
passes. Kept (with passing interpret-mode tests) as the documented
baseline for any future custom-conv attempt.

The target chain is the SVD UNet/ControlNet resnet hot path:
norm -> silu -> conv3x3 (diffusers ResnetBlock2D, instantiated by
/root/reference/MOFA-Video-Traj/models/controlnet_sdv.py via
diffusers.models.resnet: norm1/conv1, norm2/conv2). Run as separate XLA
ops each site costs: GN stats read + affine/SiLU read+write + conv
read+write (+ a temb broadcast-add pass and a residual-add pass). This
kernel collapses the chain to ONE read of x and ONE write of the output:

  out = conv3x3(silu(x * a + b)) [+ temb_bias] [+ residual]

with the GroupNorm affine pre-folded into per-(N, C) vectors
a = inv_sigma * gamma, b = beta - mean * a (stats come from
kernels/group_norm.py's one-pass Pallas reduction). Optionally the kernel
also emits per-(N, O) channel sums and sums-of-squares of its OUTPUT, so
the *next* GroupNorm's statistics pass is free (its stats read
disappears; norm2 stats ride conv1's write).

Shape/layout: x [N, H, W, C] channel-last, w [3, 3, C, O] (HWIO), bf16
compute with fp32 accumulation on the MXU. Grid (N, H/bh): the whole
[H, W, C] slice of one n rides VMEM (cached across row strips); each
step builds a zero-padded silu(x*a+b) strip with 1-pixel halo and runs
the conv as 9 shifted [bh*W, C] @ [C, O] matmuls. Gated to C, O <= 640
(weights must fit VMEM) and H % bh == 0; scale-/4 and /8 tensors are
small enough that XLA's native conv is fine there.

Backward: jax.custom_vjp recomputing through the plain-jnp chain, so
training gradients match the unfused formulation exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_FUSED_CHANNELS = 640
_STRIP = 18  # row strip; must divide H (UNet H in {72, 36} at bench shapes)


def fused_conv_applicable(x_shape, o_channels: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    n, h, w, c = x_shape
    if c > MAX_FUSED_CHANNELS or o_channels > MAX_FUSED_CHANNELS:
        return False
    if h % _pick_strip(h) or h < 8 or w < 8:
        return False
    bh = _pick_strip(h)
    # VMEM (vs the 100 MB raised limit; v5e has 128 MiB physical):
    # x slice double-buffered + activated strip + fp32 acc/temps +
    # out blocks + weights
    vmem = (2 * h * w * c * 2 + (bh + 2) * (w + 2) * c * 2 * 3
            + bh * w * o_channels * (4 + 2 * 2) + 2 * 9 * c * o_channels * 2)
    return vmem < 80 * 1024 * 1024


def _pick_strip(h: int) -> int:
    for bh in (_STRIP, 16, 12, 9, 8, 6, 4):
        if h % bh == 0:
            return bh
    return h


def _kernel(x_ref, a_ref, b_ref, w_ref, bias_ref, tb_ref, res_ref,
            o_ref, s1_ref, s2_ref, strip_ref, *, bh: int, silu: bool,
            has_temb: bool, has_res: bool, emit_sums: bool):
    j = pl.program_id(1)
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    o = o_ref.shape[3]
    nstrips = h // bh

    a = a_ref[0, 0].astype(jnp.float32)                  # [1, 1, C] -> [C]
    b = b_ref[0, 0].astype(jnp.float32)

    def apply_act(rows):
        y = rows.astype(jnp.float32) * a + b
        if silu:
            y = y * jax.nn.sigmoid(y)
        return y.astype(o_ref.dtype)

    # padded activated strip [bh+2, W+2, C]: rows j*bh-1 .. j*bh+bh,
    # zeros outside (conv zero-padding applies to the *activated*
    # tensor). The whole [H, W, C] slice of this n rides VMEM and is
    # fetched once per n (index_map constant in j); vmem_limit_bytes is
    # raised accordingly — v5e VMEM is 128 MiB, the 16 MB scope is just
    # the compiler default.
    strip_ref[...] = jnp.zeros((bh + 2, w + 2, c), strip_ref.dtype)
    if nstrips == 1:
        strip_ref[1:h + 1, 1:w + 1, :] = apply_act(x_ref[0, :, :, :])
    else:
        @pl.when(j == 0)
        def _top():
            strip_ref[1:bh + 2, 1:w + 1, :] = apply_act(
                x_ref[0, pl.ds(0, bh + 1), :, :])

        @pl.when((j > 0) & (j < nstrips - 1))
        def _interior():
            strip_ref[0:bh + 2, 1:w + 1, :] = apply_act(
                x_ref[0, pl.ds(j * bh - 1, bh + 2), :, :])

        @pl.when(j == nstrips - 1)
        def _bottom():
            strip_ref[0:bh + 1, 1:w + 1, :] = apply_act(
                x_ref[0, pl.ds(h - bh - 1, bh + 1), :, :])

    acc = jnp.zeros((bh * w, o), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            src = strip_ref[dy:dy + bh, dx:dx + w, :].reshape(bh * w, c)
            acc = acc + jax.lax.dot_general(
                src, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    acc = acc + bias_ref[0, 0].astype(jnp.float32)
    if has_temb:
        acc = acc + tb_ref[0, 0].astype(jnp.float32)
    if has_res:
        acc = acc + res_ref[0].reshape(bh * w, o).astype(jnp.float32)

    o_ref[0] = acc.astype(o_ref.dtype).reshape(bh, w, o)

    if emit_sums:
        p1 = jnp.sum(acc, axis=0, keepdims=True)         # [1, O]
        p2 = jnp.sum(acc * acc, axis=0, keepdims=True)

        @pl.when(j == 0)
        def _init():
            s1_ref[0] = p1
            s2_ref[0] = p2

        @pl.when(j > 0)
        def _acc():
            s1_ref[0] += p1
            s2_ref[0] += p2


@functools.partial(jax.jit, static_argnames=("silu", "emit_sums"))
def _fused_conv_fwd(x, a, b, w, bias, temb_bias, residual, silu, emit_sums):
    n, h, ww, c = x.shape
    o = w.shape[-1]
    bh = _pick_strip(h)
    has_temb = temb_bias is not None
    has_res = residual is not None
    dt = x.dtype

    dummy = jnp.zeros((1, 1, 1), dt)
    tb = (temb_bias.astype(dt).reshape(n, 1, o) if has_temb else dummy)
    res = residual if has_res else jnp.zeros((1, 1, 1, 1), dt)

    kernel = functools.partial(_kernel, bh=bh, silu=silu,
                               has_temb=has_temb, has_res=has_res,
                               emit_sums=emit_sums)
    grid = (n, h // bh)
    in_specs = [
        pl.BlockSpec((1, h, ww, c), lambda i, j: (i, 0, 0, 0)),
        pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((3, 3, c, o), lambda i, j: (0, 0, 0, 0)),
        pl.BlockSpec((1, 1, o), lambda i, j: (0, 0, 0)),
        (pl.BlockSpec((1, 1, o), lambda i, j: (i, 0, 0)) if has_temb
         else pl.BlockSpec((1, 1, 1), lambda i, j: (0, 0, 0))),
        (pl.BlockSpec((1, bh, ww, o), lambda i, j: (i, j, 0, 0)) if has_res
         else pl.BlockSpec((1, 1, 1, 1), lambda i, j: (0, 0, 0, 0))),
    ]
    out_specs = [
        pl.BlockSpec((1, bh, ww, o), lambda i, j: (i, j, 0, 0)),
        pl.BlockSpec((1, 1, o), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, 1, o), lambda i, j: (i, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n, h, ww, o), dt),
        jax.ShapeDtypeStruct((n, 1, o), jnp.float32),
        jax.ShapeDtypeStruct((n, 1, o), jnp.float32),
    ]
    out, s1, s2 = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bh + 2, ww + 2, c), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x, a.astype(jnp.float32).reshape(n, 1, c),
      b.astype(jnp.float32).reshape(n, 1, c), w.astype(dt),
      bias.astype(dt).reshape(1, 1, -1), tb, res)
    if emit_sums:
        return out, s1[:, 0], s2[:, 0]
    return out, None, None


def _ref_chain(x, a, b, w, bias, temb_bias, residual, silu):
    """Plain-jnp reference of the fused chain (f32 pre-act like layers)."""
    y = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    if silu:
        y = y * jax.nn.sigmoid(y)
    y = y.astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        y, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    out = out + bias.astype(jnp.float32)
    if temb_bias is not None:
        out = out + temb_bias.astype(jnp.float32)[:, None, None, :]
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def gn_silu_conv3x3(x, a, b, w, bias, temb_bias=None, residual=None,
                    silu: bool = True, emit_sums: bool = False):
    """out = conv3x3(silu(x*a + b)) + bias [+ temb_bias] [+ residual].

    x [N, H, W, C]; a/b [N, C] fp32 (folded GroupNorm affine); w [3,3,C,O];
    bias [O]; temb_bias [N, O] or None; residual [N, H, W, O] or None.
    With emit_sums=True also returns (s1, s2) [N, O] fp32 channel sums of
    the output (for the next norm's statistics). Returns out or
    (out, s1, s2)."""
    out, s1, s2 = _fused_conv_fwd(x, a, b, w, bias, temb_bias, residual,
                                  silu, emit_sums)
    if emit_sums:
        return out, s1, s2
    return out


_TEMPORAL_DUMMY = object()


def fused_tconv_applicable(x_shape, o_channels: int) -> bool:
    """x [B, T, S, C] for the (3,1,1) temporal conv formulation."""
    if jax.default_backend() != "tpu":
        return False
    bsz, t, s, c = x_shape
    if c > MAX_FUSED_CHANNELS or o_channels > MAX_FUSED_CHANNELS:
        return False
    bs = _pick_tblock(s, t)
    if bs is None:
        return False
    vmem = (2 * t * bs * c * 2 + (t + 2) * bs * c * 2 * 3
            + t * bs * o_channels * (4 + 2 * 2) + 2 * 3 * c * o_channels * 2)
    return vmem < 80 * 1024 * 1024


def _pick_tblock(s: int, t: int):
    """Largest divisor bs of s with t*bs <= 3584 and bs >= 128."""
    limit = max(3584 // max(t, 1), 1)
    best = None
    bs = limit
    while bs >= 128:
        if s % bs == 0:
            best = bs
            break
        bs -= 1
    return best


def _tkernel(x_ref, a_ref, b_ref, w_ref, bias_ref, tb_ref, res_ref,
             o_ref, s1_ref, s2_ref, strip_ref, *, silu: bool,
             has_temb: bool, has_res: bool, emit_sums: bool):
    j = pl.program_id(1)
    t, bs, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    o = o_ref.shape[3]

    a = a_ref[0, 0].astype(jnp.float32)
    b = b_ref[0, 0].astype(jnp.float32)

    y = x_ref[0].astype(jnp.float32) * a + b             # [T, bs, C]
    if silu:
        y = y * jax.nn.sigmoid(y)
    strip_ref[...] = jnp.zeros((t + 2, bs, c), x_ref.dtype)
    strip_ref[1:t + 1, :, :] = y.astype(x_ref.dtype)

    acc = jnp.zeros((t * bs, o), jnp.float32)
    for dt_ in range(3):
        src = strip_ref[dt_:dt_ + t, :, :].reshape(t * bs, c)
        acc = acc + jax.lax.dot_general(
            src, w_ref[dt_], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = acc + bias_ref[0, 0].astype(jnp.float32)
    acc = acc.reshape(t, bs, o)
    if has_temb:
        acc = acc + tb_ref[0, :, 0, :].astype(jnp.float32)[:, None, :]
    if has_res:
        acc = acc + res_ref[0].astype(jnp.float32)

    o_ref[0] = acc.astype(o_ref.dtype)

    if emit_sums:
        p1 = jnp.sum(acc, axis=(0, 1), keepdims=True)[0]   # [1, O]
        p2 = jnp.sum(acc * acc, axis=(0, 1), keepdims=True)[0]

        @pl.when(j == 0)
        def _init():
            s1_ref[0] = p1
            s2_ref[0] = p2

        @pl.when(j > 0)
        def _acc():
            s1_ref[0] += p1
            s2_ref[0] += p2


@functools.partial(jax.jit, static_argnames=("silu", "emit_sums"))
def _fused_tconv_fwd(x, a, b, w, bias, temb_bias, residual, silu, emit_sums):
    n, t, s, c = x.shape
    o = w.shape[-1]
    bs = _pick_tblock(s, t)
    has_temb = temb_bias is not None
    has_res = residual is not None
    dt = x.dtype

    tb = (temb_bias.astype(dt).reshape(n, t, 1, o) if has_temb
          else jnp.zeros((1, 1, 1, 1), dt))
    res = residual if has_res else jnp.zeros((1, 1, 1, 1), dt)

    kernel = functools.partial(_tkernel, silu=silu, has_temb=has_temb,
                               has_res=has_res, emit_sums=emit_sums)
    grid = (n, s // bs)
    in_specs = [
        pl.BlockSpec((1, t, bs, c), lambda i, j: (i, 0, j, 0)),
        pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((3, c, o), lambda i, j: (0, 0, 0)),
        pl.BlockSpec((1, 1, o), lambda i, j: (0, 0, 0)),
        (pl.BlockSpec((1, t, 1, o), lambda i, j: (i, 0, 0, 0)) if has_temb
         else pl.BlockSpec((1, 1, 1, 1), lambda i, j: (0, 0, 0, 0))),
        (pl.BlockSpec((1, t, bs, o), lambda i, j: (i, 0, j, 0)) if has_res
         else pl.BlockSpec((1, 1, 1, 1), lambda i, j: (0, 0, 0, 0))),
    ]
    out_specs = [
        pl.BlockSpec((1, t, bs, o), lambda i, j: (i, 0, j, 0)),
        pl.BlockSpec((1, 1, o), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, 1, o), lambda i, j: (i, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n, t, s, o), dt),
        jax.ShapeDtypeStruct((n, 1, o), jnp.float32),
        jax.ShapeDtypeStruct((n, 1, o), jnp.float32),
    ]
    out, s1, s2 = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((t + 2, bs, c), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x, a.astype(jnp.float32).reshape(n, 1, c),
      b.astype(jnp.float32).reshape(n, 1, c), w.astype(dt),
      bias.astype(dt).reshape(1, 1, -1), tb, res)
    if emit_sums:
        return out, s1[:, 0], s2[:, 0]
    return out, None, None


def _tref_chain(x, a, b, w, bias, temb_bias, residual, silu):
    """Plain-jnp reference: affine+SiLU then (3,1,1) conv over T."""
    y = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    if silu:
        y = y * jax.nn.sigmoid(y)
    y = y.astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        y, w.astype(x.dtype)[:, None], (1, 1), [(1, 1), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    out = out + bias.astype(jnp.float32)
    if temb_bias is not None:
        out = out + temb_bias.astype(jnp.float32)[:, :, None, :]
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def gn_silu_tconv3(x, a, b, w, bias, temb_bias=None, residual=None,
                   silu: bool = True, emit_sums: bool = False):
    """Temporal variant: out = conv_(3 over T)(silu(x*a+b)) + bias
    [+ temb_bias] [+ residual]. x [B, T, S, C]; w [3, C, O];
    temb_bias [B, T, O] or None; residual [B, T, S, O] or None."""
    out, s1, s2 = _fused_tconv_fwd(x, a, b, w, bias, temb_bias, residual,
                                   silu, emit_sums)
    if emit_sums:
        return out, s1, s2
    return out


def _tvjp_fwd(x, a, b, w, bias, temb_bias, residual, silu, emit_sums):
    y = gn_silu_tconv3(x, a, b, w, bias, temb_bias, residual, silu,
                       emit_sums)
    return y, (x, a, b, w, bias, temb_bias, residual)


def _tvjp_bwd(silu, emit_sums, resids, g):
    x, a, b, w, bias, temb_bias, residual = resids

    def chain(x, a, b, w, bias, tb, res):
        out = _tref_chain(x, a, b, w, bias, tb, res, silu)
        if emit_sums:
            of = out.astype(jnp.float32)
            s1 = jnp.sum(of, axis=(1, 2))
            s2 = jnp.sum(of * of, axis=(1, 2))
            return out, s1, s2
        return out

    args = (x, a, b, w, bias, temb_bias, residual)
    diff_idx = [i for i, v in enumerate(args) if v is not None]
    _, vjp = jax.vjp(lambda *d: chain(*[
        d[diff_idx.index(i)] if i in diff_idx else None
        for i in range(7)]), *[args[i] for i in diff_idx])
    grads = vjp(g)
    full = [None] * 7
    for i, gi in zip(diff_idx, grads):
        full[i] = gi
    return tuple(full)


gn_silu_tconv3.defvjp(_tvjp_fwd, _tvjp_bwd)


def _vjp_fwd(x, a, b, w, bias, temb_bias, residual, silu, emit_sums):
    y = gn_silu_conv3x3(x, a, b, w, bias, temb_bias, residual, silu,
                        emit_sums)
    return y, (x, a, b, w, bias, temb_bias, residual)


def _vjp_bwd(silu, emit_sums, resids, g):
    x, a, b, w, bias, temb_bias, residual = resids

    def chain(x, a, b, w, bias, tb, res):
        out = _ref_chain(x, a, b, w, bias, tb, res, silu)
        if emit_sums:
            of = out.astype(jnp.float32)
            s1 = jnp.sum(of, axis=(1, 2))
            s2 = jnp.sum(of * of, axis=(1, 2))
            return out, s1, s2
        return out

    args = (x, a, b, w, bias, temb_bias, residual)
    diff_idx = [i for i, v in enumerate(args) if v is not None]
    _, vjp = jax.vjp(lambda *d: chain(*[
        d[diff_idx.index(i)] if i in diff_idx else None
        for i in range(7)]), *[args[i] for i in diff_idx])
    grads = vjp(g)
    full = [None] * 7
    for i, gi in zip(diff_idx, grads):
        full[i] = gi
    return tuple(full)


gn_silu_conv3x3.defvjp(_vjp_fwd, _vjp_bwd)
