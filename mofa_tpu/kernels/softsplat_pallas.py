"""Fused Pallas forward-splat kernel (the SURVEY §7 keystone).

Same math as kernels/softsplat.py's "matmul" backend — the splat
`out = W^T @ in` with W the [P_in, P_out] 4-tap bilinear weight matrix —
but the weight blocks never leave VMEM: for each (image, out-tile, in-tile)
grid cell the kernel builds the [TI, TO] one-hot-weighted block from the
tap indices on the VPU and contracts it against the input tile on the MXU,
accumulating into the output tile across the in-tile grid dimension.

Compared to the jnp "matmul" backend, this removes the HBM round-trip for
every weight block (P_in x tile fp32 per output tile) — the splat becomes
pure streaming matmul at bilinear-scatter semantics, deterministic by
construction (no atomics, unlike the reference CUDA kernel,
MOFA-Video-Traj/models/softsplat.py:284-345).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE_OUT = 256
TILE_IN = 512


def _splat_kernel(targets_ref, weights_ref, in_ref, out_ref, *,
                  tile_out: int, tile_in: int):
    """Grid (B, n_out, n_in).

    targets_ref [4, TI] int32 (flat output index, >= P if dropped);
    weights_ref [4, TI] f32; in_ref [TI, C]; out_ref [TO, C] (revisited
    across the innermost grid dim)."""
    o = pl.program_id(1)
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = o * tile_out
    pos = base + jax.lax.broadcasted_iota(jnp.int32, (tile_in, tile_out), 1)
    wblk = jnp.zeros((tile_in, tile_out), jnp.float32)
    for t in range(4):
        tgt = targets_ref[t, :]
        w = weights_ref[t, :]
        hit = (tgt[:, None] == pos).astype(jnp.float32)
        wblk = wblk + hit * w[:, None]

    acc = jax.lax.dot_general(
        wblk, in_ref[:].astype(jnp.float32),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out_ref[:] = out_ref[:] + acc


def splat_pallas(inp: jnp.ndarray, flow: jnp.ndarray,
                 tile_out: int = TILE_OUT, tile_in: int = TILE_IN) -> jnp.ndarray:
    """[B, H, W, C] x [B, H, W, 2] -> [B, H, W, C], fp32."""
    from mofa_tpu.kernels.softsplat import _tap_data

    B, H, W, C = inp.shape
    P = H * W
    n_out = pl.cdiv(P, tile_out)
    n_in = pl.cdiv(P, tile_in)
    p_out = n_out * tile_out
    p_in = n_in * tile_in

    flats, ws, valids = _tap_data(flow.astype(jnp.float32), H, W)  # [4, B, P]
    # dropped taps point past every padded out tile
    flats = jnp.where(valids, flats, p_out)
    targets = jnp.moveaxis(flats, 0, 1).astype(jnp.int32)          # [B, 4, P]
    weights = jnp.moveaxis(ws, 0, 1)

    pad_p = p_in - P
    if pad_p:
        targets = jnp.pad(targets, ((0, 0), (0, 0), (0, pad_p)),
                          constant_values=p_out)
        weights = jnp.pad(weights, ((0, 0), (0, 0), (0, pad_p)))
    src = inp.reshape(B, P, C).astype(jnp.float32)
    if pad_p:
        src = jnp.pad(src, ((0, 0), (0, pad_p), (0, 0)))

    kernel = functools.partial(_splat_kernel, tile_out=tile_out,
                               tile_in=tile_in)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_out, n_in),
        in_specs=[
            pl.BlockSpec((None, 4, tile_in), lambda b, o, i: (b, 0, i)),
            pl.BlockSpec((None, 4, tile_in), lambda b, o, i: (b, 0, i)),
            pl.BlockSpec((None, tile_in, C), lambda b, o, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((None, tile_out, C), lambda b, o, i: (b, o, 0)),
        out_shape=jax.ShapeDtypeStruct((B, p_out, C), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(targets, weights, src)
    return out[:, :P].reshape(B, H, W, C)
