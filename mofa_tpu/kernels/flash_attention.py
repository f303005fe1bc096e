"""Pallas TPU flash attention for the SVD UNet's (frames x tokens) layouts.

The reference leans on xformers memory-efficient attention
(/root/reference/MOFA-Video-Traj/run_gradio.py:130-142); on TPU the
equivalent is an online-softmax Pallas kernel: Q blocks ride the grid,
K/V are streamed VMEM-block by VMEM-block with running (max, sum)
statistics so the [L, L] logits matrix never materializes in HBM.

Forward: Pallas kernel, fp32 accumulation, returns (out, logsumexp).
Backward: memory-bounded chunked recompute over query blocks in plain
jnp (MXU matmuls; probs rebuilt per chunk from the saved logsumexp),
wired via jax.custom_vjp.

Layout contract matches kernels/attention.py: q, k, v are [B, L, H, D].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# v5e sweep at the SVD spatial shape (L=9216, 5 heads, d=64, bf16):
# (256,512) 29.6ms, (512,512) 28.2ms, (512,1024) 26.8ms <- best
#
# head_dim=64 vs the 128-wide MXU contraction: measured on-chip
# (tools/bench_packing.py), a K=64 matmul runs at exactly HALF the
# useful rate of K=128 (35 vs 66 TF/s — the MXU pads the contraction to
# 128 lanes), and the block-diagonal two-head packing
# (Q[BQ,128]=[q0|q1], K[2BK,128]=[[k0,0],[0,k1]]) recovers NOTHING
# (32 TF/s): it performs the identical padded MAC-slot count
# BQ*2BK*128 == 2*(BQ*BK*128). The D=64 padding is therefore a
# structural ceiling of exact SVD attention on this MXU, not harvestable
# headroom; at 17.8 ms (84 TF/s) this kernel sits ~86% of that padded
# roofline (~15.4 ms).
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
NEG_INF = -1e30


_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


# Clamp threshold for the fixed-max softmax (base-2 logits). exp2
# saturates fp32 at 127; 100 leaves 2^28 of headroom for the key-sum
# (L <= 2^28). Exact vs the running-max softmax whenever the true max
# base-2 logit <= 100 (natural logit <= 69 — far beyond trained
# attention's typical +-30); beyond that it saturates gracefully.
_FIXED_MAX_CLAMP = 100.0


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                      block_k: int, l_actual: int, scale: float,
                      masked: bool, fixed_max: bool = False):
    """Grid (B*H, num_q_blocks). q_ref [BQ, D]; k_ref/v_ref [Lpad, D]
    (whole sequence for this head in VMEM); o_ref [BQ, D]; lse_ref
    [BQ, 1]. Softmax runs in base 2: the log2(e) factor folds into the
    logit scale so exp2 (the VPU-native transcendental) replaces exp on
    every [BQ, BK] tile.

    fixed_max drops the online running max entirely (this kernel is
    VPU-bound; the [BQ, BK] max-reduce and the acc rescale are pure VPU
    passes): p = exp2(min(logits, clamp)) accumulates unnormalized, with
    the clamp guarding fp32 exp2 overflow."""
    bq, d = q_ref.shape
    lpad = k_ref.shape[0]
    num_kb = lpad // block_k
    scale2 = scale * _LOG2E

    # keep q/k/v in their storage dtype: bf16 inputs ride the MXU at full
    # rate with fp32 accumulation (preferred_element_type); casting up
    # front would force fp32 matmuls (~3x slower on v5e)
    q = q_ref[:]

    def body(kb, carry):
        acc, m_prev, s_prev = carry
        k = k_ref[pl.ds(kb * block_k, block_k), :]
        v = v_ref[pl.ds(kb * block_k, block_k), :]
        logits = scale2 * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [BQ, BK], base-2
        if masked:  # only the tail block can be partial; elided when
            # l_actual % block_k == 0 (saves a [BQ, BK] VPU op per block
            # in this VPU-bound kernel)
            key_idx = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1)
            logits = jnp.where(key_idx < l_actual, logits, NEG_INF)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)   # [BQ, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(logits - m_new)                      # [BQ, BK]
        s_new = s_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, s_new

    if fixed_max:
        def body_fixed(kb, carry):
            acc, s_prev = carry
            k = k_ref[pl.ds(kb * block_k, block_k), :]
            v = v_ref[pl.ds(kb * block_k, block_k), :]
            logits = scale2 * jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if masked:
                key_idx = kb * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, block_k), 1)
                logits = jnp.where(key_idx < l_actual, logits, NEG_INF)
            p = jnp.exp2(jnp.minimum(logits, _FIXED_MAX_CLAMP))
            s_new = s_prev + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc, s_new

        acc0 = jnp.zeros((bq, d), jnp.float32)
        s0 = jnp.zeros((bq, 1), jnp.float32)
        acc, s = jax.lax.fori_loop(0, num_kb, body_fixed, (acc0, s0))
        # guard the no-running-max failure mode: a row whose base-2 logits
        # are ALL below ~-126 underflows every exp2 to 0 (s == 0) and would
        # emit 0/0 NaN; clamp s so such rows return 0 instead. No effect on
        # normal rows (any non-underflowed key gives s >= 2^-126 >> 1e-30).
        s = jnp.maximum(s, 1e-30)
        o_ref[:] = (acc / s).astype(o_ref.dtype)
        lse_ref[:] = (jnp.log2(s) * _LN2).astype(jnp.float32)
        return

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    s0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, s = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, s0))

    o_ref[:] = (acc / s).astype(o_ref.dtype)
    # natural-log lse (the backward recompute uses exp(logits - lse))
    lse_ref[:] = ((m + jnp.log2(s)) * _LN2).astype(jnp.float32)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "fixed_max"))
def _flash_fwd(q, k, v, block_q: int, block_k: int, fixed_max: bool = False):
    """q [B, Lq, H, D], k/v [B, Lk, H, D] -> (out [B, Lq, H, D],
    lse [B, H, Lq] fp32). Lq and Lk may differ (cross attention)."""
    b, l, h, d = q.shape
    lk = k.shape[1]
    scale = d ** -0.5
    lq_pad = pl.cdiv(l, block_q) * block_q
    if lk % block_k:
        # prefer a smaller block that divides L exactly: the kernel then
        # skips the per-block padded-key mask (VPU-bound kernel)
        for cand in (768, 512, 384, 256):
            if cand < block_k and lk % cand == 0:
                block_k = cand
                break
    lk_pad = pl.cdiv(lk, block_k) * block_k

    # [B, L, H, D] -> [B*H, Lpad, D]
    def to_heads(x, lpad):
        x = jnp.moveaxis(x, 2, 1).reshape(b * h, x.shape[1], d)
        return _pad_to(x, lpad, axis=1)

    qh = to_heads(q, lq_pad)
    kh = to_heads(k, lk_pad)
    vh = to_heads(v, lk_pad)

    grid = (b * h, lq_pad // block_q)
    kernel = functools.partial(_flash_fwd_kernel, block_k=block_k,
                               l_actual=lk, scale=scale,
                               masked=lk != lk_pad, fixed_max=fixed_max)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, lk_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, lk_pad, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, block_q, 1), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, lq_pad, 1), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(qh, kh, vh)

    out = out[:, :l].reshape(b, h, l, d).transpose(0, 2, 1, 3)
    lse = lse[:, :l, 0].reshape(b, h, l)
    return out, lse


def _flash_bwd(block_q, block_k, res, g):
    """Chunked-recompute backward (plain jnp, scan over query chunks)."""
    q, k, v, out, lse = res
    b, l, h, d = q.shape
    lk = k.shape[1]
    scale = d ** -0.5
    chunk = max(block_q, 128)
    n_chunks = pl.cdiv(l, chunk)
    lpad = n_chunks * chunk

    qp = _pad_to(q, lpad, 1).astype(jnp.float32)
    gp = _pad_to(g, lpad, 1).astype(jnp.float32)
    op = _pad_to(out, lpad, 1).astype(jnp.float32)
    lsep = _pad_to(lse, lpad, 2)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    qc = qp.reshape(b, n_chunks, chunk, h, d).transpose(1, 0, 2, 3, 4)
    gc = gp.reshape(b, n_chunks, chunk, h, d).transpose(1, 0, 2, 3, 4)
    oc = op.reshape(b, n_chunks, chunk, h, d).transpose(1, 0, 2, 3, 4)
    lc = lsep.reshape(b, h, n_chunks, chunk).transpose(2, 0, 1, 3)


    def per_chunk(carry, inp):
        dk_acc, dv_acc = carry
        qb, gb, ob, lb, idx = inp
        # probs [B, H, C, L] recomputed from lse
        logits = jnp.einsum("bchd,bkhd->bhck", qb, kf) * scale
        p = jnp.exp(logits - lb[..., None])
        # zero out padded query rows (their lse is stale/padded)
        row_idx = idx * chunk + jnp.arange(chunk)
        p = jnp.where((row_idx < l)[None, None, :, None], p, 0.0)
        dv = jnp.einsum("bhck,bchd->bkhd", p, gb)
        dp = jnp.einsum("bchd,bkhd->bhck", gb, vf)
        delta = jnp.sum(gb * ob, axis=-1)              # [B, C, H]
        ds = p * (dp - delta.transpose(0, 2, 1)[..., None])
        dq = jnp.einsum("bhck,bkhd->bchd", ds, kf) * scale
        dk = jnp.einsum("bhck,bchd->bkhd", ds, qb) * scale
        return (dk_acc + dk, dv_acc + dv), dq

    zero = jnp.zeros((b, lk, h, d), jnp.float32)
    (dk, dv), dq_chunks = jax.lax.scan(
        per_chunk, (zero, zero),
        (qc, gc, oc, lc, jnp.arange(n_chunks)))
    dq = dq_chunks.transpose(1, 0, 2, 3, 4).reshape(b, lpad, h, d)[:, :l]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    fixed_max: bool = False):
    """[B, L, H, D] q/k/v -> [B, L, H, D]; fp32 online softmax.

    fixed_max=True uses the clamped no-running-max softmax (see
    _flash_fwd_kernel): numerically identical for natural logits <= 69,
    saturating above. The lse it emits is the same quantity, so the
    backward recompute is shared."""
    out, _ = _flash_fwd(q, k, v, block_q, block_k, fixed_max)
    return out


def _fwd_rule(q, k, v, block_q, block_k, fixed_max):
    out, lse = _flash_fwd(q, k, v, block_q, block_k, fixed_max)
    return out, (q, k, v, out, lse)


def _bwd_rule(block_q, block_k, fixed_max, res, g):
    return _flash_bwd(block_q, block_k, res, g)


flash_attention.defvjp(_fwd_rule, _bwd_rule)
