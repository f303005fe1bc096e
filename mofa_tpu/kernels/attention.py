"""Attention dispatch: one call site for all UNet/CLIP/VAE attention.

Default is `jax.nn.dot_product_attention` (XLA-fused; MXU-tiled on TPU).
A Pallas flash-attention path can be slotted in here without touching model
code — the (frames x tokens) temporal layout of SVD is the target
(SURVEY.md §7 step 5 / BASELINE.json north star).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_IMPL = "auto"

# flash beats XLA attention from 576 tokens up on v5e (1.81 vs 2.12 ms at
# L=576/20 heads with bq=128; 3.4 vs 9.7 ms at L=2304/10 heads) and is
# mandatory at 9216 where naive logits don't fit
FLASH_MIN_SEQ = 576

# below this sequence length, batched attention lowers to huge numbers of
# tiny LxL matmuls that strand the MXU — use the packed formulation
PACK_MAX_SEQ = 32
PACK_TARGET_ROWS = 128  # aim for one full MXU tile of packed rows
PACK_MAX_FOLDED = 160   # L*H above this: score blowup outweighs the win


def _packed_short_attention(q, k, v):
    """Exact attention for short sequences via block-diagonal packing.

    SVD's temporal self-attention is [B·HW, T, H, D] with T<=25: XLA
    lowers it to B·HW·H separate TxT matmuls whose 7x7 outputs use a
    fraction of one 128x128 MXU tile each. Instead fold heads and `nb`
    batch elements into a single (nb·T·H)-row masked attention — one
    well-shaped matmul per group — with an additive block-diagonal mask
    (same batch element AND same head), which makes the row softmax
    exactly the per-(batch, head) softmax. Reshapes only, no transposes:
    rows are ordered (batch, t, head) straight from the [B, L, H, D]
    layout.
    """
    B, L, H, D = q.shape
    from mofa_tpu.parallel.activation import is_sharded_execution
    if is_sharded_execution():
        # folding mesh-sharded batch elements into pack groups would make
        # the [B] -> [B/nb, nb*L*H] reshape unpropagatable for the SPMD
        # partitioner (forced replication); nb=1 keeps dim 0 intact so the
        # batch sharding flows straight through the fold of (L, H)
        nb = 1
    else:
        nb = max(1, PACK_TARGET_ROWS // (L * H))
    pad = (-B) % nb
    if pad:
        zpad = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
        q, k, v = zpad(q), zpad(k), zpad(v)
    g = (B + pad) // nb
    rows = nb * L * H
    qp = q.reshape(g, rows, D)
    kp = k.reshape(g, rows, D)
    vp = v.reshape(g, rows, D)

    r = jnp.arange(rows)
    same = ((r[:, None] // (L * H)) == (r[None, :] // (L * H))) \
        & ((r[:, None] % H) == (r[None, :] % H))
    bias = jnp.where(same, 0.0, -jnp.inf).astype(jnp.float32)

    scale = D ** -0.5
    logits = jnp.einsum("gik,gjk->gij", qp, kp,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits + bias, axis=-1).astype(q.dtype)
    out = jnp.einsum("gij,gjk->gik", probs, vp)
    out = out.reshape(g * nb, L, H, D)
    return out[:B] if pad else out


def temporal_attention_tmajor(q2, k2, v2, num_frames: int, heads: int):
    """Temporal self-attention taking the NATURAL spatial-major rows.

    q2/k2/v2 [B*T, S, H*D] -> [B*T, S, H*D], attending over the frame
    axis per (batch, spatial token). On TPU this dispatches to the
    transpose-free Pallas kernel (kernels/short_attention.py
    ::short_attention_tmajor); elsewhere (CPU tests, sharded execution,
    odd shapes) it falls back to the classic transpose +
    dot_product_attention + transpose — identical math.
    """
    import os
    bt, s, hd = q2.shape
    b = bt // num_frames
    d = hd // heads
    from mofa_tpu.parallel.activation import is_sharded_execution
    from mofa_tpu.kernels.short_attention import (
        short_attention_applicable, short_attention_tmajor,
        tmajor_vmem_estimate)

    def vmem_ok():
        # single source of truth for the block-footprint estimate +
        # calibration record: short_attention.tmajor_vmem_estimate
        est = tmajor_vmem_estimate(num_frames, hd, q2.dtype.itemsize)
        return est <= 14 * 1024 * 1024

    if (os.environ.get("MOFA_SHORT_ATTN", "") != "0"
            and not is_sharded_execution()   # pallas is opaque to GSPMD
            and short_attention_applicable(b * s, num_frames, num_frames,
                                           heads, d)
            and vmem_ok()):
        fixed = os.environ.get("MOFA_FIXED_MAX_SOFTMAX", "") != "0"
        return short_attention_tmajor(q2, k2, v2, num_frames, heads, 0,
                                      fixed)

    if is_sharded_execution():
        # token-parallel form: keep [B, T, S, H, D] with the token dim
        # INTACT so an S-sharding (parallel/activation.py policy
        # "tokens") flows through with ZERO collectives — all T frames
        # of a token shard are device-local. The classic transpose
        # fallback below merges (B, S) into dim 0, which a minor-factor-
        # sharded merge can't express (GSPMD replicates).
        r = lambda x: x.reshape(b, num_frames, s, heads, d)
        q5, k5, v5 = r(q2), r(k2), r(v2)
        logits = jnp.einsum("btshd,bushd->bshtu", q5, k5,
                            preferred_element_type=jnp.float32) * d ** -0.5
        p = jax.nn.softmax(logits, axis=-1).astype(q2.dtype)
        o = jnp.einsum("bshtu,bushd->btshd", p, v5)
        return o.reshape(bt, s, hd)

    def to_tmin(x):            # [B*T, S, HD] -> [B*S, T, H, D]
        x = x.reshape(b, num_frames, s, heads, d)
        return x.transpose(0, 2, 1, 3, 4).reshape(b * s, num_frames,
                                                  heads, d)

    out = dot_product_attention(to_tmin(q2), to_tmin(k2), to_tmin(v2))
    out = out.reshape(b, s, num_frames, hd).transpose(0, 2, 1, 3)
    return out.reshape(bt, s, hd)


def set_attention_impl(name: str):
    global _IMPL
    assert name in ("auto", "xla", "naive", "flash")
    _IMPL = name


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[B, L, H, D] q/k/v -> [B, L, H, D]; softmax in fp32."""
    impl = _IMPL
    if impl == "auto":
        if (q.shape[1] == k.shape[1] and q.shape[1] <= PACK_MAX_SEQ
                and q.shape[1] * q.shape[2] <= PACK_MAX_FOLDED
                and q.shape[0] > 1):
            import os
            from mofa_tpu.kernels.short_attention import (
                short_attention, short_attention_applicable)
            if (os.environ.get("MOFA_SHORT_ATTN", "") != "0"
                    and short_attention_applicable(
                        q.shape[0], q.shape[1], k.shape[1], q.shape[2],
                        q.shape[3])):
                # VMEM-resident Pallas kernel: one q/k/v read + one out
                # write vs the packed-XLA path's fp32 [rows, rows]
                # logits+probs HBM round trips plus full-relayout
                # reshapes. MOFA_FIXED_MAX_SOFTMAX=0 opts the temporal
                # kernel (like flash) back into the exact max-subtracted
                # softmax.
                fixed = os.environ.get("MOFA_FIXED_MAX_SOFTMAX", "") != "0"
                return short_attention(q, k, v, 0, fixed)
            return _packed_short_attention(q, k, v)
        big = q.shape[1] * k.shape[1] >= FLASH_MIN_SEQ ** 2
        impl = "flash" if big else "xla"
        if impl == "flash":
            from mofa_tpu.parallel.activation import is_sharded_execution
            if is_sharded_execution():
                # the Pallas flash kernel is opaque to the SPMD
                # partitioner (sharded operands would be all-gathered);
                # XLA attention partitions over the sharded batch dim.
                # (A shard_map flash path needs even batch shards —
                # B*T/HW rarely divide the frame axis — so XLA it is.)
                impl = "xla"
    if impl == "flash":
        import os
        from mofa_tpu.kernels.flash_attention import flash_attention
        # Clamped fixed-max softmax is the DEFAULT: the v5e A/B sweep
        # (tools/bench_flash.py, 100-iter on-chip) measures 24.1 -> 17.8 ms
        # at the /8 SVD shape and 3.7 -> 2.8 ms at /16 — the kernel is
        # VPU-bound and dropping the running max + acc rescale is a 26%
        # win. Exact for natural logits <= 69 (see flash_attention.py);
        # MOFA_FIXED_MAX_SOFTMAX=0 opts back into the online-max softmax.
        fixed = os.environ.get("MOFA_FIXED_MAX_SOFTMAX", "") != "0"
        # block sweep (fixed-max): bq=256 with the K side in half/whole
        # blocks wins — (256, 4608) 17.8 ms at L=9216, (256, 2304) 2.8 ms
        # at L=2304 (vs (512, 1024) 19.5/3.2); at L=576 bq=128 edges out
        # bq=256 (1.81 vs 1.93 ms). _flash_fwd shrinks bk to a divisor of
        # L automatically. Floor bk at 128 so a forced impl="flash" on
        # short sequences (e.g. temporal L=25) still gets a sublane-
        # aligned Pallas block (pad+mask) instead of block_k=25, which
        # Mosaic may refuse to compile on real TPU.
        bq = 128 if q.shape[1] < 2304 else 256
        bk = max(128, min(k.shape[1], 4608))
        # positional: custom_vjp + nondiff_argnums rejects kwargs
        return flash_attention(q, k, v, bq, bk, fixed)
    if impl == "xla":
        from mofa_tpu.parallel.activation import is_sharded_execution
        if is_sharded_execution() and k.shape[1] > 1024:
            return _chunked_xla_attention(q, k, v)
        return jax.nn.dot_product_attention(q, k, v)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _chunked_xla_attention(q, k, v, bk: int = 1024):
    """Exact online-softmax attention scanned over K/V chunks — the
    sharded-execution spatial path (pure XLA, so GSPMD partitions it).

    Two properties the plain einsum+softmax form lacks on a mesh:
    - logits never materialize at [B, H, Lq, Lk] — at the token-sharded
      576x1024 deploy shape that would be ~10 GB fp32 PER DEVICE, over a
      v5e's HBM before params; here the transient is [B, H, Lq_shard, bk]
    - the gathered K/V stay bf16 (accumulation is fp32 via
      preferred_element_type), halving the spatial-attention all-gather
      bytes that dominate the token-parallel ICI bound
      (PROJECTION_v5e8.json largest_ops).
    Exact max-subtracted softmax, independent of chunk order.
    """
    b, lq, h, d = q.shape
    lk = k.shape[1]
    scale = d ** -0.5
    nb = -(-lk // bk)
    pad = nb * bk - lk
    if pad:
        kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    else:
        kp, vp = k, v
    kc = kp.reshape(b, nb, bk, h, d).transpose(1, 0, 2, 3, 4)
    vc = vp.reshape(b, nb, bk, h, d).transpose(1, 0, 2, 3, 4)
    # padded keys masked to -inf via an iota check per chunk
    base = jnp.arange(nb) * bk

    def body(carry, inp):
        m, l, acc = carry
        kb, vb, start = inp
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, kb,
                            preferred_element_type=jnp.float32) * scale
        valid = (start + jnp.arange(bk)) < lk
        logits = jnp.where(valid[None, None, None, :], logits, -jnp.inf)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        # exp of -inf rows stays 0; correction rescales the accumulator
        corr = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        l = l * corr + p.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p.astype(q.dtype), vb,
            preferred_element_type=jnp.float32)
        return (m_new, l, acc), None

    m0 = jnp.full((b, h, lq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, lq), jnp.float32)
    a0 = jnp.zeros((b, h, lq, d), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, a0), (kc, vc, base))
    out = acc / l[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)
