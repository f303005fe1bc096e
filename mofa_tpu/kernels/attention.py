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

# flash beats XLA attention from ~2304 tokens up on v5e (6.9 vs 11.6 ms at
# L=2304/10 heads) and is mandatory at 9216 where naive logits don't fit
FLASH_MIN_SEQ = 2304


def set_attention_impl(name: str):
    global _IMPL
    assert name in ("auto", "xla", "naive", "flash")
    _IMPL = name


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[B, L, H, D] q/k/v -> [B, L, H, D]; softmax in fp32."""
    impl = _IMPL
    if impl == "auto":
        big = q.shape[1] * k.shape[1] >= FLASH_MIN_SEQ ** 2
        impl = "flash" if big else "xla"
    if impl == "flash":
        from mofa_tpu.kernels.flash_attention import flash_attention
        return flash_attention(q, k, v)
    if impl == "xla":
        return jax.nn.dot_product_attention(q, k, v)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
