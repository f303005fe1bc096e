"""Attention dispatch: one call site for all UNet/CLIP/VAE attention.

Default is `jax.nn.dot_product_attention` (XLA-fused; MXU-tiled on TPU).
A Pallas flash-attention path can be slotted in here without touching model
code — the (frames x tokens) temporal layout of SVD is the target
(SURVEY.md §7 step 5 / BASELINE.json north star).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_IMPL = "xla"


def set_attention_impl(name: str):
    global _IMPL
    assert name in ("xla", "naive")
    _IMPL = name


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[B, L, H, D] q/k/v -> [B, L, H, D]; softmax in fp32."""
    if _IMPL == "xla":
        return jax.nn.dot_product_attention(q, k, v)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
