"""Int8 weight-only storage for frozen inference params.

The dual-adapter Hybrid flagship (reference:
/root/reference/MOFA-Video-Hybrid/pipeline/pipeline.py:446-511) keeps a
1.5B-param UNet plus TWO 0.7B-param adapters resident during the denoise
loop — 5.5 GB bf16 on a 16 GB v5e chip. All three are FROZEN at
inference, so the weights can live in HBM as int8 with per-output-channel
fp32 scales (absmax symmetric) and be dequantized to the compute dtype
just-in-time inside the denoise loop: ~2x less resident weight HBM, with
the dequantized bf16 copy of each layer a transient the scheduler frees
after its consumer runs.

TPU-specific notes:
- int8 -> bf16 convert + scale multiply is a pure elementwise chain; XLA
  fuses it into one VPU kernel (the fp32 intermediate never reaches HBM).
- XLA hoists loop-invariant computations out of `while` bodies; a naive
  dequant inside `lax.scan` would be hoisted, materializing the ENTIRE
  bf16 tree for the whole loop (worse than not quantizing). Dequant
  therefore threads a loop-varying `token` through
  `lax.optimization_barrier`, pinning each dequant inside the loop (and,
  under cfg_split, inside the per-CFG-side `lax.map` body so the two
  sides don't share one live copy).

Quantized trees keep the original pytree structure; each quantized leaf
becomes a dict {"__q8__": int8 values, "__q8s__": fp32 scales}, so the
tree still flows through jit boundaries as ordinary arrays. Small leaves
(biases, norm scales, embeddings under `min_size`) stay in their
original dtype — they are memory-irrelevant and numerics-critical.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

QKEY = "__q8__"
SKEY = "__q8s__"

# leaves smaller than this stay unquantized (biases, norm affines, time
# embeddings): < 2 MB total across the SVD UNet, and the layers most
# sensitive to rounding
MIN_SIZE = 65536


def is_qleaf(x: Any) -> bool:
    return isinstance(x, dict) and QKEY in x and SKEY in x


def has_quantized(tree: Any) -> bool:
    found = False

    def visit(x):
        nonlocal found
        found = found or is_qleaf(x)
        return x

    jax.tree_util.tree_map(visit, tree, is_leaf=is_qleaf)
    return found


def quantize_tree(params: Any, min_size: int = MIN_SIZE) -> Any:
    """Symmetric per-output-channel (last axis) int8 quantization.

    Applies to floating leaves with ndim >= 2 and size >= min_size —
    i.e. conv kernels [kh, kw, cin, cout] and dense kernels [in, out],
    scaled per `cout`. Everything else passes through unchanged.
    """

    def q(leaf):
        if (not isinstance(leaf, (jax.Array, jnp.ndarray))
                or not jnp.issubdtype(leaf.dtype, jnp.floating)
                or leaf.ndim < 2 or leaf.size < min_size):
            return leaf
        w = leaf.astype(jnp.float32)
        axes = tuple(range(leaf.ndim - 1))
        s = jnp.max(jnp.abs(w), axis=axes, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-12)
        return {QKEY: jnp.round(w / s).astype(jnp.int8),
                SKEY: s}

    return jax.tree_util.tree_map(q, params)


def dequantize_tree(params: Any, dtype, token: Optional[Any] = None) -> Any:
    """Materialize a compute-dtype tree from a (possibly) quantized one.

    token: any loop-varying value (or tuple of values); each dequant is
    tied to it via `lax.optimization_barrier` so XLA cannot hoist the
    materialization out of the enclosing scan/map body. Pass None outside
    loops (single-use contexts like the inject encoders).
    """

    def dq(x):
        if not is_qleaf(x):
            return x
        q, s = x[QKEY], x[SKEY]
        if token is not None:
            q = jax.lax.optimization_barrier((q, token))[0]
        # fp32 multiply then one rounding to the compute dtype; the chain
        # is elementwise so XLA fuses it (no fp32 HBM materialization)
        return (q.astype(jnp.float32) * s).astype(dtype)

    return jax.tree_util.tree_map(dq, params, is_leaf=is_qleaf)


def maybe_dequantize(params: Any, dtype, token: Optional[Any] = None) -> Any:
    """dequantize_tree when the tree contains quantized leaves, else
    identity (zero overhead on unquantized bundles)."""
    if has_quantized(params):
        return dequantize_tree(params, dtype, token)
    return params


def quant_params_dtype(params) -> Optional[Any]:
    """Compute dtype of a possibly-quantized tree: the first floating
    leaf that is not a quantization scale; None if there is none."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            params, is_leaf=is_qleaf)[0]:
        if is_qleaf(leaf):
            continue
        if (hasattr(leaf, "dtype")
                and jnp.issubdtype(leaf.dtype, jnp.floating)):
            return leaf.dtype
    return None
