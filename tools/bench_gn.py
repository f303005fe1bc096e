"""Microbench GroupNorm stat+apply formulations at SVD UNet shapes.

The device trace (tools/trace_step.py) shows each GroupNorm's
convert_reduce fusion costing ~3-6 ms at the 320-channel bench shape —
~20x over the HBM bandwidth floor. This compares:

- vpu:   current mofa_tpu.models.layers.GroupNorm formulation
         (spatial-axis VPU reduces to [N, C] partials)
- mxu:   stats via ones-vector dot_general contractions on the MXU
         (sum and sum-of-squares as [N, S, C] x [S] matvecs)
- copy:  x * 2 — the pure-bandwidth reference

Each timed with the full normalize+affine apply, fp32 stats, bf16 in/out.
Usage: python -u tools/bench_gn.py > /tmp/gn.txt 2>&1   (background, no kill)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def gn_vpu(x, g=32, eps=1e-5):
    """Formulation of models/layers.py GroupNorm (no learned affine)."""
    c = x.shape[-1]
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
    return ((xf - mean_c) * inv_c).astype(dt)


def gn_mxu(x, g=32, eps=1e-5):
    """Stats via MXU: per-(N, C) sums as ones-contraction over spatial."""
    c = x.shape[-1]
    n0 = x.shape[0]
    dt = x.dtype
    xs = x.reshape(n0, -1, c)
    s = xs.shape[1]
    ones = jnp.ones((s,), jnp.float32)
    xf = xs.astype(jnp.float32)
    s1 = jax.lax.dot_general(ones, xf, (((0,), (1,)), ((), ())))   # [N, C]
    s2 = jax.lax.dot_general(ones, jnp.square(xf), (((0,), (1,)), ((), ())))
    n = s * (c // g)
    gs1 = s1.reshape(-1, g, c // g).sum(-1)
    gs2 = s2.reshape(-1, g, c // g).sum(-1)
    mean = gs1 / n
    var = jnp.maximum(gs2 / n - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    bshape = (n0,) + (1,) * (x.ndim - 2) + (c,)
    mean_c = jnp.repeat(mean, c // g, axis=-1).reshape(bshape)
    inv_c = jnp.repeat(inv, c // g, axis=-1).reshape(bshape)
    return ((x.astype(jnp.float32) - mean_c) * inv_c).astype(dt)


def gn_mxu_bf16(x, g=32, eps=1e-5):
    """As gn_mxu but the matmuls read bf16 with fp32 accumulation."""
    c = x.shape[-1]
    n0 = x.shape[0]
    dt = x.dtype
    xs = x.reshape(n0, -1, c)
    s = xs.shape[1]
    ones = jnp.ones((s,), dt)
    s1 = jax.lax.dot_general(ones, xs, (((0,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s2 = jax.lax.dot_general(ones, xs * xs, (((0,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    n = s * (c // g)
    gs1 = s1.reshape(-1, g, c // g).sum(-1)
    gs2 = s2.reshape(-1, g, c // g).sum(-1)
    mean = gs1 / n
    var = jnp.maximum(gs2 / n - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    bshape = (n0,) + (1,) * (x.ndim - 2) + (c,)
    mean_c = jnp.repeat(mean, c // g, axis=-1).reshape(bshape)
    inv_c = jnp.repeat(inv, c // g, axis=-1).reshape(bshape)
    return ((x.astype(jnp.float32) - mean_c) * inv_c).astype(dt)


def gn_pallas(x, g=32, eps=1e-5):
    from mofa_tpu.kernels.group_norm import fused_group_norm
    c = x.shape[-1]
    return fused_group_norm(x, jnp.ones((c,), jnp.float32),
                            jnp.zeros((c,), jnp.float32), g, eps)


def just_copy(x, g=32, eps=1e-5):
    return x * jnp.bfloat16(2.0)


def timeit(fn, x, iters):
    @jax.jit
    def run(x):
        def body(c, _):
            o = fn(x + c.astype(x.dtype))
            return jnp.float32(jnp.sum(o.astype(jnp.float32)) * 1e-30), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c
    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    shapes = [(14, 72, 128, 320), (14, 36, 64, 640), (14, 18, 32, 1280),
              (2, 7, 72, 128, 320)]
    for shape in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        mb = x.size * 2 / 1e6
        for name, fn in [("vpu", gn_vpu), ("mxu", gn_mxu),
                         ("mxu_bf16", gn_mxu_bf16), ("pallas", gn_pallas),
                         ("copy", just_copy)]:
            ms = timeit(fn, x, args.iters)
            print(f"{shape} {name:9s} {ms:7.3f} ms "
                  f"({2 * mb / ms:.0f} GB/s eff)", flush=True)


if __name__ == "__main__":
    main()
