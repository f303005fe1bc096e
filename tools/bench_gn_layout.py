"""A/B GroupNorm statistics under the conv-chosen activation layout.

The device trace (tools/trace_full.py) shows in-situ GroupNorm stats
fusions at 3.5-5.9 ms per call ([14,72,128,320] -> (f32[14,320],)x2 at
~14 GB/s) while the identical reduce on a default-layout input runs at
~600 GB/s (tools/bench_bw.py). The difference: inside the UNet the GN
input is a convolution output laid out {3,0,2,1} (minor-to-major C, B,
W, H — XLA tiles (B, C) as the (8, 128) physical tile), and XLA's
reduce emitter handles the spatial reduce over that layout ~40x off the
HBM floor.

This measures, per UNet GN shape, the full GroupNorm (fp32 stats +
normalize/affine apply, bf16 in/out):

- default : input in default layout {3,2,1,0} (the bench_gn.py number)
- hostile : input constrained to the conv layout (the in-situ number)
- relayout: hostile input, but `with_layout_constraint` back to the
            default layout BEFORE stats (one extra copy, fast reduce)
- copy    : x * 2 with hostile input — the pure-bandwidth reference

Usage: python -u tools/bench_gn_layout.py > /tmp/gn_layout.log 2>&1
(run in background on the chip; never kill mid-compile)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental.layout import Layout, with_layout_constraint

# minor-to-major {3,0,2,1} == major_to_minor (1, 2, 0, 3)
CONV_MAJOR_TO_MINOR = (1, 2, 0, 3)


def gn(x, g=32, eps=1e-5):
    """models/layers.py GroupNorm formulation (no learned affine)."""
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


def make_case(kind):
    def run_case(x):
        if kind in ("hostile", "relayout", "copy"):
            x = with_layout_constraint(x, Layout(CONV_MAJOR_TO_MINOR))
        if kind == "relayout":
            x = with_layout_constraint(x, Layout(tuple(range(x.ndim))))
        if kind == "copy":
            return x * jnp.bfloat16(2.0)
        return gn(x)
    return run_case


def timeit(fn, x, iters):
    @jax.jit
    def run(x):
        def body(c, _):
            o = fn(x + c.astype(x.dtype))
            return jnp.float32(jnp.sum(o.astype(jnp.float32)) * 1e-30), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c
    float(run(x))  # compile + warm
    t0 = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    shapes = [(14, 72, 128, 320), (14, 36, 64, 640), (14, 18, 32, 1280)]
    for shape in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        mb = x.size * 2 / 1e6
        for kind in ("default", "hostile", "relayout", "copy"):
            ms = timeit(make_case(kind), x, args.iters)
            print(f"{shape} {kind:9s} {ms:7.3f} ms "
                  f"({2 * mb / ms:.0f} GB/s eff)", flush=True)


if __name__ == "__main__":
    main()
