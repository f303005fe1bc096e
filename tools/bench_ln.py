"""Microbench LayerNorm stat formulations at SVD UNet shapes.

Cross-lane (channel) reductions on TPU run far off memory bound in the
VPU; this compares the jnp.mean/var formulation against MXU matmul-based
sums (x @ ones) at the temporal-block LN shapes. On-device repeat loop
per CLAUDE.md (host fetches cost ~30 ms RTT over the tunnel).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def ln_vpu(x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def ln_mxu(x, eps=1e-5):
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    ones = jnp.ones((c, 8), jnp.float32)
    s1 = jnp.einsum("...c,cd->...d", xf, ones)[..., :1] / c
    s2 = jnp.einsum("...c,cd->...d", jnp.square(xf), ones)[..., :1] / c
    var = jnp.maximum(s2 - jnp.square(s1), 0.0)
    return ((xf - s1) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def ln_dot1(x, eps=1e-5):
    """Single fused matmul for both sums: [x, x^2] @ ones."""
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    ones = jnp.ones((c,), jnp.float32)
    s1 = jnp.einsum("...c,c->...", xf, ones)[..., None] / c
    s2 = jnp.einsum("...c,c->...", jnp.square(xf), ones)[..., None] / c
    var = jnp.maximum(s2 - jnp.square(s1), 0.0)
    return ((xf - s1) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def timeit(fn, x, iters=30):
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
    shapes = [(18432, 7, 320), (4608, 7, 640), (14, 9216, 320)]
    for shape in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        mb = x.size * 2 / 1e6
        for name, fn in [("vpu", ln_vpu), ("mxu8", ln_mxu),
                         ("dot1", ln_dot1)]:
            ms = timeit(fn, x, args.iters)
            print(f"{shape} {name:5s} {ms:7.3f} ms "
                  f"({2 * mb / ms:.0f} GB/s eff)", flush=True)


if __name__ == "__main__":
    main()
