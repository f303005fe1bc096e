"""Separate fixed per-op/per-iteration overhead from HBM bandwidth.

bench_bw.py measured ~0.8-1.0 ms per scan iteration at EVERY tensor size
(10 MB .. 82 MB), i.e. either a fixed per-iteration cost dominates or
streaming runs far below the 819 GB/s v5e spec. This probe scales the
tensor 8x and chains dependent cheap ops to pin down:

- copy_scale:  y = x * c at 10/82/330 MB     -> bytes/ms slope = real BW
- chain:       64 dependent multiplies on an 8 KB tensor -> per-op floor
- reduce_scale: sum over major axes at 10/82/330 MB -> reduce stream rate
- reduce_2stage: same reduce via an explicit [N, S1, S2, C] two-stage sum

Usage: python -u tools/bench_overhead.py > /tmp/overhead.txt 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(make, iters=50):
    @jax.jit
    def run(x):
        carry0, body = make(x)
        c, _ = jax.lax.scan(body, carry0, None, length=iters)
        leaves = jax.tree_util.tree_leaves(c)
        return sum(jnp.sum(l.astype(jnp.float32)) * 1e-30 for l in leaves)

    def go(x):
        float(run(x))
        t0 = time.perf_counter()
        float(run(x))
        return (time.perf_counter() - t0) / iters * 1e3
    return go


def copy_scale(x):
    def body(c, _):
        return c * jnp.bfloat16(1.0000001), None
    return x, body


def chain64(x):
    def body(c, _):
        for _ in range(64):
            c = c * jnp.bfloat16(1.0000001)
        return c, None
    return x, body


def reduce_scale(x):
    acc0 = jnp.zeros((x.shape[0], x.shape[-1]), jnp.float32)

    def body(acc, _):
        xf = (x + acc[0, 0].astype(x.dtype) * 1e-30).astype(jnp.float32)
        s = jnp.sum(xf, axis=tuple(range(1, x.ndim - 1)))
        return acc * 0.5 + s, None
    return acc0, body


def reduce_2stage(x):
    n, c = x.shape[0], x.shape[-1]
    s = x.size // n // c
    s1 = 128
    assert s % s1 == 0

    acc0 = jnp.zeros((n, c), jnp.float32)

    def body(acc, _):
        xr = (x + acc[0, 0].astype(x.dtype) * 1e-30).reshape(n, s // s1, s1, c)
        xf = xr.astype(jnp.float32)
        partial = jnp.sum(xf, axis=2)
        out = jnp.sum(partial, axis=1)
        return acc * 0.5 + out, None
    return acc0, body


def main():
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()}", flush=True)

    # per-op floor
    tiny = jax.random.normal(key, (8, 128), jnp.bfloat16)
    one = timeit(copy_scale)(tiny)
    sixty4 = timeit(chain64)(tiny)
    print(f"tiny 1-op   {one:7.4f} ms/iter", flush=True)
    print(f"tiny 64-op  {sixty4:7.4f} ms/iter -> "
          f"{(sixty4 - one) / 63 * 1e3:.1f} us/op marginal", flush=True)

    for mult in (1, 8, 32):
        shape = (14 * mult, 72, 128, 320)
        x = jax.random.normal(key, shape, jnp.bfloat16)
        mb = x.size * 2 / 1e6
        ms = timeit(copy_scale)(x)
        print(f"copy    {mb:6.0f} MB {ms:7.3f} ms ({2 * mb / ms:.0f} GB/s)",
              flush=True)
    for mult in (1, 8, 32):
        shape = (14 * mult, 72, 128, 320)
        x = jax.random.normal(key, shape, jnp.bfloat16)
        mb = x.size * 2 / 1e6
        ms = timeit(reduce_scale)(x)
        print(f"reduce  {mb:6.0f} MB {ms:7.3f} ms ({mb / ms:.0f} GB/s read)",
              flush=True)
        ms = timeit(reduce_2stage)(x)
        print(f"red2st  {mb:6.0f} MB {ms:7.3f} ms ({mb / ms:.0f} GB/s read)",
              flush=True)


if __name__ == "__main__":
    main()
