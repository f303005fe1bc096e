"""Flash-attention block sweep at the SVD spatial shapes.

The /8-resolution spatial self-attention ([14, 9216, 5, 64]) costs
~23 ms per layer x5 layers at the bench shape — the single biggest
kernel bucket. Sweep (block_q, block_k) on the chip.

Usage: python -u tools/bench_flash.py [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, args_, iters):
    @jax.jit
    def run(q, k, v):
        def body(c, _):
            o = fn(q + c.astype(q.dtype), k, v)
            return jnp.float32(jnp.sum(o.astype(jnp.float32)) * 1e-30), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c
    try:
        float(run(*args_))
    except Exception as e:  # noqa: BLE001 — report failed configs
        return None, str(e).splitlines()[0][:80]
    t0 = time.perf_counter()
    float(run(*args_))
    return (time.perf_counter() - t0) / iters * 1e3, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--b", type=int, default=14)
    ap.add_argument("--l", type=int, default=9216)
    ap.add_argument("--h", type=int, default=5)
    ap.add_argument("--d", type=int, default=64)
    args = ap.parse_args()

    from mofa_tpu.kernels.flash_attention import flash_attention

    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    shape = (args.b, args.l, args.h, args.d)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)
    flops = 4 * args.b * args.h * args.l * args.l * args.d

    for bq, bk in [(512, 1024), (512, 2048), (256, 2048), (512, 4608),
                   (768, 1024), (256, 4608), (512, 512), (1024, 512)]:
        for fixed in (False, True):
            fn = lambda a, b_, c: flash_attention(  # noqa: E731
                a, b_, c, bq, bk, fixed)
            ms, err = timeit(fn, (q, k, v), args.iters)
            tag = "fixed" if fixed else "run  "
            if ms is None:
                print(f"bq={bq:5d} bk={bk:5d} {tag}  FAILED: {err}",
                      flush=True)
            else:
                print(f"bq={bq:5d} bk={bk:5d} {tag}  {ms:7.2f} ms "
                      f"({flops / ms / 1e9:.0f} GF/s)", flush=True)


if __name__ == "__main__":
    main()
