"""HBM bandwidth probes at SVD UNet activation shapes.

tools/bench_gn.py's scan body fences each iteration with a reduce-to-
scalar of the OUTPUT, so every formulation pays the same convert+reduce
cost and the "copy" floor is really a read+scalar-reduce measurement.
This probe separates the quantities:

- copy_carry:   y = x*2 carried as the next scan input — output truly
                materializes every iteration (read + write per iter).
- reduce_lastd: jnp.sum over the MINOR (lane) axis -> [.., 1] kept as
                part of the carry (row reduce; read per iter).
- reduce_major: jnp.sum over all major axes -> [N, C] carried (the
                GroupNorm stats direction; read per iter).
- moments:      s1+s2 ([N, C] each) exactly as models/layers.py GroupNorm
                computes them (read, possibly twice, per iter).

Effective GB/s uses only the bytes each variant MUST move. Comparing
copy_carry's GB/s to the ~819 GB/s v5e spec tells us the streaming
ceiling over this tunnel/runtime; comparing reduce_major/moments to
copy_carry isolates what the stat reduces themselves cost.

Usage: python -u tools/bench_bw.py > /tmp/bw.txt 2>&1 &   (never kill)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(make_body, x, iters):
    """make_body(x) -> (carry0, body(carry, _) -> (carry, None)).
    Returns ms/iter with a scalar fetch fencing only the END of the scan.
    make_body runs INSIDE the jit so x stays an argument, not a baked
    constant (see CLAUDE.md on closures over large arrays)."""

    @jax.jit
    def run(x):
        carry0, body = make_body(x)
        c, _ = jax.lax.scan(body, carry0, None, length=iters)
        leaves = jax.tree_util.tree_leaves(c)
        return sum(jnp.sum(l.astype(jnp.float32)) * 1e-30 for l in leaves)

    float(run(x))  # compile+warm
    t0 = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - t0) / iters * 1e3


def copy_carry(x):
    def body(c, _):
        return c * jnp.bfloat16(1.0000001), None
    return x, body


def reduce_major(x):
    c = x.shape[-1]
    acc0 = jnp.zeros((x.shape[0], c), jnp.float32)

    def body(acc, _):
        xf = (x + acc[0, 0].astype(x.dtype) * 1e-30).astype(jnp.float32)
        s = jnp.sum(xf, axis=tuple(range(1, x.ndim - 1)))
        return acc * 0.5 + s, None
    return acc0, body


def reduce_lastd(x):
    acc0 = jnp.zeros(x.shape[:-1] + (1,), jnp.float32)

    def body(acc, _):
        xf = (x + acc[..., :1].astype(x.dtype) * 1e-30).astype(jnp.float32)
        s = jnp.sum(xf, axis=-1, keepdims=True)
        return acc * 0.5 + s, None
    return acc0, body


def moments(x):
    c = x.shape[-1]
    acc0 = (jnp.zeros((x.shape[0], c), jnp.float32),
            jnp.zeros((x.shape[0], c), jnp.float32))

    def body(acc, _):
        a1, a2 = acc
        xf = (x + a1[0, 0].astype(x.dtype) * 1e-30).astype(jnp.float32)
        axes = tuple(range(1, x.ndim - 1))
        s1 = jnp.sum(xf, axis=axes)
        s2 = jnp.sum(jnp.square(xf), axis=axes)
        return (a1 * 0.5 + s1, a2 * 0.5 + s2), None
    return acc0, body


def moments_bf16_mxu(x):
    """s1/s2 via bf16 MXU ones-contraction, fp32 accumulation."""
    c = x.shape[-1]
    n0 = x.shape[0]
    acc0 = (jnp.zeros((n0, c), jnp.float32), jnp.zeros((n0, c), jnp.float32))

    def body(acc, _):
        a1, a2 = acc
        xs = (x + a1[0, 0].astype(x.dtype) * 1e-30).reshape(n0, -1, c)
        ones = jnp.ones((xs.shape[1],), x.dtype)
        s1 = jax.lax.dot_general(ones, xs, (((0,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s2 = jax.lax.dot_general(ones, xs * xs, (((0,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return (a1 * 0.5 + s1, a2 * 0.5 + s2), None
    return acc0, body


VARIANTS = [
    ("copy_carry", copy_carry, 2.0),     # read + write
    ("reduce_lastd", reduce_lastd, 1.0),  # read
    ("reduce_major", reduce_major, 1.0),  # read
    ("moments", moments, 1.0),            # read (x2 if XLA re-reads)
    ("moments_mxu", moments_bf16_mxu, 1.0),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    print(f"backend={jax.default_backend()}", flush=True)
    shapes = [(14, 72, 128, 320), (14, 36, 64, 640), (14, 18, 32, 1280),
              (129024, 320), (14, 9216, 320)]
    for shape in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        mb = x.size * 2 / 1e6
        for name, fn, passes in VARIANTS:
            if name == "reduce_lastd" and len(shape) == 2:
                continue
            ms = timeit(fn, x, args.iters)
            print(f"{str(shape):22s} {name:12s} {ms:7.3f} ms "
                  f"({passes * mb / ms:.0f} GB/s eff)", flush=True)


if __name__ == "__main__":
    main()
