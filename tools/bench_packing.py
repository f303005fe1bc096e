"""MXU contraction-depth probe: does K=64 matmul run at the K=128 rate?

Settles the "pack two 64-wide attention heads into one 128-wide
contraction" proposal for the flash kernel (head_dim=64 vs the 128-wide
systolic contraction). The packed formulation is block-diagonal:

  Q_packed [BQ, 128] = [q_h0 | q_h1]      (two heads' queries per row)
  K_packed [2BK, 128] = [[k_h0, 0], [0, k_h1]]
  logits   [BQ, 2BK] = Q_packed @ K_packed^T   (exact per-head logits)

MAC-slot count: BQ * 2BK * 128 — identical to two K=64 matmuls IF the
MXU pads a 64-deep contraction to the full 128 lanes (2 * BQ*BK*128
padded slots). The packing only wins if K=64 contractions run FASTER
than half-rate K=128 ones, i.e. if the hardware skips the padding.

Each timed iteration chains 64 dependent matmul+accumulate rounds so
compute dwarfs the ~0.6 ms fixed per-scan-iteration overhead of the
tunneled runtime (tools/bench_overhead.py).

Usage: python -u tools/bench_packing.py > /tmp/packing.txt 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ROUNDS = 64


def timeit(fn, args, iters=20):
    @jax.jit
    def run(a):
        def body(c, _):
            o = fn(c, *a)
            return o, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c
    float(run(args))
    t0 = time.perf_counter()
    float(run(args))
    return (time.perf_counter() - t0) / iters * 1e3


def chain(c, a, b):
    """64 dependent matmuls: each round perturbs `a` by the running
    scalar so XLA cannot hoist or CSE them."""
    def body(i, carry):
        s, a_ = a.dtype.type(0), a
        out = jax.lax.dot_general(
            a + carry.astype(a.dtype) * 1e-30, b,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        del s, a_
        return carry + out[0, 0] * 1e-30 + jnp.float32(1e-30) * out[-1, -1]
    return jax.lax.fori_loop(0, ROUNDS, body, c)


def main():
    key = jax.random.PRNGKey(0)
    m, n = 1024, 9216
    configs = [
        ("K=64 ", (m, 64), (64, n), 2 * m * 64 * n),
        ("K=128", (m, 128), (128, n), 2 * m * 128 * n),
        # packed block-diagonal: two heads' useful work = 2 * m*64*n
        ("packed", (m, 128), (128, 2 * n), 2 * m * 64 * n * 2),
    ]
    for name, sa, sb, useful_flops in configs:
        a = jax.random.normal(key, sa, jnp.bfloat16)
        b = jax.random.normal(key, sb, jnp.bfloat16)
        ms = timeit(chain, (a, b))
        tf = useful_flops * ROUNDS / ms / 1e9
        print(f"{name} [{sa[0]},{sa[1]}]x[{sb[0]},{sb[1]}] x{ROUNDS}: "
              f"{ms:8.3f} ms/iter -> {tf:.0f} useful GF/s", flush=True)


if __name__ == "__main__":
    main()
