"""Microbench fused LN+GEGLU-FFN Pallas kernel vs unfused XLA at SVD shapes.

Shapes are the FF sites in the bench config (576x1024, CFG2 x T7):
spatial blocks see [B*T, HW, C] flattened to rows=B*T*HW; temporal blocks
see rows=B*HW*T. Usage:
  python -u tools/bench_ffn.py > /tmp/ffn.txt 2>&1   (background, no kill)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mofa_tpu.kernels.geglu_ffn import (ln_geglu_ffn, _ln_ffn_ref,
                                        _ln_ffn_fwd, _BLOCK_ROWS)


def _kernel_variant(pipelined):
    def fn(x, ls, lb, w0, b0, w2, b2):
        dt = x.dtype
        return _ln_ffn_fwd(x, ls.astype(jnp.float32), lb.astype(jnp.float32),
                           w0.astype(dt), b0.astype(dt), w2.astype(dt),
                           b2.astype(dt), pipelined=pipelined)
    return fn


def timeit(fn, args, iters=30):
    @jax.jit
    def run(a):
        def body(c, _):
            x = (a[0] + c.astype(a[0].dtype),) + a[1:]
            o = fn(*x)
            return jnp.float32(jnp.sum(o.astype(jnp.float32)) * 1e-30), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c
    float(run(args))
    t0 = time.perf_counter()
    float(run(args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    # (rows, C): spatial 320 @ /8 = 14*72*128; 640 @ /16 = 14*36*64;
    # temporal 320 = 2*72*128 tokens x 7 frames
    shapes = [(14 * 72 * 128, 320), (14 * 36 * 64, 640), (2 * 72 * 128 * 7, 320)]
    for rows, c in shapes:
        rows = (rows // _BLOCK_ROWS[c]) * _BLOCK_ROWS[c]
        i = 4 * c
        ks = jax.random.split(jax.random.PRNGKey(0), 7)
        x = jax.random.normal(ks[0], (rows, c), jnp.bfloat16)
        ls = 1 + 0.1 * jax.random.normal(ks[1], (c,), jnp.float32)
        lb = 0.1 * jax.random.normal(ks[2], (c,), jnp.float32)
        w0 = (jax.random.normal(ks[3], (c, 2 * i), jnp.float32) * 0.05)
        b0 = jax.random.normal(ks[4], (2 * i,), jnp.float32) * 0.05
        w2 = jax.random.normal(ks[5], (i, c), jnp.float32) * 0.05
        b2 = jax.random.normal(ks[6], (c,), jnp.float32) * 0.05
        args = (x, ls, lb, w0, b0, w2, b2)
        mb = x.size * 2 / 1e6
        if jax.default_backend() == "tpu":
            import numpy as np
            a = np.asarray(_kernel_variant(False)(*args), np.float32)
            b = np.asarray(_kernel_variant(True)(*args), np.float32)
            err = float(np.max(np.abs(a - b)))
            print(f"rows={rows:7d} C={c} pipe-vs-plain max abs err {err:.2e}",
                  flush=True)
            assert err < 1e-2, "pipelined kernel diverges"
        for name, fn in [("fused", _kernel_variant(False)),
                         ("fused_pipe", _kernel_variant(True)),
                         ("unfused", _ln_ffn_ref)]:
            ms = timeit(fn, args)
            print(f"rows={rows:7d} C={c} {name:8s} {ms:7.3f} ms "
                  f"({2 * mb / ms:.0f} GB/s eff)", flush=True)


if __name__ == "__main__":
    main()
