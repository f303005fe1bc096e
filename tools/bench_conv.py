"""Microbench: fused GN-apply+SiLU+conv3x3 Pallas kernel vs XLA chain.

Shapes are the SVD UNet resnet sites at the bench config (576x1024,
CFG2 x T7 -> N=14). Compares:
- xla_chain: silu(x*a+b) -> conv3x3 -> +bias +temb  (what XLA runs today)
- xla_conv:  conv3x3 only (the conv floor)
- fused:     kernels/conv_fused.gn_silu_conv3x3
- fused_sums: same + emitted channel sums (next norm's stats for free)

Usage: python -u tools/bench_conv.py > /tmp/conv_bench.txt 2>&1  (bg, no kill)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mofa_tpu.kernels.conv_fused import gn_silu_conv3x3, _ref_chain


def timeit(fn, args, iters=30):
    @jax.jit
    def run(*args):
        def body(c, _):
            o = fn(args[0] + c.astype(args[0].dtype), *args[1:])
            if isinstance(o, tuple):
                o = o[0]
            return jnp.float32(jnp.sum(o.astype(jnp.float32)) * 1e-30), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c
    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    shapes = [(14, 72, 128, 320, 320), (14, 36, 64, 640, 640),
              (14, 72, 128, 320, 320)]
    for idx, (n, h, w, c, o) in enumerate(shapes):
        ks = jax.random.split(jax.random.PRNGKey(idx), 8)
        x = jax.random.normal(ks[0], (n, h, w, c), jnp.bfloat16)
        a = jax.random.normal(ks[1], (n, c), jnp.float32) * 0.1 + 1.0
        b = jax.random.normal(ks[2], (n, c), jnp.float32) * 0.1
        wk = (jax.random.normal(ks[3], (3, 3, c, o), jnp.float32) * 0.02)
        bias = jax.random.normal(ks[4], (o,), jnp.float32) * 0.1
        tb = jax.random.normal(ks[5], (n, o), jnp.float32) * 0.1

        flops = 2 * n * h * w * 9 * c * o / 1e12

        ms = timeit(lambda x: jax.lax.conv_general_dilated(
            x, wk.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16), (x,))
        print(f"[{n},{h},{w},{c}]->{o} xla_conv   {ms:7.3f} ms "
              f"({flops/ms*1e3:.0f} TF/s)", flush=True)

        ms = timeit(lambda x: _ref_chain(x, a, b, wk, bias, tb, None, True),
                    (x,))
        print(f"[{n},{h},{w},{c}]->{o} xla_chain  {ms:7.3f} ms "
              f"({flops/ms*1e3:.0f} TF/s)", flush=True)

        ms = timeit(lambda x: gn_silu_conv3x3(x, a, b, wk, bias, tb, None,
                                              True, False), (x,))
        print(f"[{n},{h},{w},{c}]->{o} fused      {ms:7.3f} ms "
              f"({flops/ms*1e3:.0f} TF/s)", flush=True)

        ms = timeit(lambda x: gn_silu_conv3x3(x, a, b, wk, bias, tb, None,
                                              True, True), (x,))
        print(f"[{n},{h},{w},{c}]->{o} fused_sums {ms:7.3f} ms "
              f"({flops/ms*1e3:.0f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
