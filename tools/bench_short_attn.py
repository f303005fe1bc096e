"""Microbench short-sequence attention: Pallas kernel vs packed-XLA.

Shapes are the SVD temporal self-attention sites at the 576x1024 bench
config (CFG2 x T7) and the keypoint window (T25).

Usage: python -u tools/bench_short_attn.py > /tmp/short_attn.txt 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mofa_tpu.kernels.attention import _packed_short_attention
from mofa_tpu.kernels.short_attention import short_attention


def timeit(fn, args, iters=30):
    @jax.jit
    def run(a):
        def body(c, _):
            x = (a[0] + c.astype(a[0].dtype),) + a[1:]
            o = fn(*x)
            return jnp.float32(jnp.sum(o.astype(jnp.float32)) * 1e-30), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c
    try:
        float(run(args))
    except Exception as e:  # noqa: BLE001
        return None, str(e).splitlines()[0][:100]
    t0 = time.perf_counter()
    float(run(args))
    return (time.perf_counter() - t0) / iters * 1e3, None


def main():
    shapes = [
        ("/8  T7 H5", (2 * 9216, 7, 5, 64)),
        ("/16 T7 H10", (2 * 2304, 7, 10, 64)),
        ("/32 T7 H20", (2 * 576, 7, 20, 64)),
        ("kp  T25 H5", (2 * 2304, 25, 5, 64)),
    ]
    key = jax.random.PRNGKey(0)
    for name, shape in shapes:
        ks = jax.random.split(key, 3)
        q, k, v = (jax.random.normal(kk, shape, jnp.bfloat16) for kk in ks)
        mb = q.size * 2 / 1e6
        variants = [(f"pallas br{br}{' fx' if fx else '   '}",
                     (lambda br_, fx_: lambda a, b, c: short_attention(
                         a, b, c, br_, fx_))(br, fx))
                    for br in (112, 224, 336)
                    for fx in (False, True)]
        variants.append(("packed", _packed_short_attention))
        for label, fn in variants:
            ms, err = timeit(fn, (q, k, v))
            if ms is None:
                print(f"{name} {label}: FAILED {err}", flush=True)
            else:
                print(f"{name} {label}: {ms:7.3f} ms "
                      f"({4 * mb / ms:.0f} GB/s qkv+out)", flush=True)


def main_tmajor():
    """Spatial-major (transpose-free) kernel vs the full classic path
    (transpose -> kernel -> transpose), at the same temporal sites. The
    classic leg measures what the UNet actually pays today."""
    from mofa_tpu.kernels.short_attention import short_attention_tmajor

    shapes = [  # (label, B (cfg x videos), T, S, H, D)
        ("/8  T7 H5", 2, 7, 9216, 5, 64),
        ("/16 T7 H10", 2, 7, 2304, 10, 64),
        ("/32 T7 H20", 2, 7, 576, 20, 64),
        ("kp  T25 H5", 2, 25, 2304, 5, 64),
    ]
    key = jax.random.PRNGKey(1)
    from mofa_tpu.kernels.short_attention import tmajor_vmem_estimate
    for name, b, t, s, h, d in shapes:
        ks = jax.random.split(key, 3)
        q2, k2, v2 = (jax.random.normal(kk, (b * t, s, h * d), jnp.bfloat16)
                      for kk in ks)
        mb = q2.size * 2 / 1e6
        # print the dispatch gate's scoped-vmem estimate next to the
        # measured run so every new shape adds an est-vs-actual anchor to
        # the calibrated heuristic: if a shape passes the gate here but
        # FAILS Mosaic allocation, the 14 MB margin needs tightening
        est = tmajor_vmem_estimate(t, h * d, q2.dtype.itemsize)
        print(f"{name}: vmem_ok est {est / 1e6:.1f} MB "
              f"(gate passes: {est <= 14 * 1024 * 1024})", flush=True)

        def classic(a, b_, c, b=b, t=t, s=s, h=h, d=d):
            def tr(x):
                return (x.reshape(b, t, s, h, d).transpose(0, 2, 1, 3, 4)
                        .reshape(b * s, t, h, d))
            o = short_attention(tr(a), tr(b_), tr(c), 0, True)
            return (o.reshape(b, s, t, h * d).transpose(0, 2, 1, 3)
                    .reshape(b * t, s, h * d))

        for label, fn in [
            ("tmajor fx", lambda a, b_, c: short_attention_tmajor(
                a, b_, c, t, h, 0, True)),
            ("classic(+2transposes) fx", classic),
        ]:
            ms, err = timeit(fn, (q2, k2, v2))
            if ms is None:
                print(f"{name} {label}: FAILED {err}", flush=True)
            else:
                print(f"{name} {label}: {ms:7.3f} ms "
                      f"({4 * mb / ms:.0f} GB/s qkv+out)", flush=True)


if __name__ == "__main__":
    if "--tmajor" in sys.argv:
        main_tmajor()
    else:
        main()
