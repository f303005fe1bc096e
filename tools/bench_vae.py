"""Time the chunked temporal VAE decode at the bench shape.

The driver bench measures the denoise hot loop; this measures the other
big e2e phase (pipeline.py:194-220 equivalent): 25 frames of 576x1024
latents decoded in chunks on one chip.

Usage: python -u tools/bench_vae.py [--t 25] [--chunk 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=25)
    ap.add_argument("--h", type=int, default=576)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from mofa_tpu.models.vae import AutoencoderKLTemporalDecoder, VAEConfig

    dtype = jnp.bfloat16
    vae = AutoencoderKLTemporalDecoder(VAEConfig())
    lat1 = jnp.zeros((args.chunk, args.h // 8, args.w // 8, 4), dtype)
    t0 = time.perf_counter()
    params = jax.jit(lambda k: vae.init(
        k, lat1, args.chunk, method=AutoencoderKLTemporalDecoder.decode))(
        jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, params)
    jax.block_until_ready(params)
    print(f"init {time.perf_counter() - t0:.0f}s", flush=True)

    @jax.jit
    def dec(vp, chunk):
        out = vae.apply(vp, chunk, chunk.shape[0],
                        method=AutoencoderKLTemporalDecoder.decode)
        return jnp.float32(jnp.sum(out.astype(jnp.float32)))

    lat = jnp.zeros((args.t, args.h // 8, args.w // 8, 4), dtype)
    chunks = [lat[i:i + args.chunk] for i in range(0, args.t, args.chunk)]
    t0 = time.perf_counter()
    acc = 0.0
    for c in chunks:
        acc += float(dec(params, c))
    print(f"compile+first decode ({len(chunks)} chunks) "
          f"{time.perf_counter() - t0:.0f}s", flush=True)

    for _ in range(args.reps):
        t0 = time.perf_counter()
        acc = 0.0
        for c in chunks:
            acc += float(dec(params, c))
        dt = time.perf_counter() - t0
        print(f"decode {args.t}f {args.h}x{args.w} chunk={args.chunk}: "
              f"{dt:.2f}s ({args.t / dt:.2f} frames/s)", flush=True)


if __name__ == "__main__":
    main()
