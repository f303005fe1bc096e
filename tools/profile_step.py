"""Ablation profiler for the denoise step on the real chip.

Times the frozen-UNet and adapter forward passes separately at the bench
shape (576x1024, CFG2 x T frames), optionally with spatial attention
stubbed to identity, to attribute step time between attention and the
conv/temporal stack. Each measurement is its own jit program; results
print immediately (run with `python -u tools/profile_step.py`).

Usage: python -u tools/profile_step.py [--t 7] [--what unet cn unet_noattn cn_noattn]
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
    ap.add_argument("--t", type=int, default=7)
    ap.add_argument("--h", type=int, default=576)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--what", nargs="+",
                    default=["unet", "unet_noattn"],
                    choices=["unet", "cn", "unet_noattn", "cn_noattn",
                             "unet_nospatial", "unet_notemporal"])
    args = ap.parse_args()

    from mofa_tpu.models.svd_unet import (SVDUNetConfig,
                                          UNetSpatioTemporalConditionModel)
    from mofa_tpu.models.mofa_adapter import FlowControlNet
    import mofa_tpu.kernels.attention as katt

    cfg = SVDUNetConfig()
    dtype = jnp.bfloat16
    t, h, w = args.t, args.h, args.w
    unet = UNetSpatioTemporalConditionModel(cfg)
    cn = FlowControlNet(cfg)
    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, t, h // 8, w // 8, cfg.in_channels), dtype)
    ehs = jnp.zeros((1, 1, cfg.cross_attention_dim), dtype)
    ids = jnp.zeros((1, 3), dtype)
    cond = jnp.zeros((1, h, w, 3), dtype)
    flow = jnp.zeros((1, t - 1, h, w, 2), dtype)

    # timing is data-independent on TPU: materialize params from eval_shape
    # (the real init programs cost minutes to compile over the axon tunnel)
    fill = lambda tree: jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01,
                           dtype if jnp.issubdtype(s.dtype, jnp.floating)
                           else s.dtype), tree)
    t0 = time.perf_counter()
    up = fill(jax.eval_shape(unet.init, key, sample, 1.0, ehs, ids))
    jax.block_until_ready(up)
    print(f"unet params {time.perf_counter()-t0:.0f}s", flush=True)
    cp = None
    if any(x.startswith("cn") for x in args.what):
        t0 = time.perf_counter()
        cp = fill(jax.eval_shape(cn.init, key, sample, 1.0, ehs, ids, cond, flow))
        jax.block_until_ready(cp)
        print(f"cn params {time.perf_counter()-t0:.0f}s", flush=True)

    lat2 = jnp.zeros((2, t, h // 8, w // 8, 8), dtype)
    ehs2 = jnp.zeros((2, 1, cfg.cross_attention_dim), dtype)
    ids2 = jnp.zeros((2, 3), dtype)

    def timeit(fn, params, iters):
        # params ride as jit ARGS — closing over them would embed GBs of
        # constants into the lowered program and blow up compile time
        @jax.jit
        def run(params, lat):
            def body(c, _):
                o = fn(params, lat + c.astype(dtype))
                return jnp.float32(jnp.sum(o.astype(jnp.float32)) * 1e-30), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c
        t0 = time.perf_counter()
        float(run(params, lat2))
        print(f"  compile+warmup {time.perf_counter()-t0:.0f}s", flush=True)
        t0 = time.perf_counter()
        float(run(params, lat2))
        return (time.perf_counter() - t0) / iters * 1e3

    def unet_fn(params, lat):
        return unet.apply(params, lat, 500.0, ehs2, ids2)

    inject = None
    if cp is not None:
        cond2 = jnp.zeros((2, h, w, 3), dtype)
        flow2 = jnp.zeros((2, t - 1, h, w, 2), dtype)
        inject = jax.block_until_ready(jax.jit(
            lambda p, c, f: cn.apply(p, c, f,
                                     method=FlowControlNet.encode_features)
        )(cp, cond2, flow2))

    def cn_fn(params, lat):
        d, m = cn.apply(params, lat, 500.0, ehs2, ids2,
                        precomputed_features=inject)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in d) \
            + jnp.sum(m.astype(jnp.float32))

    orig = katt.dot_product_attention
    ident = lambda q, k, v: v if q.shape[1] == k.shape[1] else orig(q, k, v)
    # temporal self-attn sequences are frame-length (short); spatial are HW
    no_spatial = lambda q, k, v: (v if q.shape[1] == k.shape[1]
                                  and q.shape[1] >= 64 else orig(q, k, v))
    no_temporal = lambda q, k, v: (v if q.shape[1] == k.shape[1]
                                   and q.shape[1] < 64 else orig(q, k, v))
    stubs = {"_noattn": ident, "_nospatial": no_spatial,
             "_notemporal": no_temporal}
    for what in args.what:
        katt.dot_product_attention = next(
            (fn for suf, fn in stubs.items() if what.endswith(suf)), orig)
        fn, params = ((unet_fn, up) if what.startswith("unet")
                      else (cn_fn, cp))
        ms = timeit(fn, params, args.iters)
        print(f"{what}: {ms:.1f} ms", flush=True)
    katt.dot_product_attention = orig


if __name__ == "__main__":
    main()
