"""Device-trace the frozen-UNet denoise forward and print per-op times.

Captures a jax.profiler trace of the bench-shape UNet forward on the
real chip and parses the XPlane protobuf (via tensorboard_plugin_profile)
into a per-fusion/per-op time table — the precise attribution behind the
ablation numbers in tools/profile_step.py.

Usage: python -u tools/trace_step.py [--t 7] [--iters 3] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def parse_xplane(logdir: str, top: int = 40, full_names: bool = False):
    """Sum device-plane event durations by HLO op name.

    full_names=True keeps the unique HLO instruction name (e.g.
    convert_reduce_fusion.123) so individual ops can be matched against
    the dumped optimized HLO text for shape attribution."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    import re

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    totals = defaultdict(float)
    counts = defaultdict(int)
    device_total = 0.0
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            ev_names = plane.event_metadata
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    hlo = ev_names[ev.metadata_id].name
                    if full_names:
                        name = hlo.lstrip("%")
                    else:
                        # "%convolution_add_fusion.30 = ..." -> op category
                        m = re.match(r"%([a-zA-Z_-]+)", hlo)
                        name = m.group(1).rstrip(".") if m else hlo[:40]
                    dur = ev.duration_ps / 1e9  # ps -> ms
                    totals[name] += dur
                    counts[name] += 1
                    device_total += dur
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    width = max((len(n) for n, _ in rows), default=10)
    print(f"{'op':{width}s} {'ms':>10s} {'count':>7s} {'%':>6s}")
    for name, ms in rows:
        print(f"{name:{width}s} {ms:10.3f} {counts[name]:7d} "
              f"{100 * ms / max(device_total, 1e-9):6.2f}")
    print(f"device events total: {device_total:.1f} ms "
          f"across {len(totals)} distinct ops")
    return totals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=7)
    ap.add_argument("--h", type=int, default=576)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/mofa_trace")
    ap.add_argument("--parse_only", action="store_true")
    ap.add_argument("--full_names", action="store_true",
                    help="per-instruction table (match against --hlo_out)")
    ap.add_argument("--hlo_out", default="",
                    help="dump optimized HLO text here (same-process "
                         "compile cache makes this nearly free)")
    args = ap.parse_args()

    if args.parse_only:
        parse_xplane(args.logdir, args.top, args.full_names)
        return

    from mofa_tpu.models.svd_unet import (SVDUNetConfig,
                                          UNetSpatioTemporalConditionModel)

    cfg = SVDUNetConfig()
    dtype = jnp.bfloat16
    t, h, w = args.t, args.h, args.w
    unet = UNetSpatioTemporalConditionModel(cfg)
    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, t, h // 8, w // 8, cfg.in_channels), dtype)
    ehs = jnp.zeros((1, 1, cfg.cross_attention_dim), dtype)
    ids = jnp.zeros((1, 3), dtype)

    # timing is data-independent on TPU: materialize the param tree from
    # eval_shape (no initializer compile — real init costs ~260 s over the
    # axon tunnel)
    t0 = time.perf_counter()
    shapes = jax.eval_shape(unet.init, key, sample, 1.0, ehs, ids)
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01,
                           dtype if jnp.issubdtype(s.dtype, jnp.floating)
                           else s.dtype), shapes)
    jax.block_until_ready(params)
    print(f"init {time.perf_counter() - t0:.0f}s", flush=True)

    lat2 = jnp.zeros((2, t, h // 8, w // 8, 8), dtype)
    ehs2 = jnp.zeros((2, 1, cfg.cross_attention_dim), dtype)
    ids2 = jnp.zeros((2, 3), dtype)

    @jax.jit
    def fwd_jit(params, lat):
        return jnp.float32(jnp.sum(
            unet.apply(params, lat, 500.0, ehs2, ids2).astype(jnp.float32)))

    t0 = time.perf_counter()
    if args.hlo_out:
        # AOT: one compile serves both the HLO text dump and the run
        compiled = fwd_jit.lower(params, lat2).compile()
        with open(args.hlo_out, "w") as f:
            f.write(compiled.as_text())
        print(f"optimized HLO -> {args.hlo_out}", flush=True)
        fwd = compiled
    else:
        fwd = fwd_jit
    float(fwd(params, lat2))
    print(f"compile+warmup {time.perf_counter() - t0:.0f}s", flush=True)

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    for _ in range(args.iters):
        out = fwd(params, lat2)
    float(out)
    jax.profiler.stop_trace()
    print("trace captured", flush=True)
    parse_xplane(args.logdir, args.top, args.full_names)


if __name__ == "__main__":
    main()
