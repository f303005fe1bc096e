"""Long-video flagship benchmark: 125-frame windowed keypoint generation.

The reference's flagship long-video workload
(/root/reference/MOFA-Video-Keypoint/pipeline/svdxt_pipeline_ctrlnet_loop.py:426-511):
125 frames, sliding window 25 / stride 12 (10 views), 25 Euler steps,
384x384, value/count window averaging — through the production
KeypointPipeline in small-programs mode (host-driven loop of one compiled
window-step program; tunnel-safe program durations).

Reports STEADY-STATE time (second in-process run; per-process compile
cache warm) separately from compile+first, for each --window_batch value:
wb=1 (one window per UNet call, 250 program dispatches) vs wb=5 (five
windows stacked on the batch axis, 50 dispatches of one 5x-wide program).

Params are eval_shape-materialized bf16 fills (TPU timing is
data-independent; real initializers cost minutes of tunnel compile).

Usage: python -u tools/bench_longvideo.py [--t 125 --size 384 --wb 1,5]
Prints one JSON line. Run in background with a generous timeout and NEVER
kill mid-compile (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as bench_mod  # noqa: F401  (tunnel probe helpers, no side effects)

import jax
import jax.numpy as jnp


def materialize_ldmk_bundle(h, w, t_window, dtype, tiny=False):
    """ModelBundle (UNet + Ldmk adapter + VAE + CLIP) with filled params."""
    from mofa_tpu.models.svd_unet import (SVDUNetConfig, MICRO_UNET_CONFIG,
                                          UNetSpatioTemporalConditionModel)
    from mofa_tpu.models.vae import (VAEConfig, TINY_VAE_CONFIG,
                                     AutoencoderKLTemporalDecoder)
    from mofa_tpu.models.clip_vision import (CLIPVisionConfig, TINY_CLIP_CONFIG,
                                             CLIPVisionModelWithProjection)
    from mofa_tpu.models.mofa_adapter import LdmkFlowControlNet
    from mofa_tpu.pipelines.common import ModelBundle

    if tiny:
        ucfg, vcfg, ccfg = MICRO_UNET_CONFIG, TINY_VAE_CONFIG, TINY_CLIP_CONFIG
    else:
        ucfg, vcfg, ccfg = SVDUNetConfig(), VAEConfig(), CLIPVisionConfig()
    unet = UNetSpatioTemporalConditionModel(ucfg)
    cn = LdmkFlowControlNet(ucfg)
    vae = AutoencoderKLTemporalDecoder(vcfg)
    clip = CLIPVisionModelWithProjection(ccfg)

    key = jax.random.PRNGKey(0)
    tw = t_window
    sample = jnp.zeros((1, tw, h // 8, w // 8, ucfg.in_channels), dtype)
    ehs = jnp.zeros((1, 1, ucfg.cross_attention_dim), dtype)
    ids = jnp.zeros((1, 3), dtype)
    cond = jnp.zeros((1, h, w, 3), dtype)
    flow = jnp.zeros((1, tw - 1, h, w, 2), dtype)
    lmk = jnp.zeros((1, tw, h, w, 3), dtype)

    shapes = {
        "unet": jax.eval_shape(unet.init, key, sample, 1.0, ehs, ids),
        "cn": jax.eval_shape(cn.init, key, sample, 1.0, ehs, ids,
                             cond, flow, lmk),
        "vae": jax.eval_shape(
            lambda k, x: vae.init(k, x, 1), key, jnp.zeros((1, h, w, 3), dtype)),
        "clip": jax.eval_shape(
            clip.init, key,
            jnp.zeros((1, ccfg.image_size, ccfg.image_size, 3), dtype)),
    }
    fill = lambda tree: jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01,
                           dtype if jnp.issubdtype(s.dtype, jnp.floating)
                           else s.dtype), tree)
    p = {k: fill(v) for k, v in shapes.items()}
    jax.block_until_ready(p)
    return ModelBundle(unet, p["unet"], cn, p["cn"], vae, p["vae"],
                       clip, p["clip"])


def fence(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--t", type=int, default=125)
    ap.add_argument("--window", type=int, default=25)
    ap.add_argument("--stride", type=int, default=12)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--wb", default="1,5", help="comma list of window_batch")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--no_offload", action="store_true",
                    help="keep VAE/CLIP resident during denoise")
    args = ap.parse_args()

    bench_mod._maybe_force_cpu()
    log = lambda m: print(m, file=sys.stderr, flush=True)

    from mofa_tpu.pipelines.keypoint import KeypointPipeline

    h = w = args.size if not args.tiny else 64
    t, steps = (args.t, args.steps) if not args.tiny else (8, 2)
    window, stride = (args.window, args.stride) if not args.tiny else (4, 2)
    dtype = jnp.bfloat16

    t0 = time.perf_counter()
    bundle = materialize_ldmk_bundle(h, w, window, dtype, tiny=args.tiny)
    log(f"param materialize {time.perf_counter()-t0:.1f}s")

    pipe = KeypointPipeline(bundle, big_program=False)
    image01 = jnp.full((1, h, w, 3), 0.5, dtype)
    flow = jnp.zeros((1, t - 1, h, w, 2), dtype)
    ldmk = jnp.full((1, t, h, w, 3), 0.25, dtype)

    results = {"offload_encoders": not args.no_offload}
    for wb in [int(x) for x in args.wb.split(",")]:
        times = []
        try:
            for rep in range(2):
                tr = time.perf_counter()
                frames, _ = pipe(image01, flow, ldmk,
                                 window_size=window, stride=stride,
                                 num_inference_steps=steps,
                                 key=jax.random.PRNGKey(42), window_batch=wb,
                                 offload_encoders=not args.no_offload)
                fence(frames)
                times.append(time.perf_counter() - tr)
                log(f"wb={wb} rep={rep}: {times[-1]:.1f}s")
        except Exception as e:  # noqa: BLE001 — keep the other legs' numbers
            # (2026-08-20: wb=5 at 512^2 OOM'd at compile WITHOUT offload —
            # 16.03G of 15.75G HBM — and took the whole run's JSON with it)
            results[f"wb{wb}_error"] = " | ".join(
                l.strip() for l in str(e).splitlines()[:4])[:400]
            continue
        results[f"wb{wb}_first_s"] = round(times[0], 1)
        results[f"wb{wb}_steady_s"] = round(times[1], 1)
        results[f"wb{wb}_steady_fps"] = round(t / times[1], 3)

    print(json.dumps({
        "metric": "longvideo_steady_seconds",
        "config": f"{t}f w{window}/s{stride} {steps}step {h}x{w} bf16",
        **results}), flush=True)


if __name__ == "__main__":
    main()
