"""Full-resolution (576x1024) deployment timings for the two remaining
workloads: the ldmk (occlusion-head) adapter via KeypointPipeline and the
dual-adapter HybridPipeline — deployment honesty that both fit a 16 GB
v5e chip with cfg_split (the traj number already lives in bench_e2e.py).

Reference semantics being timed:
- ldmk windowed pipeline: /root/reference/MOFA-Video-Keypoint/pipeline/
  svdxt_pipeline_ctrlnet_loop.py:287-511 (here at T=25 == window 25, the
  single-window degenerate case, i.e. hybrid-app-shaped lengths at the
  SVD native resolution).
- dual-adapter: /root/reference/MOFA-Video-Hybrid/pipeline/pipeline.py:
  446-511 (face + drag adapters, per-resolution mask blend).

Params are eval_shape-materialized bf16 fills (TPU timing is
data-independent); fences are scalar device->host fetches. Programs are
kept small (host-driven window steps / step_chunk) so nothing exceeds the
tunnel's ~40 s program-kill threshold.

Usage: python -u tools/bench_fullres.py [--h 576 --w 1024 --t 25
       --steps 25] [--tiny] [--only ldmk|dual]
Prints one JSON line. Run in background, generous timeout, never kill
mid-compile (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as bench_mod  # tunnel probe / platform forcing

import jax
import jax.numpy as jnp


def fence(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def log(m):
    print(m, file=sys.stderr, flush=True)


def _fill(tree, dtype):
    return jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01,
                           dtype if jnp.issubdtype(s.dtype, jnp.floating)
                           else s.dtype), tree)


def materialize(h, w, t, dtype, tiny, dual):
    """ModelBundle with a ldmk adapter (+ a drag adapter when dual)."""
    from mofa_tpu.models.svd_unet import (SVDUNetConfig, MICRO_UNET_CONFIG,
                                          UNetSpatioTemporalConditionModel)
    from mofa_tpu.models.vae import (VAEConfig, TINY_VAE_CONFIG,
                                     AutoencoderKLTemporalDecoder)
    from mofa_tpu.models.clip_vision import (CLIPVisionConfig,
                                             TINY_CLIP_CONFIG,
                                             CLIPVisionModelWithProjection)
    from mofa_tpu.models.mofa_adapter import FlowControlNet, LdmkFlowControlNet
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
    sample = jnp.zeros((1, t, h // 8, w // 8, ucfg.in_channels), dtype)
    ehs = jnp.zeros((1, 1, ucfg.cross_attention_dim), dtype)
    ids = jnp.zeros((1, 3), dtype)
    cond = jnp.zeros((1, h, w, 3), dtype)
    flow = jnp.zeros((1, t - 1, h, w, 2), dtype)
    lmk = jnp.zeros((1, t, h, w, 3), dtype)

    shapes = {
        "unet": jax.eval_shape(unet.init, key, sample, 1.0, ehs, ids),
        "cn": jax.eval_shape(cn.init, key, sample, 1.0, ehs, ids,
                             cond, flow, lmk),
        "vae": jax.eval_shape(
            lambda k, x: vae.init(k, x, 1), key,
            jnp.zeros((1, h, w, 3), dtype)),
        "clip": jax.eval_shape(
            clip.init, key,
            jnp.zeros((1, ccfg.image_size, ccfg.image_size, 3), dtype)),
    }
    p = {k: _fill(v, dtype) for k, v in shapes.items()}
    kw = {}
    if dual:
        cn2 = FlowControlNet(ucfg)
        cn2_shapes = jax.eval_shape(cn2.init, key, sample, 1.0, ehs, ids,
                                    cond, flow)
        kw = dict(controlnet2=cn2,
                  controlnet2_params=_fill(cn2_shapes, dtype))
    jax.block_until_ready(p)
    return ModelBundle(unet, p["unet"], cn, p["cn"], vae, p["vae"],
                       clip, p["clip"], **kw)


def timed(label, fn, n=2):
    tc = time.perf_counter()
    fence(fn())
    compile_s = time.perf_counter() - tc
    reps = []
    for _ in range(n):
        ts = time.perf_counter()
        out = fn()
        fence(out)
        reps.append(time.perf_counter() - ts)
    steady = statistics.median(reps)
    log(f"{label}: compile+first {compile_s:.2f}s, steady {steady:.3f}s "
        f"({[round(r, 3) for r in reps]})")
    return compile_s, steady, out


def run_ldmk(h, w, t, steps, chunk, dtype, tiny):
    """Single-window keypoint pipeline (the ldmk adapter with occlusion
    heads) at full res, small-programs + cfg_split."""
    from mofa_tpu.pipelines.keypoint import KeypointPipeline
    t0 = time.perf_counter()
    bundle = materialize(h, w, t, dtype, tiny, dual=False)
    log(f"ldmk params materialized {time.perf_counter()-t0:.1f}s")
    pipe = KeypointPipeline(bundle, big_program=False)
    image01 = jnp.full((1, h, w, 3), 0.5, dtype)
    flow = jnp.zeros((1, t - 1, h, w, 2), dtype)
    ldmk = jnp.full((1, t, h, w, 3), 0.25, dtype)
    kw = dict(window_size=t, stride=max(t // 2, 1),
              num_inference_steps=steps, decode_chunk_size=chunk,
              key=jax.random.PRNGKey(42), cfg_split=True)
    _, den, lat = timed(
        f"ldmk denoise T={t} x{steps} {h}x{w} cfg_split",
        lambda: pipe(image01, flow, ldmk, output_type="latent", **kw)[0])
    from mofa_tpu.pipelines.common import decode_latents_jit
    _, dec, _ = timed("ldmk decode",
                      lambda: decode_latents_jit(bundle, lat, chunk))
    del bundle, pipe
    return {"ldmk_denoise_s": round(den, 3), "ldmk_decode_s": round(dec, 3),
            "ldmk_e2e_s": round(den + dec, 3)}


def run_dual(h, w, t, steps, chunk, dtype, tiny, step_chunk, offload=True,
             quant=False):
    """Dual-adapter hybrid pipeline at full res, cfg_split + step_chunk.

    offload: phase-scoped VAE/CLIP residency (frees ~1.36 GB bf16 during
    the denoise loop; bit-identical outputs). quant: int8 weight-only
    storage for the frozen UNet + both adapters (core/quant.py)."""
    from mofa_tpu.pipelines.hybrid import HybridPipeline
    from mofa_tpu.pipelines.common import decode_latents_jit
    t0 = time.perf_counter()
    bundle = materialize(h, w, t, dtype, tiny, dual=True)
    if quant:
        from mofa_tpu.core.quant import quantize_tree
        bundle.unet_params = quantize_tree(bundle.unet_params)
        bundle.controlnet_params = quantize_tree(bundle.controlnet_params)
        bundle.controlnet2_params = quantize_tree(bundle.controlnet2_params)
        jax.block_until_ready((bundle.unet_params, bundle.controlnet_params,
                               bundle.controlnet2_params))
    log(f"dual params materialized {time.perf_counter()-t0:.1f}s "
        f"(offload={offload} quant={quant})")
    pipe = HybridPipeline(bundle)
    image01 = jnp.full((1, h, w, 3), 0.5, dtype)
    flow = jnp.zeros((1, t - 1, h, w, 2), dtype)
    drag = jnp.zeros((1, t - 1, h, w, 2), dtype)
    ldmk = jnp.full((1, t, h, w, 3), 0.25, dtype)
    mask = jnp.ones((1, h, w, 1), dtype)
    kw = dict(num_inference_steps=steps, decode_chunk_size=chunk,
              key=jax.random.PRNGKey(42), cfg_split=True,
              step_chunk=step_chunk, offload_encoders=offload)
    _, den, lat = timed(
        f"dual denoise T={t} x{steps} {h}x{w} cfg_split sc={step_chunk}",
        lambda: pipe(image01, flow, drag, ldmk, mask,
                     output_type="latent", **kw)[0])
    _, dec, _ = timed("dual decode",
                      lambda: decode_latents_jit(bundle, lat, chunk))
    del bundle, pipe
    return {"dual_denoise_s": round(den, 3), "dual_decode_s": round(dec, 3),
            "dual_e2e_s": round(den + dec, 3),
            "dual_offload": offload, "dual_quant": quant}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=576)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--t", type=int, default=25)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--step_chunk", type=int, default=2)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--only", choices=["ldmk", "dual"])
    ap.add_argument("--no_offload", action="store_true",
                    help="keep VAE/CLIP resident during denoise (r04 mode)")
    ap.add_argument("--quant", action="store_true",
                    help="int8 weight-only storage for UNet + adapters")
    args = ap.parse_args()
    bench_mod._maybe_force_cpu()
    dtype = jnp.bfloat16
    h, w = (args.h, args.w) if not args.tiny else (64, 64)
    t, steps = (args.t, args.steps) if not args.tiny else (5, 2)
    res = {"h": h, "w": w, "frames": t, "steps": steps,
           "dtype": str(jnp.dtype(dtype))}
    # a leg that dies (e.g. OOM) must not lose the other leg's numbers:
    # record the error string and keep going (2026-08-20: dual at
    # 576x1024/T=25 is ResourceExhausted on one 16 GB v5e — params alone
    # are ~8 GB bf16 with TWO adapters + CLIP resident)
    if args.only in (None, "ldmk"):
        try:
            res.update(run_ldmk(h, w, t, steps, args.chunk, dtype,
                                args.tiny))
        except Exception as e:  # noqa: BLE001
            res["ldmk_error"] = str(e).splitlines()[0][:160]
    if args.only in (None, "dual"):
        try:
            res.update(run_dual(h, w, t, steps, args.chunk, dtype,
                                args.tiny, args.step_chunk,
                                offload=not args.no_offload,
                                quant=args.quant))
        except Exception as e:  # noqa: BLE001
            # keep the allocator's requested/available byte counts — they
            # size the remaining gap when a leg OOMs
            msg = " | ".join(l.strip() for l in str(e).splitlines()[:6])
            res["dual_error"] = msg[:600]
    print(json.dumps({"metric": "fullres_ldmk_dual_seconds", **res}))


if __name__ == "__main__":
    main()
