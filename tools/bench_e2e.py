"""Honest single-chip END-TO-END benchmark: full 25-frame/25-step 576x1024
video through the production TrajPipeline — CMP sparse->dense flow
completion (384x384, part of reference inference: run_gradio.py:236-277),
CLIP+VAE encode, T=25 denoise (not the T=7 per-chip proxy bench.py times),
chunked VAE decode, frame postprocess — with per-phase attribution. Each
phase reports the MEDIAN of n_time post-warmup repetitions.

The reference deployment semantics being timed:
/root/reference/MOFA-Video-Traj/pipeline/pipeline.py:282-528 (25-step Euler
loop, chunked decode at decode_chunk_size=8, CFG linspace 1->3).

Params are eval_shape-materialized bf16 fills (TPU kernel timing is
data-independent; real initializers cost minutes of tunnel compile —
CLAUDE.md). Timing fences are scalar device->host fetches
(block_until_ready does not reliably block over the axon tunnel).

Usage: python -u tools/bench_e2e.py [--h 576 --w 1024 --t 25 --steps 25]
Prints one JSON line with the steady-state phase times; run in background
with a generous timeout and NEVER kill mid-compile.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as bench_mod  # tunnel probe / platform forcing (no import side effects)

import jax
import jax.numpy as jnp


def materialize_bundle(h, w, t, dtype, tiny=False):
    """ModelBundle with eval_shape-materialized filled params (no init compile)."""
    from mofa_tpu.models.svd_unet import (SVDUNetConfig, TINY_UNET_CONFIG,
                                          UNetSpatioTemporalConditionModel)
    from mofa_tpu.models.vae import (VAEConfig, TINY_VAE_CONFIG,
                                     AutoencoderKLTemporalDecoder)
    from mofa_tpu.models.clip_vision import (CLIPVisionConfig, TINY_CLIP_CONFIG,
                                             CLIPVisionModelWithProjection)
    from mofa_tpu.models.mofa_adapter import FlowControlNet
    from mofa_tpu.pipelines.common import ModelBundle

    if tiny:  # CPU smoke validation of the harness itself
        ucfg, vcfg, ccfg = TINY_UNET_CONFIG, TINY_VAE_CONFIG, TINY_CLIP_CONFIG
    else:
        ucfg, vcfg, ccfg = SVDUNetConfig(), VAEConfig(), CLIPVisionConfig()
    unet = UNetSpatioTemporalConditionModel(ucfg)
    cn = FlowControlNet(ucfg)
    vae = AutoencoderKLTemporalDecoder(vcfg)
    clip = CLIPVisionModelWithProjection(ccfg)

    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, t, h // 8, w // 8, ucfg.in_channels), dtype)
    ehs = jnp.zeros((1, 1, ucfg.cross_attention_dim), dtype)
    ids = jnp.zeros((1, 3), dtype)
    cond = jnp.zeros((1, h, w, 3), dtype)
    flow = jnp.zeros((1, t - 1, h, w, 2), dtype)

    shapes = {
        "unet": jax.eval_shape(unet.init, key, sample, 1.0, ehs, ids),
        "cn": jax.eval_shape(cn.init, key, sample, 1.0, ehs, ids, cond, flow),
        "vae": jax.eval_shape(  # num_frames is shape-affecting: keep static
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
    """Device->host scalar readback — the only reliable fence over the tunnel."""
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def run(h, w, t, steps, chunk, dtype, verbose=True, tiny=False,
        cfg_split=True, step_chunk=5, bundle=None, n_time=3,
        include_cmp=True, offload=False):
    from mofa_tpu.pipelines.traj import TrajPipeline
    from mofa_tpu.pipelines.common import (
        encode_clip_image, encode_vae_image, get_add_time_ids,
        decode_latents_jit, postprocess_frames)
    from mofa_tpu.ops.euler import make_euler_schedule

    log = (lambda m: print(m, file=sys.stderr, flush=True)) if verbose else (lambda m: None)

    t0 = time.perf_counter()
    if bundle is None:
        bundle = materialize_bundle(h, w, t, dtype, tiny=tiny)
        log(f"params materialized in {time.perf_counter()-t0:.1f}s")
    pipe = TrajPipeline(bundle)

    key = jax.random.PRNGKey(0)
    image01 = jnp.full((1, h, w, 3), 0.5, dtype)
    flow = jnp.zeros((1, t - 1, h, w, 2), dtype)

    last = {}

    def timed(label, fn, n=n_time):
        """fn() -> a fetchable array/tree; returns (compile_s, steady_s)
        where steady is the MEDIAN of n post-warmup repetitions (a single
        repetition is vulnerable to one-off tunnel/host stalls). The last
        computed value is kept in last['out'] so callers can reuse it
        without paying another device run."""
        import statistics
        tc = time.perf_counter()
        fence(fn())
        compile_s = time.perf_counter() - tc
        reps = []
        for _ in range(n):
            ts = time.perf_counter()
            out = fn()
            fence(out)
            reps.append(time.perf_counter() - ts)
        last["out"] = out
        steady = statistics.median(reps)
        log(f"{label}: compile+first {compile_s:.2f}s, steady {steady:.3f}s "
            f"(median of {n}: {[round(r, 3) for r in reps]})")
        return compile_s, steady

    # --- phase timings (each phase's jit program timed alone) ---
    # CMP sparse->dense flow completion IS part of reference inference
    # (run_gradio.py:236-277 runs it before the pipeline): 384x384, all t
    # frames through the full resnet50+SkipLayer CMP, flow rescaled to
    # (h, w) — the controlnet_flow the denoise consumes.
    cmp_s = 0.0
    if include_cmp:
        from mofa_tpu.models.cmp.model import CMP, CMPConfig, TINY_CMP_CONFIG, cmp_preprocess
        from mofa_tpu.preprocess.traj import DragFlowEngine
        ccfg = TINY_CMP_CONFIG if tiny else CMPConfig()
        cmp = CMP(ccfg)
        img384 = jnp.zeros((1, 384, 384, 3), jnp.float32)
        sp384 = jnp.zeros((1, 384, 384, 2), jnp.float32)
        cmp_shapes = jax.eval_shape(cmp.init, key, img384, sp384, sp384)
        cmp_params = jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), cmp_shapes)
        engine = DragFlowEngine(cmp_params, ccfg)
        first384 = jnp.full((1, 384, 384, 3), 0.5, jnp.float32)
        sparse = jnp.zeros((1, t, 384, 384, 2), jnp.float32)
        mask = jnp.zeros((1, t, 384, 384, 2), jnp.float32)
        _, cmp_s = timed(f"cmp_flow 384x384 x{t}",
                         lambda: engine.get_flow(first384, sparse, mask, h, w))
        del engine, cmp_params  # free CMP HBM before the big models run

    _, enc_clip = timed("encode_clip",
                        lambda: encode_clip_image(bundle, image01, do_cfg=True))
    _, enc_vae = timed("encode_vae",
                       lambda: encode_vae_image(bundle, image01 * 2 - 1, do_cfg=True))

    sched = make_euler_schedule(steps)
    image_embeddings = encode_clip_image(bundle, image01, do_cfg=True)
    image_latents = jnp.repeat(
        encode_vae_image(bundle, image01 * 2 - 1, do_cfg=True)[:, None], t, axis=1)
    if offload:
        # phase-scoped residency: VAE/CLIP device buffers freed for the
        # denoise (decode re-uploads lazily via ModelBundle.ensure_vae) —
        # the margin that lets the BATCHED CFG2 path (no cfg_split) fit
        bundle.offload_encoders()
    added_time_ids = get_add_time_ids(6, 128, 0.02, 1, do_cfg=True)
    latents = (jax.random.normal(key, (1, t, h // 8, w // 8, 4), jnp.float32)
               * sched.init_noise_sigma)
    cond_image = jnp.concatenate([image01 * 2 - 1] * 2, axis=0)
    flow_cfg = jnp.concatenate([flow] * 2, axis=0)
    guidance = jnp.linspace(1.0, 3.0, t)[None, :, None, None, None]
    sigmas = jnp.asarray(sched.sigmas)
    timesteps = jnp.asarray(sched.timesteps)

    def denoise():
        if step_chunk and step_chunk < steps:
            # the axon tunnel kills device programs running >~1 min; K-step
            # chunks round-trip the latent carry through the host instead
            return pipe._denoise_stepchunked(
                latents, image_latents, image_embeddings, added_time_ids,
                cond_image, flow_cfg, guidance, sigmas, timesteps,
                jnp.float32(1.0), steps, step_chunk, cfg_split)
        return pipe._denoise_and_decode(
            bundle.unet_params, bundle.controlnet_params, bundle.vae_params,
            latents, image_latents, image_embeddings, added_time_ids,
            cond_image, flow_cfg, guidance, sigmas, timesteps,
            jnp.float32(1.0), num_steps=steps, decode_chunk_size=chunk,
            return_latent=True, cfg_split=cfg_split)

    _, den = timed(f"denoise T={t} x{steps}", denoise)
    out_latents = last["out"]

    def decode():
        return decode_latents_jit(bundle, out_latents, chunk)

    _, dec = timed("decode", decode)
    _, post = timed("postprocess", lambda: postprocess_frames(decode()))
    post = max(post - dec, 0.0)

    e2e = cmp_s + enc_clip + enc_vae + den + dec + post
    return {
        "h": h, "w": w, "frames": t, "steps": steps, "cfg_split": cfg_split,
        "step_chunk": step_chunk, "offload": offload,
        "decode_chunk": chunk, "dtype": str(jnp.dtype(dtype)),
        "n_time": n_time,
        "cmp_s": round(cmp_s, 3),
        "encode_clip_s": round(enc_clip, 3),
        "encode_vae_s": round(enc_vae, 3),
        "denoise_s": round(den, 3),
        "decode_s": round(dec, 3),
        "postprocess_s": round(post, 3),
        "e2e_seconds_single_chip": round(e2e, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=576)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--t", type=int, default=25)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny configs (CPU smoke test of the harness)")
    ap.add_argument("--step_chunk", type=int, default=5,
                    help="steps per device program (0 = single program; the "
                         "axon tunnel kills programs running >~1 min)")
    ap.add_argument("--no_cfg_split", action="store_true",
                    help="run the 2B CFG batch as one UNet call (without "
                         "--offload it needs >16GB HBM at T=25 576x1024 "
                         "and crashes the v5e worker)")
    ap.add_argument("--offload", action="store_true",
                    help="free VAE/CLIP device buffers during denoise "
                         "(ModelBundle.offload_encoders)")
    args = ap.parse_args()
    bench_mod._maybe_force_cpu()
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    res = run(args.h, args.w, args.t, args.steps, args.chunk, dtype,
              tiny=args.tiny, cfg_split=not args.no_cfg_split,
              step_chunk=args.step_chunk, offload=args.offload)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
