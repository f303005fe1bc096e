"""Device-trace ONE full denoise step (adapter + frozen UNet + CFG/Euler
glue) at the bench shape and print per-op attribution.

Complements tools/trace_step.py (frozen UNet only): this covers the
~240 ms/step of FlowControlNet trunk + zero convs + Euler update that the
UNet-only trace misses, so perf work can target the right ops.

Usage: python -u tools/trace_full.py [--iters 3] [--top 50]
(run in background with generous time budget; never kill mid-compile)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.trace_step import parse_xplane

H, W, T, STEPS = 576, 1024, 7, 25


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=50)
    ap.add_argument("--logdir", default="/tmp/mofa_trace_full")
    ap.add_argument("--parse_only", action="store_true")
    ap.add_argument("--t", type=int, default=T,
                    help="frame count (default 7: the historical proxy "
                         "shape; 25 = the deployment point)")
    ap.add_argument("--cfg_split", action="store_true",
                    help="run the step as two sequential B=1 halves via "
                         "lax.map, exactly like pipelines/traj.py's "
                         "cfg_split deploy path (required to fit T=25 on "
                         "one 16 GB chip)")
    args = ap.parse_args()
    if args.parse_only:
        parse_xplane(args.logdir, args.top)
        return

    from mofa_tpu.models.svd_unet import (SVDUNetConfig,
                                          UNetSpatioTemporalConditionModel)
    from mofa_tpu.models.mofa_adapter import FlowControlNet
    from mofa_tpu.ops.euler import (make_euler_schedule, scale_model_input,
                                    euler_step)

    cfg = SVDUNetConfig()
    dtype = jnp.bfloat16
    h, w, t = H, W, args.t
    unet = UNetSpatioTemporalConditionModel(cfg)
    cn = FlowControlNet(cfg)

    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 8))
    sample = jnp.zeros((1, t, h // 8, w // 8, cfg.in_channels), dtype)
    ehs = jnp.zeros((1, 1, cfg.cross_attention_dim), dtype)
    ids = jnp.zeros((1, 3), dtype)
    cond = jnp.zeros((1, h, w, 3), dtype)
    flow = jnp.zeros((1, t - 1, h, w, 2), dtype)

    t0 = time.perf_counter()
    u_shapes = jax.eval_shape(unet.init, next(ks), sample, 1.0, ehs, ids)
    c_shapes = jax.eval_shape(cn.init, next(ks), sample, 1.0, ehs, ids,
                              cond, flow)
    fill = lambda tree: jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01,
                           dtype if jnp.issubdtype(s.dtype, jnp.floating)
                           else s.dtype), tree)
    unet_params, cn_params = fill(u_shapes), fill(c_shapes)
    jax.block_until_ready((unet_params, cn_params))
    print(f"param materialize {time.perf_counter()-t0:.1f}s", flush=True)

    sched = make_euler_schedule(STEPS)
    sigmas = jnp.asarray(sched.sigmas, jnp.float32)
    timesteps = jnp.asarray(sched.timesteps, jnp.float32)

    latents = (jax.random.normal(next(ks), (1, t, h // 8, w // 8, 4), dtype)
               * sched.init_noise_sigma)
    image_latents = jnp.zeros((2, t, h // 8, w // 8, 4), dtype)
    image_embeddings = jnp.zeros((2, 1, cfg.cross_attention_dim), dtype)
    added_time_ids = jnp.tile(jnp.asarray([[6.0, 128.0, 0.02]], dtype), (2, 1))
    cond_image = jnp.zeros((2, h, w, 3), dtype)
    flow_cfg = jnp.zeros((2, t - 1, h, w, 2), dtype)
    guidance = jnp.linspace(1.0, 3.0, t, dtype=jnp.float32)[None, :, None,
                                                            None, None]

    # cfg_split hoists features for B=1 only (both CFG halves see the
    # same cond image/flow — pipelines/traj.py:270-276)
    cond_h = cond_image[:1] if args.cfg_split else cond_image
    flow_h = flow_cfg[:1] if args.cfg_split else flow_cfg
    inject = jax.jit(lambda p: cn.apply(
        p, cond_h, flow_h, method=FlowControlNet.encode_features))(
        cn_params)
    jax.block_until_ready(inject)
    print("features hoisted", flush=True)

    if args.cfg_split:
        il2 = image_latents.reshape((2, 1) + image_latents.shape[1:])
        ehs2 = image_embeddings.reshape((2, 1) + image_embeddings.shape[1:])
        ids2 = added_time_ids.reshape((2, 1) + added_time_ids.shape[1:])

    @jax.jit
    def one_step(unet_params, cn_params, inject, lat):
        sigma, sigma_next, ts = sigmas[5], sigmas[6], timesteps[5]

        def model_call(latent_in, ehs_i, ids_i):
            down_res, mid_res = cn.apply(
                cn_params, latent_in, ts, ehs_i, ids_i,
                precomputed_features=inject)
            return unet.apply(
                unet_params, latent_in, ts, ehs_i, ids_i,
                down_block_additional_residuals=down_res,
                mid_block_additional_residual=mid_res)

        if args.cfg_split:
            # sequential B=1 halves through ONE compiled body, exactly
            # like _make_step_fn's lax.map in pipelines/traj.py
            scaled = scale_model_input(lat, sigma).astype(dtype)
            preds = jax.lax.map(
                lambda side: model_call(
                    jnp.concatenate([scaled, side[0]], axis=-1),
                    side[1], side[2]),
                (il2, ehs2, ids2))
            uncond = preds[0].astype(jnp.float32)
            cond_p = preds[1].astype(jnp.float32)
        else:
            latent_in = jnp.concatenate([lat] * 2, axis=0)
            latent_in = scale_model_input(latent_in, sigma).astype(dtype)
            latent_in = jnp.concatenate([latent_in, image_latents], axis=-1)
            noise_pred = model_call(latent_in, image_embeddings,
                                    added_time_ids)
            uncond, cond_p = jnp.split(noise_pred.astype(jnp.float32), 2,
                                       axis=0)
        noise_pred = uncond + guidance * (cond_p - uncond)
        new_lat, _ = euler_step(noise_pred, lat.astype(jnp.float32),
                                sigma, sigma_next)
        return jnp.float32(jnp.sum(new_lat.astype(jnp.float32)))

    t0 = time.perf_counter()
    float(one_step(unet_params, cn_params, inject, latents))
    print(f"compile+warmup {time.perf_counter()-t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = one_step(unet_params, cn_params, inject, latents)
    float(out)
    print(f"steady: {(time.perf_counter()-t0)/args.iters*1e3:.1f} ms/step "
          f"(incl ~30ms tunnel RTT)", flush=True)

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    for _ in range(args.iters):
        out = one_step(unet_params, cn_params, inject, latents)
    float(out)
    jax.profiler.stop_trace()
    print("trace captured", flush=True)
    parse_xplane(args.logdir, args.top)


if __name__ == "__main__":
    main()
