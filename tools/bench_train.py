"""Time a full stage-1 train step on the real chip.

Reference operating point: 384^2, 25 frames, batch 1/GPU, fp16,
gradient checkpointing (Training/train_stage1.sh:4-20). Here: bf16
params, remat on, AdamW on the adapter, EDM loss with frozen
VAE/CLIP/UNet — the complete make_train_step program including VAE/CLIP
encodes and the backward pass.

Usage: python -u tools/bench_train.py [--t 25] [--size 384] [--remat 1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=25)
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--remat", type=int, default=1)
    ap.add_argument("--memory_lean", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from mofa_tpu.models.svd_unet import (SVDUNetConfig,
                                          UNetSpatioTemporalConditionModel)
    from mofa_tpu.models.mofa_adapter import FlowControlNet
    from mofa_tpu.models.vae import AutoencoderKLTemporalDecoder, VAEConfig
    from mofa_tpu.models.clip_vision import (CLIPVisionModelWithProjection,
                                             CLIPVisionConfig)
    from mofa_tpu.pipelines.common import ModelBundle
    from mofa_tpu.train.state import TrainState
    from mofa_tpu.train.stage import make_train_step, frozen_params

    dtype = jnp.bfloat16
    cast = lambda tree: jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)
    t, hw, b = args.t, args.size, args.b
    key = jax.random.PRNGKey(0)

    ucfg = SVDUNetConfig()
    unet = UNetSpatioTemporalConditionModel(ucfg)
    sample = jnp.zeros((1, t, hw // 8, hw // 8, ucfg.in_channels), dtype)
    ehs = jnp.zeros((1, 1, ucfg.cross_attention_dim), dtype)
    ids = jnp.zeros((1, 3), dtype)
    t0 = time.perf_counter()
    up = cast(jax.jit(unet.init)(key, sample, 1.0, ehs, ids))
    jax.block_until_ready(up)
    print(f"unet init {time.perf_counter() - t0:.0f}s", flush=True)

    cn = FlowControlNet(ucfg)
    cond = jnp.zeros((1, hw, hw, 3), dtype)
    flow = jnp.zeros((1, t - 1, hw, hw, 2), dtype)
    t0 = time.perf_counter()
    cp = cast(jax.jit(cn.init)(key, sample, 1.0, ehs, ids, cond, flow))
    jax.block_until_ready(cp)
    print(f"cn init {time.perf_counter() - t0:.0f}s", flush=True)

    vae = AutoencoderKLTemporalDecoder(VAEConfig())
    vp = cast(jax.jit(lambda k: vae.init(k, jnp.zeros((1, hw, hw, 3)),
                                         num_frames=1))(key))
    ccfg = CLIPVisionConfig()
    clip = CLIPVisionModelWithProjection(ccfg)
    clp = cast(jax.jit(lambda k: clip.init(
        k, jnp.zeros((1, ccfg.image_size, ccfg.image_size, 3))))(key))
    jax.block_until_ready((vp, clp))
    print("vae+clip init done", flush=True)

    bundle = ModelBundle(unet, up, cn, cp, vae, vp, clip, clp)
    from mofa_tpu.train.state import make_optimizer
    if args.memory_lean:
        # adafactor (the 8-bit-Adam analog, train_stage2.sh:24): AdamW's
        # fp32 moments on the 680M-param adapter alone cost ~5.4 GB
        tx = make_optimizer(lr=2e-5, params=cp, memory_lean=True)
    else:
        tx = optax.adamw(2e-5)
    state = TrainState.create(cp, tx)
    # donate the state: params/opt-state update in place instead of
    # doubling their HBM footprint
    step = jax.jit(make_train_step(bundle, tx, remat=bool(args.remat)),
                   donate_argnums=(0,))
    frozen = frozen_params(bundle)

    batch = {
        "pixel_values01": jnp.zeros((b, t, hw, hw, 3), dtype),
        "flows": jnp.zeros((b, t - 1, hw, hw, 2), dtype),
    }
    t0 = time.perf_counter()
    lowered = step.lower(state, batch, jax.random.PRNGKey(1), frozen)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    if ma is not None:
        print(f"memory: args {ma.argument_size_in_bytes / 1e9:.2f} GB, "
              f"out {ma.output_size_in_bytes / 1e9:.2f} GB, "
              f"temp {ma.temp_size_in_bytes / 1e9:.2f} GB", flush=True)
    state, metrics = compiled(state, batch, jax.random.PRNGKey(1), frozen)
    jax.block_until_ready(metrics["loss"])
    print(f"compile+first step {time.perf_counter() - t0:.0f}s", flush=True)

    for _ in range(args.iters):
        t0 = time.perf_counter()
        state, metrics = compiled(state, batch, jax.random.PRNGKey(2), frozen)
        loss = float(metrics["loss"])
        dt = time.perf_counter() - t0
        print(f"train step {t}f {hw}^2 remat={args.remat}: {dt:.2f}s "
              f"(loss {loss:.4f})", flush=True)


if __name__ == "__main__":
    main()
