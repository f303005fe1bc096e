"""Time a full stage-1 (or stage-2) train step on the real chip.

Stage-1 reference operating point: 384^2, 25 frames, batch 1/GPU, fp16,
gradient checkpointing (Training/train_stage1.sh:4-20). Here: bf16
params, remat on, AdamW on the adapter, EDM loss with frozen
VAE/CLIP/UNet — the complete make_train_step program including VAE/CLIP
encodes and the backward pass.

--stage2 times the stage-2 operating point (Training/train_stage2.sh:4-25:
320^2 train / 384^2 CMP canvas, 25 frames, batch 1) INCLUDING its per-step
input-synthesis pipeline (train_stage2.py:78-159, flagged in SURVEY §3.4
as a major input cost): GMFlow teacher over the 24 frame pairs at
(384,512), host grid+watershed mask sampling, batched CMP completion at
384^2, and the EDM step with the stage-2 freeze set + adafactor (the
8-bit-Adam analog). Reports the input-synthesis share separately.

Usage: python -u tools/bench_train.py [--t 25] [--size 384] [--remat 1]
       [--stage2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as bench_mod  # used below: bench_mod._maybe_force_cpu()

import jax
import jax.numpy as jnp
import optax


def _fill_like(shapes, dtype):
    return jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01,
                           dtype if jnp.issubdtype(s.dtype, jnp.floating)
                           else s.dtype), shapes)


def run_stage2(args):
    """Stage-2 step incl. input synthesis (train_stage2.py:78-159,
    :1249-1268): teacher flow -> watershed/grid sparse mask -> CMP at
    384^2 -> rescale to train size -> EDM step with the stage-2 freeze
    set. Timings fence via scalar fetches."""
    import numpy as np
    from mofa_tpu.models.svd_unet import (SVDUNetConfig,
                                          UNetSpatioTemporalConditionModel)
    from mofa_tpu.models.mofa_adapter import FlowControlNet
    from mofa_tpu.models.vae import AutoencoderKLTemporalDecoder, VAEConfig
    from mofa_tpu.models.clip_vision import (CLIPVisionModelWithProjection,
                                             CLIPVisionConfig)
    from mofa_tpu.models.gmflow.model import (GMFlow, GMFlowConfig,
                                              get_optical_flows)
    from mofa_tpu.models.cmp.model import CMP, CMPConfig
    from mofa_tpu.pipelines.common import ModelBundle
    from mofa_tpu.train.state import (TrainState, make_optimizer,
                                      STAGE2_FROZEN)
    from mofa_tpu.train.stage import make_train_step, frozen_params
    from mofa_tpu.train.inputs import stage2_control_flow

    dtype = jnp.bfloat16
    t, hw, b = args.t, args.size, args.b
    key = jax.random.PRNGKey(0)

    if args.tiny:   # CPU smoke of the full flow (shapes stay 384-canvas)
        from mofa_tpu.models.svd_unet import MICRO_UNET_CONFIG
        from mofa_tpu.models.vae import TINY_VAE_CONFIG
        from mofa_tpu.models.clip_vision import TINY_CLIP_CONFIG
        from mofa_tpu.models.gmflow.model import TINY_GMFLOW_CONFIG
        from mofa_tpu.models.cmp.model import TINY_CMP_CONFIG
        ucfg, vcfg, ccfg = MICRO_UNET_CONFIG, TINY_VAE_CONFIG, TINY_CLIP_CONFIG
        gcfg, mcfg = TINY_GMFLOW_CONFIG, TINY_CMP_CONFIG
        t, hw = min(t, 3), 64
    else:
        ucfg, vcfg, ccfg = SVDUNetConfig(), VAEConfig(), CLIPVisionConfig()
        gcfg, mcfg = GMFlowConfig(), CMPConfig()
    unet = UNetSpatioTemporalConditionModel(ucfg)
    cn = FlowControlNet(ucfg)
    vae = AutoencoderKLTemporalDecoder(vcfg)
    clip = CLIPVisionModelWithProjection(ccfg)
    sample = jnp.zeros((1, t, hw // 8, hw // 8, ucfg.in_channels), dtype)
    ehs = jnp.zeros((1, 1, ucfg.cross_attention_dim), dtype)
    ids = jnp.zeros((1, 3), dtype)
    cond = jnp.zeros((1, hw, hw, 3), dtype)
    flow = jnp.zeros((1, t - 1, hw, hw, 2), dtype)

    t0 = time.perf_counter()
    shapes = {
        "unet": jax.eval_shape(unet.init, key, sample, 1.0, ehs, ids),
        "cn": jax.eval_shape(cn.init, key, sample, 1.0, ehs, ids, cond,
                             flow),
        "vae": jax.eval_shape(lambda k: vae.init(
            k, jnp.zeros((1, hw, hw, 3)), num_frames=1), key),
        "clip": jax.eval_shape(lambda k: clip.init(
            k, jnp.zeros((1, ccfg.image_size, ccfg.image_size, 3))), key),
    }
    p = {k: _fill_like(v, dtype) for k, v in shapes.items()}
    gmflow = GMFlow(gcfg)
    gshape = jax.eval_shape(gmflow.init, key, jnp.zeros((1, 384, 512, 3)),
                            jnp.zeros((1, 384, 512, 3)))
    gp = _fill_like(gshape, jnp.float32)
    cmp = CMP(mcfg)
    cshape = jax.eval_shape(cmp.init, key, jnp.zeros((1, 384, 384, 3)),
                            jnp.zeros((1, 384, 384, 2)),
                            jnp.zeros((1, 384, 384, 2)))
    cmp_params = _fill_like(cshape, jnp.float32)
    jax.block_until_ready((p, gp, cmp_params))
    print(f"params materialized {time.perf_counter() - t0:.0f}s", flush=True)

    bundle = ModelBundle(unet, p["unet"], cn, p["cn"], vae, p["vae"],
                         clip, p["clip"])
    tx = make_optimizer(lr=2e-5, params=p["cn"], memory_lean=True,
                        frozen_patterns=STAGE2_FROZEN)
    state = TrainState.create(p["cn"], tx)
    step = jax.jit(make_train_step(bundle, tx, remat=bool(args.remat)),
                   donate_argnums=(0,))
    frozen = frozen_params(bundle)

    rng = np.random.RandomState(0)
    px_np = rng.rand(b, t, hw, hw, 3).astype(np.float32)
    px = jnp.asarray(px_np, dtype)

    import statistics
    import json
    from mofa_tpu.train.flow_sampler import clip_sample_mask
    from mofa_tpu.train.inputs import _stage2_cmp_jit, Stage2InputPipeline

    teacher_dtype = jnp.bfloat16 if args.teacher_bf16 else None
    gp_run = (jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, gp)
        if args.teacher_bf16 else gp)

    cmp_dtype = jnp.bfloat16 if args.cmp_bf16 else None

    if args.overlap:
        # host-pipelined mode (Stage2InputPipeline): mask(i) on host
        # overlaps teacher(i+1) on device; wall time per yielded step is
        # the deployment number
        pipe = Stage2InputPipeline(
            gmflow, gp, cmp, cmp_params, (hw, hw),
            pair_chunk=args.teacher_chunk, teacher_dtype=teacher_dtype,
            cmp_dtype=cmp_dtype, rng=rng)
        stt = {"state": state}

        def step_fn(batch):
            batch = {k: v.astype(dtype) if k == "pixel_values01" else v
                     for k, v in batch.items()}
            stt["state"], metrics = step(stt["state"], batch,
                                         jax.random.PRNGKey(2), frozen)
            return float(metrics["loss"])

        n = args.iters + 2
        if args.cached_teacher:
            # steady state of `--flow_cache` training after a
            # `--precompute_flows` pass: every clip is a cache HIT, so
            # the device teacher never runs — per-step work is
            # mask(host) + CMP + train step only
            import tempfile
            from mofa_tpu.train.flow_cache import TeacherFlowCache
            cache = TeacherFlowCache(tempfile.mkdtemp(prefix="flowcache_"))
            keys = np.asarray([f"bench:{i}" for i in range(b)])
            t0 = time.perf_counter()
            flows0 = np.asarray(pipe._teacher(jnp.asarray(px_np)))
            cache.put_batch(keys, flows0)
            print(f"cache prefill (the offline pass) "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            pipe.flow_cache = cache
            clips = ((keys, px_np) for _ in range(n))
        else:
            clips = (px_np for _ in range(n))
        walls, tprev = [], time.perf_counter()
        for i, loss in enumerate(pipe.run(clips, step_fn)):
            now = time.perf_counter()
            walls.append(now - tprev)
            tprev = now
            print(f"stage2 overlap iter {i}: wall {walls[-1]:.2f}s "
                  f"(loss {loss:.4f})", flush=True)
        # exclude compile+warmup (first 2) AND the final drain iteration
        # (it has no teacher(i+1) to issue, so its wall underestimates
        # steady state — observed 3.1 vs 8.5 s on-chip 2026-08-21)
        # short-run fallback uses the FIRST post-warmup wall, not the
        # drain wall this very comment says underestimates steady state
        steady_w = walls[2:-1] if len(walls) > 3 else (walls[2:3]
                                                       or walls[-1:])
        steady = statistics.median(steady_w)
        print(json.dumps({
            "metric": "stage2_seconds_per_step",
            "mode": "overlap", "teacher_bf16": bool(args.teacher_bf16),
            "cmp_bf16": bool(args.cmp_bf16),
            "cached_teacher": bool(args.cached_teacher),
            "train_size": hw, "frames": t, "cmp_size": 384,
            "total_s": round(steady, 3),
            "walls": [round(x, 3) for x in walls]}), flush=True)
        return

    def synth():
        tt = time.perf_counter()
        # pair_chunk: the full 24-pair batch's correlation volume OOMs a
        # 16 GB chip with the SVD bundle resident (measured 2026-08-20)
        tdt = teacher_dtype or jnp.float32
        flows = get_optical_flows(gmflow, gp_run, px.astype(tdt),
                                  pair_chunk=args.teacher_chunk)
        flows_np = np.asarray(flows).astype(np.float32)  # fence + mask input
        teacher_s = time.perf_counter() - tt
        tt = time.perf_counter()
        mask = clip_sample_mask(flows_np, rng=rng)       # host scipy
        mask_s = time.perf_counter() - tt
        tt = time.perf_counter()
        dense = _stage2_cmp_jit(cmp, cmp_params,
                                jnp.asarray(px_np[:, :t - 1]),
                                jnp.asarray(flows_np * mask),
                                jnp.asarray(mask), train_size=(hw, hw),
                                compute_dtype=cmp_dtype)
        dense = dense.astype(dtype)
        float(jnp.sum(dense.astype(jnp.float32)))
        cmp_s = time.perf_counter() - tt
        return dense, teacher_s, mask_s, cmp_s

    # compile + first
    t0 = time.perf_counter()
    dense, teacher_s, mask_s, cmp_s = synth()
    batch = {"pixel_values01": px, "flows": dense}
    state, metrics = step(state, batch, jax.random.PRNGKey(1), frozen)
    float(metrics["loss"])
    print(f"compile+first {time.perf_counter() - t0:.0f}s "
          f"(teacher {teacher_s:.1f}s, mask {mask_s:.1f}s, "
          f"cmp {cmp_s:.1f}s)", flush=True)

    rows = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        dense, teacher_s, mask_s, cmp_s = synth()
        batch = {"pixel_values01": px, "flows": dense}
        ts = time.perf_counter()
        state, metrics = step(state, batch, jax.random.PRNGKey(2), frozen)
        loss = float(metrics["loss"])
        step_s = time.perf_counter() - ts
        total = time.perf_counter() - t0
        rows.append((teacher_s, mask_s, cmp_s, step_s, total))
        print(f"stage2 {t}f train {hw}^2 cmp 384^2: total {total:.2f}s = "
              f"teacher {teacher_s:.2f} + mask {mask_s:.2f} + cmp "
              f"{cmp_s:.2f} + step {step_s:.2f} (loss {loss:.4f})",
              flush=True)
    med = [statistics.median(c) for c in zip(*rows)]
    print(json.dumps({
        "metric": "stage2_seconds_per_step",
        "mode": "sequential", "teacher_bf16": bool(args.teacher_bf16),
        "cmp_bf16": bool(args.cmp_bf16),
        "train_size": hw, "frames": t, "cmp_size": 384,
        "teacher_s": round(med[0], 3), "mask_s": round(med[1], 3),
        "cmp_s": round(med[2], 3), "step_s": round(med[3], 3),
        "total_s": round(med[4], 3),
        "input_synthesis_share": round(
            (med[0] + med[1] + med[2]) / med[4], 3)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=25)
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--remat", type=int, default=1)
    ap.add_argument("--memory_lean", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--stage2", action="store_true")
    ap.add_argument("--overlap", action="store_true",
                    help="host-pipelined input synthesis "
                         "(Stage2InputPipeline): mask(i) overlaps "
                         "teacher(i+1)")
    ap.add_argument("--teacher_bf16", action="store_true",
                    help="run the GMFlow teacher in bf16 (A/B vs fp32; "
                         "EPE bound in tests/test_gmflow_golden.py)")
    ap.add_argument("--cmp_bf16", action="store_true",
                    help="run the CMP completion in bf16 (bound in "
                         "tests/test_train_inputs.py)")
    ap.add_argument("--cached_teacher", action="store_true",
                    help="with --overlap: steady state of --flow_cache "
                         "training (all cache hits; no device teacher)")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke of the --stage2 flow at micro configs")
    ap.add_argument("--teacher_chunk", type=int, default=8,
                    help="GMFlow teacher pair-batch chunk (HBM bound)")
    args = ap.parse_args()
    bench_mod._maybe_force_cpu()   # honors JAX_PLATFORMS=cpu despite axon
    if args.stage2:
        if args.size == 384:
            args.size = 320            # train_stage2.sh: train 320^2
        run_stage2(args)
        return

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
