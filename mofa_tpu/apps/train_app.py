"""MOFA-Adapter training CLI (stage 1 / stage 2).

TPU re-derivation of Training/train_stage{1,2}.py's driver loop: WebVid clip
dataset -> flow teacher (stage1: GMFlow dense flow; stage2: sampled-sparse +
CMP completion) -> EDM train step -> EMA/checkpoint/validation, with mesh
sharding (DP/TP/SP) instead of Accelerate DDP. Arg surface mirrors
train_stage1.sh / train_stage2.sh.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="MOFA-TPU adapter training")
    p.add_argument("--stage", type=int, choices=(1, 2), default=1)
    p.add_argument("--csv_path", required=True)
    p.add_argument("--video_folder", required=True)
    p.add_argument("--output_dir", default="./runs/mofa")
    p.add_argument("--svd_dir", default=None)
    p.add_argument("--controlnet_resume", default=None,
                   help=".npz adapter to initialize from (stage2: stage1 out)")
    p.add_argument("--gmflow_ckpt", default=None)
    p.add_argument("--cmp_ckpt", default=None)
    # train_stage1.sh defaults
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--sample_size", type=int, default=384)
    p.add_argument("--sample_stride", type=int, default=4)
    p.add_argument("--sample_n_frames", type=int, default=25)
    p.add_argument("--num_train_steps", type=int, default=100_000)
    p.add_argument("--checkpointing_steps", type=int, default=2500)
    p.add_argument("--checkpoints_total_limit", type=int, default=10)
    p.add_argument("--validation_steps", type=int, default=2500)
    p.add_argument("--conditioning_dropout_prob", type=float, default=0.1)
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument("--overlap_inputs", action="store_true",
                   help="stage 2: host-pipelined input synthesis — mask "
                        "sampling overlaps the next batch's teacher flows "
                        "(Stage2InputPipeline; accum=1 only)")
    p.add_argument("--cmp_bf16", action="store_true",
                   help="stage2: run the CMP completion in bf16 (numerics "
                        "bound: tests/test_train_inputs.py::"
                        "test_cmp_bf16_dense_flow_bound)")
    p.add_argument("--flow_cache", default=None,
                   help="directory of precomputed teacher flows "
                        "(train/flow_cache.py); hits skip the GMFlow "
                        "teacher, misses are computed live and written "
                        "back. Fill it offline with --precompute_flows.")
    p.add_argument("--precompute_flows", action="store_true",
                   help="offline pass: replay the seeded clip schedule, "
                        "compute every clip's teacher flows into "
                        "--flow_cache, and exit (no SVD models loaded)")
    p.add_argument("--teacher_bf16", action="store_true",
                   help="run the GMFlow teacher in bf16 (EPE bound: "
                        "tests/test_gmflow_golden.py::test_teacher_bf16_epe_bound)")
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="memory-lean optimizer (factored adafactor)")
    p.add_argument("--seed", type=int, default=23123134)
    p.add_argument("--resume_from_checkpoint", default=None,
                   help="'latest' or a step number")
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--mesh_frames", type=int, default=1)
    p.add_argument("--tiny", action="store_true",
                   help="micro configs for smoke runs")
    p.add_argument("--log_every", type=int, default=10)
    return p


def run(args):
    from mofa_tpu.apps.loaders import load_bundle, load_cmp_params, write_video
    from mofa_tpu.core.mesh import make_mesh
    from mofa_tpu.parallel.sharding import shard_params
    from mofa_tpu.train.checkpoint import (CheckpointManager, export_adapter,
                                           import_adapter)
    from mofa_tpu.train.data import WebVidDataset, DevicePrefetcher
    from mofa_tpu.train.state import TrainState, make_optimizer, STAGE2_FROZEN
    from mofa_tpu.train.stage import make_train_step, make_grad_accum_train_step
    from mofa_tpu.utils.logging import get_logger
    import dataclasses
    import os

    logger = get_logger("train")
    os.makedirs(args.output_dir, exist_ok=True)

    if args.precompute_flows:
        _precompute_flows(args, logger)
        return

    mesh = None
    if args.mesh_data * args.mesh_model * args.mesh_frames > 1:
        mesh = make_mesh(args.mesh_data, args.mesh_frames, args.mesh_model)

    cfg_kw = {}
    if args.tiny:
        from mofa_tpu.models.svd_unet import MICRO_UNET_CONFIG
        from mofa_tpu.models.vae import TINY_VAE_CONFIG
        from mofa_tpu.models.clip_vision import TINY_CLIP_CONFIG
        cfg_kw = dict(unet_cfg=MICRO_UNET_CONFIG, vae_cfg=TINY_VAE_CONFIG,
                      clip_cfg=TINY_CLIP_CONFIG)
    bundle = load_bundle(args.svd_dir, None, **cfg_kw,
                         image_size=(args.sample_size, args.sample_size),
                         num_frames=args.sample_n_frames)
    if args.controlnet_resume:
        bundle.controlnet_params = import_adapter(
            bundle.controlnet_params, args.controlnet_resume)
    elif args.stage == 1:
        # stage-1 adapters start from the frozen UNet's trunk weights
        # (FlowControlNet.from_unet, controlnet_sdv.py:617-627)
        from mofa_tpu.models.weights import init_adapter_from_unet
        bundle.controlnet_params = init_adapter_from_unet(
            bundle.controlnet_params, bundle.unet_params)
    if mesh is not None:
        bundle = dataclasses.replace(
            bundle,
            controlnet_params=shard_params(bundle.controlnet_params, mesh),
            unet_params=shard_params(bundle.unet_params, mesh))

    # flow teacher: GMFlow provides dense flow in both stages (stage 2
    # samples sparse hints from it before CMP completion)
    from mofa_tpu.train.inputs import make_stage1_batch, make_stage2_batch
    gmflow, gm_params, size = _setup_gmflow(args, logger)

    flow_cache = None
    if args.flow_cache:
        from mofa_tpu.train.flow_cache import TeacherFlowCache
        flow_cache = TeacherFlowCache(args.flow_cache)
        logger.info(f"teacher flow cache: {args.flow_cache} "
                    f"({len(flow_cache)} clips)")

    # live-teacher precision mirrors Stage2InputPipeline._teacher /
    # _precompute_flows so cache contents and the --teacher_bf16 flag
    # mean the same thing on every path
    gm_params_run = gm_params
    if args.teacher_bf16:
        gm_params_run = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, gm_params)

    def teacher_flows(px, keys):
        """Dense teacher flows: cache hits skip the device teacher;
        misses compute live (pair-chunked — the unchunked 24-pair
        correlation volume OOMs a 16 GB chip with the SVD bundle
        resident) and backfill the cache. Without a cache the flows stay
        ON DEVICE — no host round trip."""
        if flow_cache is not None and keys is not None:
            hit = flow_cache.get_batch(keys)
            if hit is not None:
                return hit
        px_t = jnp.asarray(px)
        if args.teacher_bf16:
            px_t = px_t.astype(jnp.bfloat16)
        flows = make_stage1_batch(
            gmflow, gm_params_run, px_t, inference_size=size,
            pair_chunk=8)["flows"].astype(jnp.float32)
        if flow_cache is not None and keys is not None:
            flows = np.asarray(flows)
            flow_cache.put_batch(keys, flows)
        return flows

    if args.stage == 1:
        def make_batch(px, rng, keys=None):
            return {"pixel_values01": jnp.asarray(px),
                    "flows": jnp.asarray(teacher_flows(px, keys))}
        frozen = ()
    else:
        from mofa_tpu.models.cmp.model import CMP
        cmp_params = load_cmp_params(args.cmp_ckpt)
        cmp = CMP()
        cmp_dt = jnp.bfloat16 if args.cmp_bf16 else None

        def make_batch(px, rng, keys=None):
            # stage 2 samples host scipy masks from the flows, so they
            # come to host here regardless of the cache path
            dense = np.asarray(teacher_flows(px, keys))
            return make_stage2_batch(cmp, cmp_params, np.asarray(px),
                                     dense, rng=rng, cmp_dtype=cmp_dt)
        frozen = STAGE2_FROZEN

    tx = make_optimizer(lr=args.learning_rate, frozen_patterns=frozen,
                        params=bundle.controlnet_params,
                        memory_lean=args.use_8bit_adam)
    state = TrainState.create(bundle.controlnet_params, tx, ema=args.use_ema)
    accum = args.gradient_accumulation_steps
    # donate the state: params/opt-state update in place, halving their
    # HBM footprint across the step boundary
    if accum > 1:
        step_fn = jax.jit(make_grad_accum_train_step(
            bundle, tx, accum, cond_dropout_prob=args.conditioning_dropout_prob,
            ldmk=False, mesh=mesh), donate_argnums=(0,))
    else:
        step_fn = jax.jit(make_train_step(
            bundle, tx, cond_dropout_prob=args.conditioning_dropout_prob,
            ldmk=False, mesh=mesh, remat=args.gradient_checkpointing),
            donate_argnums=(0,))

    # frozen UNet/VAE/CLIP weights ride as jit ARGUMENTS — closing over
    # them would bake GBs of constants into the lowered train program
    from mofa_tpu.train.stage import frozen_params
    frozen_tree = frozen_params(bundle)

    ckpt = CheckpointManager(os.path.join(args.output_dir, "checkpoints"),
                             max_to_keep=args.checkpoints_total_limit,
                             save_interval_steps=args.checkpointing_steps)
    start_step = 0
    if args.resume_from_checkpoint:
        step_no = (ckpt.latest_step() if args.resume_from_checkpoint == "latest"
                   else int(args.resume_from_checkpoint))
        if step_no is not None:
            state = ckpt.restore(state, step_no)
            start_step = int(state.step)
            logger.info(f"resumed from step {start_step}")

    ds = WebVidDataset(args.csv_path, args.video_folder,
                       sample_size=args.sample_size,
                       sample_stride=args.sample_stride,
                       sample_n_frames=args.sample_n_frames, seed=args.seed)
    eff_batch = args.batch_size * max(1, accum)
    loader = DevicePrefetcher(ds.batches(eff_batch), depth=2)

    key = jax.random.PRNGKey(args.seed)
    rng_np = np.random.RandomState(args.seed)
    tick = {"t": time.time()}

    def after_step(step_no, metrics, px, batch):
        if (step_no + 1) % args.log_every == 0:
            dt = (time.time() - tick["t"]) / args.log_every
            tick["t"] = time.time()
            logger.info(
                f"step {step_no + 1} loss {float(metrics['loss']):.4f} "
                f"grad_norm {float(metrics['grad_norm']):.3f} "
                f"{dt:.2f}s/it")
        ckpt.save(step_no + 1, state)
        if (step_no + 1) % args.validation_steps == 0:
            _render_validation(args, bundle, state, px, batch, step_no + 1,
                               write_video, logger)

    if args.stage == 2 and args.overlap_inputs and accum == 1:
        # host-pipelined input synthesis (train/inputs.Stage2InputPipeline):
        # batch N's mask sampling overlaps batch N+1's teacher flows on
        # the device — the reference pays the full synthesis latency
        # inline per step (train_stage2.py:1249-1268; SURVEY §3.4)
        from mofa_tpu.train.inputs import Stage2InputPipeline
        pipe_in = Stage2InputPipeline(
            gmflow, gm_params, cmp, cmp_params,
            (args.sample_size, args.sample_size), inference_size=size,
            teacher_dtype=jnp.bfloat16 if args.teacher_bf16 else None,
            cmp_dtype=cmp_dt, flow_cache=flow_cache, rng=rng_np)
        n_steps = args.num_train_steps - start_step

        def _clip_stream():
            for _ in range(n_steps):
                b = next(loader)
                px = np.asarray(b["pixel_values01"], np.float32)
                if flow_cache is not None and "clip_key" in b:
                    yield (np.asarray(b["clip_key"]), px)
                else:
                    yield px
        clips = _clip_stream()
        box = {"key": key, "state": state, "batch": None}

        def overlap_step(batch):
            box["key"], sub = jax.random.split(box["key"])
            box["state"], metrics = step_fn(box["state"], batch, sub,
                                            frozen_tree)
            box["batch"] = batch
            return metrics

        for i, metrics in enumerate(pipe_in.run(clips, overlap_step)):
            state = box["state"]
            after_step(start_step + i, metrics,
                       box["batch"]["pixel_values01"], box["batch"])
    else:
        for step_no in range(start_step, args.num_train_steps):
            b = next(loader)
            px = b["pixel_values01"]
            batch = make_batch(px, rng_np, b.get("clip_key"))
            if accum > 1:
                batch = {k: v.reshape((accum, args.batch_size) + v.shape[1:])
                         for k, v in batch.items()}
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, batch, sub, frozen_tree)
            after_step(step_no, metrics, px, batch)

    ckpt.close()
    export_adapter(
        state.ema_params if state.ema_params is not None else state.params,
        os.path.join(args.output_dir, "adapter_final.npz"))
    logger.info(f"done; adapter at {args.output_dir}/adapter_final.npz")


def _precompute_flows(args, logger):
    """Offline teacher pass (the 'precompute flows offline' answer to the
    reference's inline per-step synthesis, SURVEY §3.4 /
    train_stage2.py:1249-1268): replay the SEEDED clip schedule that
    training with identical dataset args would draw, compute each clip's
    GMFlow flows once, and store them in --flow_cache. A subsequent
    training run with the same seed then hits the cache on every step —
    the measured 3-6 s/step of device teacher time drops to an npz read.
    No SVD models are loaded; only GMFlow runs."""
    from mofa_tpu.train.data import WebVidDataset
    from mofa_tpu.train.flow_cache import TeacherFlowCache
    from mofa_tpu.train.inputs import make_stage1_batch

    assert args.flow_cache, "--precompute_flows requires --flow_cache DIR"
    cache = TeacherFlowCache(args.flow_cache)
    gmflow, gm_params, size = _setup_gmflow(args, logger)
    if args.teacher_bf16:
        gm_params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, gm_params)

    ds = WebVidDataset(args.csv_path, args.video_folder,
                       sample_size=args.sample_size,
                       sample_stride=args.sample_stride,
                       sample_n_frames=args.sample_n_frames, seed=args.seed)
    eff_batch = args.batch_size * max(1, args.gradient_accumulation_steps)
    loader = ds.batches(eff_batch)
    t0, done = time.time(), 0
    for step in range(args.num_train_steps):
        b = next(loader)
        keys = [str(k) for k in np.atleast_1d(b["clip_key"])]
        if all(cache.get(k) is not None for k in keys):
            continue
        px = jnp.asarray(np.asarray(b["pixel_values01"], np.float32))
        if args.teacher_bf16:   # mirror Stage2InputPipeline._teacher
            px = px.astype(jnp.bfloat16)
        flows = np.asarray(make_stage1_batch(
            gmflow, gm_params, px, inference_size=size)["flows"],
            dtype=np.float32)
        for k, f in zip(keys, flows):
            cache.put(k, f)
        done += len(keys)
        if (step + 1) % args.log_every == 0:
            logger.info(f"precompute {step + 1}/{args.num_train_steps} "
                        f"batches, {done} clips written "
                        f"({(time.time() - t0) / (step + 1):.2f}s/batch)")
    logger.info(f"precompute done: {done} clips written, "
                f"{len(cache)} total in {args.flow_cache}")


def _setup_gmflow(args, logger):
    from mofa_tpu.models.gmflow.model import GMFlow, GMFlowConfig
    gm_cfg = (GMFlowConfig(num_transformer_layers=2, num_reg_refine=2)
              if args.tiny else GMFlowConfig())
    gmflow = GMFlow(gm_cfg)
    size = (64, 96) if args.tiny else (384, 512)
    gm_params = jax.jit(lambda k: gmflow.init(
        k, jnp.zeros((1,) + size + (3,)), jnp.zeros((1,) + size + (3,))))(
        jax.random.PRNGKey(0))
    if args.gmflow_ckpt:
        from mofa_tpu.models.weights import (load_torch_checkpoint,
                                             convert_gmflow_state_dict)
        gm_params = convert_gmflow_state_dict(
            gm_params, load_torch_checkpoint(args.gmflow_ckpt))
    else:
        logger.warning("no --gmflow_ckpt: teacher runs with random weights")
    return gmflow, gm_params, size


def _render_validation(args, bundle, state, px, batch, step_no, write_video,
                       logger):
    """EMA-weighted validation render (train_stage1.py:1210-1306)."""
    import dataclasses
    import os
    from mofa_tpu.pipelines.traj import TrajPipeline
    params = state.ema_params if state.ema_params is not None else state.params
    val_bundle = dataclasses.replace(bundle, controlnet_params=params)
    pipe = TrajPipeline(val_bundle)
    image = px[0:1, 0]
    flow = batch["flows"].reshape((-1,) + batch["flows"].shape[-4:])[0:1]
    frames, _ = pipe(image, flow, num_inference_steps=4,
                     key=jax.random.PRNGKey(42))
    path = os.path.join(args.output_dir, f"val_{step_no}.mp4")
    write_video(np.asarray(frames)[0], path, fps=7)
    logger.info(f"validation render -> {path}")


def main(argv=None):
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
