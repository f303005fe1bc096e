"""Trajectory animation CLI — the Traj workload entry point.

CLI replacement for the Traj gradio app's Drag.run
(/root/reference/MOFA-Video-Traj/run_gradio.py:487-631): image + trajectory
JSON -> CMP-densified drag flow -> TrajPipeline -> mp4/gif.

Trajectory JSON schema (what the gradio UI accumulates in tracking_points):
  {"tracks": [[[x, y], [x, y], ...], ...],       # per-track click points
   "motion_brush": optional path to a {0,255} PNG mask}
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="MOFA-TPU trajectory animation")
    p.add_argument("--image", required=True)
    p.add_argument("--tracks", required=True, help="trajectory JSON path")
    p.add_argument("--output", default="output.mp4")
    p.add_argument("--svd_dir", default=None)
    p.add_argument("--controlnet_dir", default=None)
    p.add_argument("--cmp_ckpt", default=None)
    p.add_argument("--num_frames", type=int, default=25)
    p.add_argument("--num_inference_steps", type=int, default=25)
    p.add_argument("--target_size", type=int, default=512)
    p.add_argument("--ctrl_scale", type=float, default=0.6)
    p.add_argument("--min_guidance", type=float, default=1.0)
    p.add_argument("--max_guidance", type=float, default=3.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fps", type=int, default=7)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--decode_chunk_size", type=int, default=8)
    p.add_argument("--frame_parallel", action="store_true",
                   help="shard the denoise over all devices' frames axis")
    p.add_argument("--cfg_split", action="store_true",
                   help="sequential CFG halves: half peak HBM (fits 25f "
                        "576x1024 on one 16GB chip); corrected (quirk-free) "
                        "temporal cross-attn context")
    p.add_argument("--tiny", action="store_true",
                   help="micro model configs (smoke tests; no real weights)")
    from mofa_tpu.apps.instrument import add_observability_args
    return add_observability_args(p)


def run(args):
    from mofa_tpu.apps.instrument import observe
    with observe(args) as timer:
        _run(args, timer)


def _run(args, timer):
    from mofa_tpu.apps.loaders import load_bundle, load_cmp_params, write_video
    from mofa_tpu.pipelines.traj import TrajPipeline
    from mofa_tpu.preprocess.traj import (
        preprocess_image, prepare_trajectory_flow, divide_points_afterinterpolate,
        DragFlowEngine)
    from mofa_tpu.ops.resize import resize_nhwc
    from mofa_tpu.ops.trajectory import interpolate_trajectory
    from PIL import Image

    image, (h, w) = preprocess_image(Image.open(args.image), args.target_size)
    spec = json.load(open(args.tracks))
    tracks = spec["tracks"]

    brush = None
    if spec.get("motion_brush"):
        brush = np.asarray(Image.open(spec["motion_brush"]).convert("L"),
                           np.float32)

    with timer.phase("cmp_load"):
        engine = DragFlowEngine(load_cmp_params(args.cmp_ckpt))
    image_j = jnp.asarray(image)[None]
    image_384 = resize_nhwc(image_j, (384, 384))

    with timer.phase("cmp_flow"):
        if brush is not None:
            pts = [np.asarray(interpolate_trajectory(tr, args.num_frames))
                   for tr in tracks]
            inside, outside = divide_points_afterinterpolate(
                np.stack(pts), brush)
            f_in, m_in = prepare_trajectory_flow(
                [list(map(tuple, p)) for p in inside] if len(inside) else [],
                args.num_frames, h, w)
            f_out, m_out = prepare_trajectory_flow(
                [list(map(tuple, p)) for p in outside] if len(outside) else [],
                args.num_frames, h, w)
            brush_384 = np.asarray(
                Image.fromarray(brush.astype(np.uint8)).resize(
                    (384, 384), Image.NEAREST), np.float32) / 255.0
            flow = engine.get_drag_flow_with_brush(
                image_384, jnp.asarray(f_in)[None],
                jnp.asarray(np.repeat(m_in[..., None], 2, -1))[None],
                jnp.asarray(f_out)[None],
                jnp.asarray(np.repeat(m_out[..., None], 2, -1))[None],
                jnp.asarray(brush_384), h, w)
        else:
            s_flow, mask = prepare_trajectory_flow(tracks, args.num_frames,
                                                   h, w)
            flow = engine.get_flow(
                image_384, jnp.asarray(s_flow)[None],
                jnp.asarray(np.repeat(mask[..., None], 2, -1))[None], h, w)

        # the CMP engine and its jit workspace are no longer needed; free
        # the device memory before loading the diffusion bundle (HBM
        # headroom)
        flow = jax.block_until_ready(flow)
    del engine
    import gc
    gc.collect()

    cfg_kw = {}
    if args.tiny:
        from mofa_tpu.models.svd_unet import MICRO_UNET_CONFIG
        from mofa_tpu.models.vae import TINY_VAE_CONFIG
        from mofa_tpu.models.clip_vision import TINY_CLIP_CONFIG
        cfg_kw = dict(unet_cfg=MICRO_UNET_CONFIG, vae_cfg=TINY_VAE_CONFIG,
                      clip_cfg=TINY_CLIP_CONFIG)
    with timer.phase("bundle_load"):
        bundle = load_bundle(args.svd_dir, args.controlnet_dir, **cfg_kw,
                             dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                             image_size=(h, w), num_frames=args.num_frames)
    mesh = None
    if args.frame_parallel:
        from mofa_tpu.core.mesh import make_mesh
        mesh = make_mesh(data=1, frames=len(jax.devices()))
    pipe = TrajPipeline(bundle, mesh=mesh)
    from mofa_tpu.apps.instrument import maybe_trace
    with timer.phase("denoise_decode"), maybe_trace(args):
        frames, _ = pipe(image_j, flow,
                         num_inference_steps=args.num_inference_steps,
                         min_guidance_scale=args.min_guidance,
                         max_guidance_scale=args.max_guidance,
                         controlnet_cond_scale=args.ctrl_scale,
                         decode_chunk_size=args.decode_chunk_size,
                         key=jax.random.PRNGKey(args.seed),
                         cfg_split=args.cfg_split)
        frames = jax.block_until_ready(frames)
    with timer.phase("write"):
        write_video(np.asarray(frames)[0], args.output, fps=args.fps)
    print(f"wrote {args.output} ({args.num_frames} frames @ {h}x{w})")


def main(argv=None):
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
