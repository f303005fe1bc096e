"""Hybrid (landmarks + trajectories) CLI — dual-adapter generation.

CLI replacement for the Hybrid gradio apps
(/root/reference/MOFA-Video-Hybrid/run_gradio_{audio,video}_driven.py):
image + landmarks.npy + optional tracks JSON + optional face-mask PNG ->
face flow (CMP from landmark scatter) + drag flow (CMP from trajectories,
tiled to the landmark length, run_gradio_audio_driven.py:444-448) ->
mask-blended dual-adapter HybridPipeline -> mp4.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="MOFA-TPU hybrid animation")
    p.add_argument("--image", required=True)
    p.add_argument("--landmarks", required=True)
    p.add_argument("--tracks", default=None, help="trajectory JSON (optional)")
    p.add_argument("--face_mask", default=None, help="{0,255} PNG (optional)")
    p.add_argument("--output", default="output.mp4")
    p.add_argument("--panel_output", default=None,
                   help="also write the reference save_video composite "
                        "(first frame | drag flow | face flow | ldmk "
                        "raster | output+dots | output) to this path")
    p.add_argument("--svd_dir", default=None)
    p.add_argument("--controlnet_dir", default=None, help="ldmk adapter")
    p.add_argument("--controlnet2_dir", default=None, help="drag adapter")
    p.add_argument("--cmp_ckpt", default=None)
    p.add_argument("--num_inference_steps", type=int, default=25)
    p.add_argument("--target_size", type=int, default=512)
    p.add_argument("--ctrl_scale_ldmk", type=float, default=1.0)
    p.add_argument("--ctrl_scale_traj", type=float, default=0.6)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--decode_chunk_size", type=int, default=8)
    p.add_argument("--frame_parallel", action="store_true",
                   help="shard the denoise over all devices' frames axis")
    p.add_argument("--cfg_split", action="store_true",
                   help="sequential CFG halves (half peak activation HBM; "
                        "needed for the dual-adapter path at 576x1024 on "
                        "one 16 GB chip). Identical to the batched path "
                        "only with the pairwise hw-major time-context "
                        "quirk off")
    p.add_argument("--step_chunk", type=int, default=None,
                   help="host-chunked Euler loop: one compiled K-step "
                        "program re-invoked with the carry (keeps device "
                        "programs under the tunnel watchdog; exact)")
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
    from mofa_tpu.pipelines.hybrid import HybridPipeline
    from mofa_tpu.preprocess.traj import (
        preprocess_image, prepare_trajectory_flow, DragFlowEngine)
    from mofa_tpu.preprocess.landmark import (
        prepare_landmark_flow, draw_landmark_sequence, LandmarkFlowEngine)
    from mofa_tpu.ops.resize import resize_nhwc
    from PIL import Image

    image, (h, w) = preprocess_image(Image.open(args.image), args.target_size)
    landmarks = np.load(args.landmarks)  # [T, 68, 2]
    t = landmarks.shape[0]

    image_j = jnp.asarray(image)[None]
    image_384 = resize_nhwc(image_j, (384, 384))
    with timer.phase("cmp_load"):
        cmp_params = load_cmp_params(args.cmp_ckpt)

    # face flow from landmark scatter
    flow_in = prepare_landmark_flow(landmarks[None], h, w)
    ldmk_imgs = draw_landmark_sequence(landmarks, h, w)
    ldmk_engine = LandmarkFlowEngine(cmp_params)
    frames_384 = jnp.repeat(image_384[:, None], t - 1, axis=1)
    with timer.phase("cmp_flow"):
        face_flow = jax.block_until_ready(ldmk_engine.get_cmp_flow_landmarks(
            frames_384, jnp.asarray(flow_in["sparse_flow_384"]),
            jnp.asarray(flow_in["mask_384"]), h, w))

    # drag flow from trajectories (zero if none), tiled to landmark length
    if args.tracks:
        tracks = json.load(open(args.tracks))["tracks"]
        model_length = 25
        s_flow, mask = prepare_trajectory_flow(tracks, model_length, h, w)
        drag_engine = DragFlowEngine(cmp_params)
        drag = drag_engine.get_flow(
            image_384, jnp.asarray(s_flow)[None],
            jnp.asarray(np.repeat(mask[..., None], 2, -1))[None], h, w)
        reps = -(-(t - 1) // drag.shape[1])
        drag = jnp.tile(drag, (1, reps, 1, 1, 1))[:, : t - 1]
    else:
        drag = jnp.zeros((1, t - 1, h, w, 2), jnp.float32)

    if args.face_mask:
        m = np.asarray(Image.open(args.face_mask).convert("L").resize(
            (w, h), Image.NEAREST), np.float32)
        face_mask = jnp.asarray((m > 127).astype(np.float32))[None, :, :, None]
    else:
        face_mask = jnp.ones((1, h, w, 1), jnp.float32)

    cfg_kw = {}
    if args.tiny:
        from mofa_tpu.models.svd_unet import MICRO_UNET_CONFIG
        from mofa_tpu.models.vae import TINY_VAE_CONFIG
        from mofa_tpu.models.clip_vision import TINY_CLIP_CONFIG
        cfg_kw = dict(unet_cfg=MICRO_UNET_CONFIG, vae_cfg=TINY_VAE_CONFIG,
                      clip_cfg=TINY_CLIP_CONFIG)
    with timer.phase("bundle_load"):
        bundle = load_bundle(args.svd_dir, args.controlnet_dir, **cfg_kw,
                             controlnet2_dir=args.controlnet2_dir or "",
                             ldmk=True,
                             dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                             image_size=(h, w), num_frames=t)
    mesh = None
    if args.frame_parallel:
        from mofa_tpu.core.mesh import make_mesh
        mesh = make_mesh(data=1, frames=len(jax.devices()))
    pipe = HybridPipeline(bundle, mesh=mesh)
    from mofa_tpu.apps.instrument import maybe_trace
    with timer.phase("denoise_decode"), maybe_trace(args):
        frames, _ = pipe(image_j, face_flow, drag,
                         jnp.asarray(ldmk_imgs)[None], face_mask,
                         num_inference_steps=args.num_inference_steps,
                         ctrl_scale_ldmk=args.ctrl_scale_ldmk,
                         ctrl_scale_traj=args.ctrl_scale_traj,
                         decode_chunk_size=args.decode_chunk_size,
                         key=jax.random.PRNGKey(args.seed),
                         cfg_split=args.cfg_split,
                         step_chunk=args.step_chunk)
        frames = jax.block_until_ready(frames)
    with timer.phase("write"):
        write_video(np.asarray(frames)[0], args.output, fps=args.fps)
    print(f"wrote {args.output} ({t} frames @ {h}x{w})")
    if args.panel_output:
        from mofa_tpu.apps.panels import hybrid_panel
        panel = hybrid_panel(image, np.asarray(drag)[0], np.asarray(face_flow)[0],
                             ldmk_imgs, np.asarray(frames)[0], landmarks)
        write_video(panel, args.panel_output, fps=args.fps)
        print(f"wrote {args.panel_output}")


def main(argv=None):
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
