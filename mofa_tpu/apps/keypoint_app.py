"""Keypoint facial-animation CLI — long-video windowed generation.

CLI replacement for `inference_opendomain.py` + `mofa_keypoint.py`
(/root/reference/MOFA-Video-Keypoint/): image + landmarks.npy (the same
npy contract the reference's SadTalker/AniPortrait generators emit:
[T, 68, 2] (x, y) at image coords) -> rasterized landmark video + CMP
landmark flow -> sliding-window KeypointPipeline -> mp4.

The audio->landmark generators are in-framework: `apps/audio2ldmk_app.py`
(SadTalker / AniPortrait / video engines over `models/audio/`) emits the
landmarks.npy this CLI consumes; any generator honoring the npy contract
works too.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="MOFA-TPU keypoint facial animation")
    p.add_argument("--image", required=True)
    p.add_argument("--landmarks", required=True, help="landmarks.npy [T,68,2]")
    p.add_argument("--output", default="output.mp4")
    p.add_argument("--panel_output", default=None,
                   help="also write the reference's 5-panel diagnostic "
                        "video (first frame | flow | ldmk raster | "
                        "output+dots | output) to this path")
    p.add_argument("--svd_dir", default=None)
    p.add_argument("--controlnet_dir", default=None)
    p.add_argument("--cmp_ckpt", default=None)
    p.add_argument("--num_frames", type=int, default=125)
    p.add_argument("--window_size", type=int, default=25)
    p.add_argument("--stride", type=int, default=12)
    p.add_argument("--num_inference_steps", type=int, default=25)
    p.add_argument("--target_size", type=int, default=512)
    p.add_argument("--ctrl_scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--decode_chunk_size", type=int, default=8)
    p.add_argument("--window_batch", type=int, default=1,
                   help="denoise this many sliding windows per UNet call "
                        "(stacked on the batch axis; exact semantics)")
    p.add_argument("--small_programs", action="store_true",
                   help="jit per window step instead of one scan-of-scans "
                        "program (lighter compile; long videos)")
    p.add_argument("--cfg_split", action="store_true",
                   help="run each window step's CFG halves sequentially "
                        "(half peak activation HBM; needed for 576x1024 "
                        "windows on one 16 GB chip). Requires "
                        "--small_programs and window_batch=1; identical to "
                        "the batched path only with the pairwise hw-major "
                        "time-context quirk off")
    p.add_argument("--frame_parallel", action="store_true",
                   help="shard the denoise over all devices' frames axis")
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
    from mofa_tpu.pipelines.keypoint import KeypointPipeline
    from mofa_tpu.preprocess.traj import preprocess_image
    from mofa_tpu.preprocess.landmark import (
        prepare_landmark_flow, draw_landmark_sequence, LandmarkFlowEngine)
    from mofa_tpu.ops.resize import resize_nhwc
    from PIL import Image

    image, (h, w) = preprocess_image(Image.open(args.image), args.target_size)
    landmarks = np.load(args.landmarks)[: args.num_frames]  # [T, 68, 2]
    t = landmarks.shape[0]

    flow_in = prepare_landmark_flow(landmarks[None], h, w)
    ldmk_imgs = draw_landmark_sequence(landmarks, h, w)

    with timer.phase("cmp_load"):
        engine = LandmarkFlowEngine(load_cmp_params(args.cmp_ckpt))
    image_j = jnp.asarray(image)[None]
    image_384 = resize_nhwc(image_j, (384, 384))
    frames_384 = jnp.repeat(image_384[:, None], t - 1, axis=1)
    with timer.phase("cmp_flow"):
        flow = jax.block_until_ready(engine.get_cmp_flow_landmarks(
            frames_384, jnp.asarray(flow_in["sparse_flow_384"]),
            jnp.asarray(flow_in["mask_384"]), h, w))

    cfg_kw = {}
    if args.tiny:
        from mofa_tpu.models.svd_unet import MICRO_UNET_CONFIG
        from mofa_tpu.models.vae import TINY_VAE_CONFIG
        from mofa_tpu.models.clip_vision import TINY_CLIP_CONFIG
        cfg_kw = dict(unet_cfg=MICRO_UNET_CONFIG, vae_cfg=TINY_VAE_CONFIG,
                      clip_cfg=TINY_CLIP_CONFIG)
    with timer.phase("bundle_load"):
        bundle = load_bundle(args.svd_dir, args.controlnet_dir, **cfg_kw,
                             ldmk=True,
                             dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                             image_size=(h, w), num_frames=args.window_size)
    mesh = None
    if args.frame_parallel:
        from mofa_tpu.core.mesh import make_mesh
        mesh = make_mesh(data=1, frames=len(jax.devices()))
    pipe = KeypointPipeline(bundle, mesh=mesh,
                            big_program=not args.small_programs)
    from mofa_tpu.apps.instrument import maybe_trace
    with timer.phase("denoise_decode"), maybe_trace(args):
        frames, _ = pipe(image_j, flow, jnp.asarray(ldmk_imgs)[None],
                         window_size=args.window_size, stride=args.stride,
                         num_inference_steps=args.num_inference_steps,
                         controlnet_cond_scale=args.ctrl_scale,
                         decode_chunk_size=args.decode_chunk_size,
                         key=jax.random.PRNGKey(args.seed),
                         window_batch=args.window_batch,
                         cfg_split=args.cfg_split)
        frames = jax.block_until_ready(frames)
    with timer.phase("write"):
        write_video(np.asarray(frames)[0], args.output, fps=args.fps)
    print(f"wrote {args.output} ({t} frames @ {h}x{w})")
    if args.panel_output:
        from mofa_tpu.apps.panels import keypoint_panel
        panel = keypoint_panel(image, np.asarray(flow)[0], ldmk_imgs,
                               np.asarray(frames)[0], landmarks)
        write_video(panel, args.panel_output, fps=args.fps)
        print(f"wrote {args.panel_output}")


def main(argv=None):
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
