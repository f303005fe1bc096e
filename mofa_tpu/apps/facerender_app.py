"""Talking-head renderer CLI — the SadTalker facerender path.

Reference flow (`sadtalker_audio2pose/inference.py` without --face3dvis →
`src/facerender/animate.py` AnimateFromCoeff.generate): source image +
first-frame 3DMM coeffs + predicted coeff track -> facevid2vid render.
Here the whole per-frame loop is one jitted lax.scan
(models/facerender.make_animation).

Inputs: --coeff_npz holds `full_3dmm` (first-frame fit — produced
in-framework by `face_fit_app`, same contract as audio2ldmk_app) and
--driving_coeffs_npz holds
`coeff_3dmm` [F, 70] (exp + pose track, e.g. from the audio2coeff stage).
Weights: --ckpt is the combined facerender checkpoint
(SadTalker_V0.0.2_256.safetensors layout; generator./kp_extractor./
mapping. prefixes).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="MOFA-TPU facerender")
    p.add_argument("--image", required=True)
    p.add_argument("--coeff_npz", required=True,
                   help="first-frame fit npz (full_3dmm)")
    p.add_argument("--driving_coeffs_npz", required=True,
                   help="npz with coeff_3dmm [F, 70]")
    p.add_argument("--output", default="facerender.mp4")
    p.add_argument("--ckpt", default=None,
                   help="combined facerender checkpoint (.safetensors/.pth)")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--expression_scale", type=float, default=1.0)
    p.add_argument("--still", action="store_true")
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--tiny", action="store_true",
                   help="micro config smoke run (no real weights)")
    # post-processing half of the reference facerender path
    # (sadtalker_audio2pose/src/utils/paste_pic.py + face_enhancer.py)
    p.add_argument("--enhancer", default="none",
                   choices=["none", "gfpgan", "npz"],
                   help="face-enhancer stage: in-framework GFPGAN v1 clean "
                        "(models/gfpgan.py, aligned-crop mode) or external "
                        "npz frames")
    p.add_argument("--gfpgan_ckpt", default=None,
                   help="GFPGANv1.4.pth for --enhancer gfpgan")
    p.add_argument("--enhanced_npz", default=None,
                   help="npz with {'frames': uint8 [T,H,W,3]} from an "
                        "external enhancer")
    p.add_argument("--paste_back", action="store_true",
                   help="seamless-clone the rendered crop back into the "
                        "full source image (paste_pic.py semantics)")
    p.add_argument("--full_image", default=None,
                   help="full-resolution source image for --paste_back")
    p.add_argument("--crop_info_npz", default=None,
                   help="npz with 'crop_info' = [rw,rh, clx,cly,crx,cry, "
                        "lx,ly,rx,ry] (the face_fit_app crop output)")
    return p


def run(args):
    from PIL import Image
    from mofa_tpu.apps.loaders import write_video
    from mofa_tpu.models import facerender as fr
    from mofa_tpu.models.weights import (convert_facerender_state_dict,
                                         load_safetensors,
                                         load_torch_checkpoint)

    cfg = fr.TINY_FACERENDER_CONFIG if args.tiny else fr.FaceRenderConfig()
    size = 32 if args.tiny else args.size

    img = Image.open(args.image).convert("RGB").resize((size, size))
    source = jnp.asarray(np.asarray(img, np.float32) / 255.0)[None]

    first = np.load(args.coeff_npz, allow_pickle=True)["full_3dmm"]
    first = first.reshape(1, -1).astype(np.float32)
    src70 = np.concatenate([first[:, 80:144], first[:, 224:227],
                            first[:, 254:257]], axis=1) \
        if first.shape[1] >= 257 else first[:, :70]
    driving = np.load(args.driving_coeffs_npz)["coeff_3dmm"][:, :70]

    src_sem, tgt_sem = fr.build_semantics(
        src70, driving, expression_scale=args.expression_scale,
        still_mode=args.still)

    kp = fr.KPDetector(cfg)
    mapping = fr.MappingNet(cfg)
    gen = (fr.OcclusionAwareGenerator(cfg) if args.tiny
           else fr.OcclusionAwareSPADEGenerator(cfg))

    kp_params = kp.init(jax.random.PRNGKey(0), source)
    map_params = mapping.init(jax.random.PRNGKey(1), jnp.asarray(src_sem))
    gen_params = gen.init(jax.random.PRNGKey(2), source,
                          jnp.zeros((1, cfg.num_kp, 3)),
                          jnp.zeros((1, cfg.num_kp, 3)))
    if args.ckpt:
        sd = (load_safetensors(args.ckpt) if args.ckpt.endswith(".safetensors")
              else load_torch_checkpoint(args.ckpt))
        kp_params = convert_facerender_state_dict(
            kp_params, sd, net="kp_detector", prefix="kp_extractor.")
        map_params = convert_facerender_state_dict(
            map_params, sd, net="mapping", prefix="mapping.")
        gen_params = convert_facerender_state_dict(
            gen_params, sd, net="generator", prefix="generator.")

    frames = fr.make_animation(source, jnp.asarray(src_sem),
                               jnp.asarray(tgt_sem), gen, gen_params,
                               kp, kp_params, mapping, map_params)
    out = np.asarray(frames)[0]
    out8 = (np.clip(out, 0, 1) * 255).astype(np.uint8)

    from mofa_tpu.preprocess.enhance import enhance_frames, paste_back_frames
    out8 = enhance_frames(out8, method=args.enhancer,
                          npz_path=args.enhanced_npz,
                          ckpt=args.gfpgan_ckpt, tiny=args.tiny)
    if args.paste_back:
        if not (args.full_image and args.crop_info_npz):
            raise SystemExit("--paste_back needs --full_image and "
                             "--crop_info_npz")
        full = np.asarray(Image.open(args.full_image).convert("RGB"))
        ci = np.load(args.crop_info_npz)["crop_info"].astype(np.int64)
        crop_info = (tuple(ci[0:2]), tuple(ci[2:6]), tuple(ci[6:10]))
        out8 = paste_back_frames(out8, full, crop_info)

    write_video(out8.astype(np.float32) / 255.0, args.output, fps=args.fps)
    print(f"wrote {args.output} ({out8.shape[0]} frames "
          f"@ {out8.shape[2]}x{out8.shape[1]})")


def main(argv=None):
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
