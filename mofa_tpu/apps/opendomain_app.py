"""One-shot keypoint facial-animation driver: audio -> landmarks -> video.

Replacement for /root/reference/MOFA-Video-Keypoint/inference_opendomain.py,
which chains three CUDA processes via os.system (landmark generator,
mofa_keypoint.py, ffmpeg mux). Here the stages run in-process: the
audio2ldmk engine (aniportrait or sadtalker) emits landmarks.npy, the
windowed keypoint pipeline renders, and the audio is muxed with ffmpeg
when available.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess


def build_parser():
    p = argparse.ArgumentParser(
        description="MOFA-TPU open-domain facial animation (audio-driven)")
    p.add_argument("--image", required=True)
    p.add_argument("--audio", required=True)
    p.add_argument("--output", default="output.mp4")
    p.add_argument("--work_dir", default="./opendomain_out")
    p.add_argument("--engine", choices=("aniportrait", "sadtalker"),
                   default="aniportrait")
    p.add_argument("--face_npz", default=None)
    p.add_argument("--coeff_npz", default=None)
    p.add_argument("--bfm_mat", default=None)
    p.add_argument("--a2m_ckpt", default=None)
    p.add_argument("--a2p_ckpt", default=None)
    p.add_argument("--svd_dir", default=None)
    p.add_argument("--controlnet_dir", default=None)
    p.add_argument("--cmp_ckpt", default=None)
    p.add_argument("--num_frames", type=int, default=125)
    p.add_argument("--window_size", type=int, default=25)
    p.add_argument("--window_batch", type=int, default=1)
    p.add_argument("--stride", type=int, default=12)
    p.add_argument("--num_inference_steps", type=int, default=25)
    p.add_argument("--target_size", type=int, default=512)
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--cfg_split", action="store_true",
                   help="forwarded to keypoint_app (implies "
                        "--small_programs there)")
    p.add_argument("--tiny", action="store_true")
    return p


def run(args):
    from mofa_tpu.apps import audio2ldmk_app, keypoint_app

    os.makedirs(args.work_dir, exist_ok=True)

    # stage 1: audio -> landmarks.npy (same contract as the reference)
    ldmk_args = ["--ref_image_path", args.image, "--audio_path", args.audio,
                 "--save_dir", args.work_dir, "--engine", args.engine,
                 "--fps", str(args.fps),
                 "--face_npz", args.face_npz or ""]
    if args.engine == "sadtalker":
        ldmk_args += ["--coeff_npz", args.coeff_npz or "",
                      "--bfm_mat", args.bfm_mat or ""]
    if args.a2m_ckpt:
        ldmk_args += ["--a2m_ckpt", args.a2m_ckpt]
    if args.a2p_ckpt:
        ldmk_args += ["--a2p_ckpt", args.a2p_ckpt]
    if args.tiny:
        ldmk_args += ["--tiny"]
    audio2ldmk_app.main(ldmk_args)
    landmarks_path = os.path.join(args.work_dir, "landmarks.npy")

    # stage 2: landmarks -> windowed video
    silent_path = os.path.join(args.work_dir, "video_silent.mp4")
    kp_args = ["--image", args.image, "--landmarks", landmarks_path,
               "--output", silent_path,
               "--num_frames", str(args.num_frames),
               "--window_size", str(args.window_size),
               "--stride", str(args.stride),
               "--window_batch", str(args.window_batch),
               "--num_inference_steps", str(args.num_inference_steps),
               "--target_size", str(args.target_size),
               "--fps", str(args.fps), "--seed", str(args.seed)]
    for flag, val in (("--svd_dir", args.svd_dir),
                      ("--controlnet_dir", args.controlnet_dir),
                      ("--cmp_ckpt", args.cmp_ckpt)):
        if val:
            kp_args += [flag, val]
    if args.bf16:
        kp_args += ["--bf16"]
    if args.cfg_split:
        kp_args += ["--cfg_split", "--small_programs"]
    if args.tiny:
        kp_args += ["--tiny"]
    keypoint_app.main(kp_args)

    # stage 3: mux audio (inference_opendomain.py:169-172)
    if shutil.which("ffmpeg"):
        subprocess.run(["ffmpeg", "-v", "quiet", "-y", "-i", silent_path,
                        "-i", args.audio, "-c:v", "copy", "-shortest",
                        args.output], check=True)
    else:
        shutil.copyfile(silent_path, args.output)
        print("ffmpeg not found: wrote silent video")
    print(f"wrote {args.output}")


def main(argv=None):
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
