"""Audio -> landmarks.npy CLI (AniPortrait path).

Stage-for-stage replacement of
/root/reference/MOFA-Video-Hybrid/aniportrait/audio2ldmk.py: wav ->
wav2vec2 -> Audio2Mesh (+ reference lmks3d) -> Audio2Pose (5s chunks) ->
smooth -> perspective projection -> 468->68 -> landmarks.npy — the exact
npy contract consumed by keypoint_app / hybrid_app.

The reference extracts (lmks, lmks3d, trans_mat) from the still image with
mediapipe's FaceLandmarker (audio2ldmk.py:217-221). Here that stage runs
IN-FRAMEWORK: pass --task pointing at the mediapipe .task bundle (the
reference ships one at aniportrait/src/utils/mp_models/) and
mofa_tpu.models.mp_face.FaceLandmarkerJax extracts lmks/lmks3d/trans_mat
with zero external stages. --face_npz (keys: lmks [478,2 or 3] normalized,
lmks3d [468,3], trans_mat [4,4]) remains as a fallback contract for
pre-computed landmarker output.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="MOFA-TPU audio->landmarks")
    p.add_argument("--ref_image_path", required=True)
    p.add_argument("--audio_path", required=True)
    p.add_argument("--face_npz", default=None,
                   help="pre-computed npz with lmks/lmks3d/trans_mat "
                        "(mediapipe contract); fallback when --task absent")
    p.add_argument("--task", default=None,
                   help="mediapipe face_landmarker .task bundle: run the "
                        "in-framework FaceLandmarkerJax on --ref_image_path "
                        "(replaces the reference's LMKExtractor)")
    p.add_argument("--save_dir", required=True)
    p.add_argument("--a2m_ckpt", default=None, help="audio2mesh.pt")
    p.add_argument("--a2p_ckpt", default=None, help="audio2pose.pt")
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--engine",
                   choices=("aniportrait", "sadtalker", "video"),
                   default="aniportrait")
    p.add_argument("--driving_coeffs_npz", default=None,
                   help="video engine: pre-computed per-frame [T, 70] "
                        "exp+pose track of the driving video")
    p.add_argument("--driving_video", default=None,
                   help="video engine: raw driving .mp4 — fit per-frame "
                        "coeffs IN-FRAMEWORK (BlazeFace via --task, AWing "
                        "FAN via --fan_ckpt, ReconNet via --recon_ckpt, "
                        "--lm3d_mat), replacing --driving_coeffs_npz")
    p.add_argument("--fan_ckpt", default=None,
                   help="facexlib alignment_WFLW_4HG.pth for the FAN stage")
    p.add_argument("--fan_tiny", action="store_true",
                   help="1-module random-weight FAN (tests only)")
    p.add_argument("--recon_ckpt", default=None,
                   help="Deep3DFaceRecon net_recon checkpoint")
    p.add_argument("--recon_tiny", action="store_true",
                   help="tiny random-weight ReconNet (tests only)")
    p.add_argument("--lm3d_mat", default=None,
                   help="similarity_Lm3D_all.mat (BFM fitting dir)")
    p.add_argument("--max_frames", type=int, default=None)
    # sadtalker-engine inputs
    p.add_argument("--bfm_mat", default=None, help="BFM model .mat")
    p.add_argument("--coeff_npz", default=None,
                   help="npz: full_3dmm [1,257], trans_params [8], crop_info")
    p.add_argument("--exp_ckpt", default=None)
    p.add_argument("--pose_ckpt", default=None)
    p.add_argument("--pose_style", type=int, default=0)
    p.add_argument("--face3dvis", action="store_true",
                   help="also render 3dface.mp4 (z-buffer BFM raster) and "
                        "the landmark-dot video, as inference.py --face3dvis")
    p.add_argument("--tiny", action="store_true")
    return p


def extract_face(args, img):
    """(lmks normalized [478,*], lmks3d [468,3], trans_mat [4,4]) from the
    still image: in-framework FaceLandmarkerJax when --task is given
    (reference: mp_utils.LMKExtractor, audio2ldmk.py:207/217), else the
    --face_npz pre-computed contract."""
    import numpy as np
    if args.task:
        from mofa_tpu.models.mp_face import load_face_landmarker
        out = load_face_landmarker(args.task)(np.asarray(img))
        if out is None:
            raise SystemExit("No face detected.")  # audio2ldmk.py:218
        return out
    if not args.face_npz:
        raise SystemExit("need --task (in-framework landmarker) or --face_npz")
    return np.load(args.face_npz)


def run(args):
    if args.engine == "sadtalker":
        return run_sadtalker(args)
    if args.engine == "video":
        return run_video(args)
    from PIL import Image
    from mofa_tpu.models.audio.wav2vec2 import Wav2Vec2Config, TINY_W2V_CONFIG
    from mofa_tpu.models.audio.aniportrait import (
        Audio2Mesh, Audio2Pose, audio_to_landmarks)
    from mofa_tpu.models.weights import (load_torch_checkpoint,
                                         convert_audio_state_dict)

    img = Image.open(args.ref_image_path).convert("RGB")
    width, height = img.size

    face = extract_face(args, img)
    lmks = face["lmks"].astype(np.float32).copy()
    lmks[:, 0] *= width
    lmks[:, 1] *= height
    lmks3d = face["lmks3d"].astype(np.float32)
    trans_mat = face["trans_mat"].astype(np.float32)

    w2v = TINY_W2V_CONFIG if args.tiny else Wav2Vec2Config()
    latent = 64 if args.tiny else 512
    a2m = Audio2Mesh(w2v, latent_dim=latent, out_dim=1404)
    a2p = Audio2Pose(w2v, latent_dim=latent, out_dim=6)

    probe = jnp.zeros((1, args.sr))
    a2m_params = a2m.init(jax.random.PRNGKey(0), probe, args.fps)
    a2p_params = a2p.init(jax.random.PRNGKey(1), probe, args.fps, 42)
    if args.a2m_ckpt:
        a2m_params = convert_audio_state_dict(
            a2m_params, load_torch_checkpoint(args.a2m_ckpt), strict=False)
    if args.a2p_ckpt:
        a2p_params = convert_audio_state_dict(
            a2p_params, load_torch_checkpoint(args.a2p_ckpt), strict=False)

    landmarks = audio_to_landmarks(
        a2m, a2m_params, a2p, a2p_params, args.audio_path,
        lmks, lmks3d, trans_mat, [height, width],
        fps=args.fps, sr=args.sr)

    os.makedirs(args.save_dir, exist_ok=True)
    out = os.path.join(args.save_dir, "landmarks.npy")
    np.save(out, landmarks)
    print(f"wrote {out} {landmarks.shape}")


def main(argv=None):
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()


def run_sadtalker(args):
    """SadTalker engine: wav + first-frame 3DMM fit (--coeff_npz with the
    reference .mat contract) -> landmarks.npy."""
    from mofa_tpu.models.audio.sadtalker import (
        Audio2ExpNet, Audio2PoseCVAE, BFMModel,
        sadtalker_audio_to_landmarks)
    from mofa_tpu.models.audio.aniportrait import load_wav
    from mofa_tpu.models.weights import (
        load_torch_checkpoint, convert_sadtalker_exp, convert_sadtalker_pose)

    data = np.load(args.coeff_npz, allow_pickle=True)
    coeff257 = data["full_3dmm"].astype(np.float32).reshape(1, -1)
    trans_params = data["trans_params"].astype(np.float32).reshape(-1)
    crop_info = data["crop_info"].tolist() if "crop_info" in data else (
        (256, 256), (0, 0, 256, 256), (0, 0, 256, 256))
    bfm = BFMModel.load(args.bfm_mat)

    exp_net = Audio2ExpNet()
    exp_params = exp_net.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 80, 16, 1)), jnp.zeros((1, 64)),
                              jnp.zeros((1, 1)))
    pose_net = Audio2PoseCVAE()
    pose_params = pose_net.init(jax.random.PRNGKey(1),
                                jnp.zeros((1, 34, 80, 16)), jnp.zeros((1, 6)),
                                jnp.asarray([0]), jax.random.PRNGKey(2))
    if args.exp_ckpt:
        exp_params = convert_sadtalker_exp(
            exp_params, load_torch_checkpoint(args.exp_ckpt), strict=False)
    if args.pose_ckpt:
        pose_params = convert_sadtalker_pose(
            pose_params, load_torch_checkpoint(args.pose_ckpt), strict=False)

    wav = load_wav(args.audio_path, args.sr)
    landmarks, all_coeffs = sadtalker_audio_to_landmarks(
        exp_net, exp_params, pose_net, pose_params, bfm, wav, coeff257,
        trans_params, crop_info, pose_style=args.pose_style, fps=args.fps,
        return_coeffs=True)

    os.makedirs(args.save_dir, exist_ok=True)
    out = os.path.join(args.save_dir, "landmarks.npy")
    np.save(out, landmarks)
    print(f"wrote {out} {landmarks.shape}")
    if args.face3dvis:
        _write_face3dvis(args, landmarks, all_coeffs)


def _write_face3dvis(args, landmarks, all_coeffs):
    """visualize.py:99-129 — 3dface.mp4 (rendered BFM mesh, 224x224) and
    the landmark-dot video on a white canvas at the source image size."""
    from mofa_tpu.apps.loaders import write_video
    from mofa_tpu.models.audio.face3d_render import (
        draw_landmark_video, render_face_video)
    from mofa_tpu.models.audio.sadtalker import BFMModel

    bfm = BFMModel.load(args.bfm_mat, with_render_data=True)
    frames = render_face_video(bfm, all_coeffs[1:])  # predicted track
    write_video(frames.astype(np.float32) / 255.0,
                os.path.join(args.save_dir, "3dface.mp4"), fps=args.fps)
    from PIL import Image
    w, h = Image.open(args.ref_image_path).size
    dots = draw_landmark_video(landmarks, h, w)
    write_video(dots.astype(np.float32) / 255.0,
                os.path.join(args.save_dir, "landmarks_vis.mp4"),
                fps=args.fps)
    print(f"wrote {os.path.join(args.save_dir, '3dface.mp4')}")


def _fit_driving(args):
    """Raw driving mp4 -> [T, 70] coeff track, fully in-framework
    (preprocess/video_fit.py): the reference's automatic per-frame chain
    (sadtalker_video2pose/inference.py:79-92)."""
    from mofa_tpu.models.mp_face import load_face_detector
    from mofa_tpu.models.face_alignment import FAN
    from mofa_tpu.models.audio.face3d_fit import ReconNet, load_lm3d
    from mofa_tpu.models.weights import (convert_fan_state_dict,
                                         convert_face3d_recon_state_dict,
                                         load_safetensors,
                                         load_torch_checkpoint)
    from mofa_tpu.preprocess.video_fit import fit_driving_video

    if not args.task:
        raise SystemExit("--driving_video needs --task (BlazeFace weights)")
    if not args.lm3d_mat:
        raise SystemExit("--driving_video needs --lm3d_mat")
    det_fn, det_params = load_face_detector(args.task)

    fan = FAN(num_modules=1) if args.fan_tiny else FAN()
    fan_params = fan.init(jax.random.PRNGKey(0),
                          np.zeros((1, 256, 256, 3), np.float32))
    if args.fan_ckpt:
        fan_params = convert_fan_state_dict(
            fan_params, load_torch_checkpoint(args.fan_ckpt))

    recon = (ReconNet(layers=(1, 1, 1, 1), width=8) if args.recon_tiny
             else ReconNet())
    recon_params = recon.init(jax.random.PRNGKey(1),
                              np.zeros((1, 224, 224, 3), np.float32))
    if args.recon_ckpt:
        sd = (load_safetensors(args.recon_ckpt)
              if args.recon_ckpt.endswith(".safetensors")
              else load_torch_checkpoint(args.recon_ckpt))
        sd = {k[len("face_3drecon."):] if k.startswith("face_3drecon.")
              else k: v for k, v in sd.items()}
        recon_params = convert_face3d_recon_state_dict(recon_params, sd,
                                                       strict=False)
    coeff70, _ = fit_driving_video(
        args.driving_video, det_fn, det_params, fan.apply, fan_params,
        recon, recon_params, load_lm3d(args.lm3d_mat),
        max_frames=args.max_frames)
    return coeff70


def run_video(args):
    """Video-driven engine (sadtalker_video2pose path): driving video's
    per-frame 70-d exp+pose coeffs retarget the reference identity. The
    coeff track comes from --driving_video (raw mp4, in-framework fit) or
    a pre-computed --driving_coeffs_npz."""
    from mofa_tpu.models.audio.sadtalker import (BFMModel,
                                                 sadtalker_video_to_landmarks)
    data = np.load(args.coeff_npz, allow_pickle=True)
    coeff257 = data["full_3dmm"].astype(np.float32).reshape(1, -1)
    trans_params = data["trans_params"].astype(np.float32).reshape(-1)
    crop_info = data["crop_info"].tolist() if "crop_info" in data else (
        (256, 256), (0, 0, 256, 256), (0, 0, 256, 256))
    if args.driving_video:
        driving = _fit_driving(args)
    else:
        if not args.driving_coeffs_npz:
            raise SystemExit("need --driving_video or --driving_coeffs_npz")
        driving = np.load(args.driving_coeffs_npz)["coeff_3dmm"]
    bfm = BFMModel.load(args.bfm_mat)
    landmarks = sadtalker_video_to_landmarks(
        bfm, coeff257, driving, trans_params, crop_info)
    os.makedirs(args.save_dir, exist_ok=True)
    out = os.path.join(args.save_dir, "landmarks.npy")
    np.save(out, landmarks)
    print(f"wrote {out} {landmarks.shape}")
