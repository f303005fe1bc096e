"""3DMM fit CLI — CropAndExtract (utils/preprocess.py:46-175), fully
in-framework: BlazeFace detection (--task) + AWing FAN alignment
(--fan_ckpt) replace the facexlib RetinaFace+FAN keypoint stage;
precomputed --kp / a manual --bbox remain as overrides.

image + 68-point keypoints (y down; .npy/.txt) -> npz with the
`--coeff_npz` contract consumed by audio2ldmk_app / facerender_app:
full_3dmm [1, 257], coeff_3dmm [1, 76], trans_params [8], crop_info.

Crop modes mirror the reference: 'resize' runs fully in-process; for
'crop' pass --crop_info precomputed by the external face-crop stage
(facexlib), as CropAndExtract does.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="MOFA-TPU 3DMM fit")
    p.add_argument("--image", required=True)
    p.add_argument("--kp", default=None,
                   help="[68, 2] keypoints (.npy or whitespace .txt); "
                        "omit to detect in-framework with --fan_ckpt")
    p.add_argument("--fan_ckpt", default=None,
                   help="facexlib alignment_WFLW_4HG.pth — run the "
                        "in-framework AWing FAN (models/face_alignment.py) "
                        "instead of external --kp")
    p.add_argument("--bbox", default=None,
                   help="manual face box 'x1,y1,x2,y2' for the FAN crop; "
                        "omit with --task to detect in-framework "
                        "(BlazeFace), or alone to use the full image")
    p.add_argument("--task", default=None,
                   help="mediapipe .task bundle: detect the face box "
                        "in-framework with BlazeFace (models/mp_face.py) "
                        "instead of --bbox")
    p.add_argument("--fan_tiny", action="store_true",
                   help="1-module random-weight FAN (tests only)")
    p.add_argument("--lm3d_mat", required=True,
                   help="similarity_Lm3D_all.mat (BFM fitting dir)")
    p.add_argument("--ckpt", default=None,
                   help="net_recon checkpoint (epoch_*.pth / safetensors)")
    p.add_argument("--save", required=True, help="output npz path")
    p.add_argument("--pic_size", type=int, default=256)
    p.add_argument("--tiny", action="store_true")
    return p


def _detect_kp(args, img_rgb: np.ndarray) -> np.ndarray:
    """In-framework 68-pt detection: face box (--bbox manual, or BlazeFace
    via --task, else the full image), AWing FAN 98-pt, 98->68 map, uncrop —
    the extract_kp_videos_safe.py:64-77 chain with the retinaface detector
    replaced by the in-framework BlazeFace."""
    from mofa_tpu.models.face_alignment import (FAN, get_landmarks,
                                                landmark_98_to_68)
    from mofa_tpu.models.weights import convert_fan_state_dict, \
        load_torch_checkpoint

    h, w = img_rgb.shape[:2]
    if args.bbox:
        x1, y1, x2, y2 = [int(v) for v in args.bbox.split(",")]
    elif args.task:
        from mofa_tpu.models.mp_face import load_face_detector
        from mofa_tpu.preprocess.video_fit import detect_video_boxes
        det_fn, det_params = load_face_detector(args.task)
        box = detect_video_boxes(img_rgb[None], det_fn, det_params)[0]
        x1, y1, x2, y2 = [int(v) for v in box]
    else:
        x1, y1, x2, y2 = 0, 0, w, h
    # guard degenerate (zero-area / boundary-truncated) boxes, same as
    # preprocess/video_fit.py
    crop = img_rgb[y1:max(y2, y1 + 2), x1:max(x2, x1 + 2)]

    net = FAN(num_modules=1) if args.fan_tiny else FAN()
    params = net.init(jax.random.PRNGKey(0),
                      np.zeros((1, 256, 256, 3), np.float32))
    if args.fan_ckpt:
        params = convert_fan_state_dict(params,
                                        load_torch_checkpoint(args.fan_ckpt))
    lm98 = get_landmarks(net.apply, params, crop)
    kp = landmark_98_to_68(lm98)
    kp[:, 0] += x1
    kp[:, 1] += y1
    return kp.astype(np.float32)


def run(args):
    from PIL import Image
    from mofa_tpu.models.audio.face3d_fit import (ReconNet, fit_image,
                                                  load_lm3d)
    from mofa_tpu.models.weights import (convert_face3d_recon_state_dict,
                                         load_safetensors,
                                         load_torch_checkpoint)

    img = Image.open(args.image).convert("RGB")
    img = img.resize((args.pic_size, args.pic_size), Image.BILINEAR)
    if args.kp:
        kp = (np.load(args.kp) if args.kp.endswith(".npy")
              else np.loadtxt(args.kp)).reshape(-1, 2).astype(np.float32)
    elif args.fan_ckpt or args.fan_tiny:
        kp = _detect_kp(args, np.asarray(img))
    else:
        raise SystemExit("need --kp or --fan_ckpt/--fan_tiny")
    lm3d = load_lm3d(args.lm3d_mat)

    net = ReconNet(layers=(1, 1, 1, 1), width=8) if args.tiny else ReconNet()
    params = net.init(jax.random.PRNGKey(0),
                      np.zeros((1, 224, 224, 3), np.float32))
    if args.ckpt:
        sd = (load_safetensors(args.ckpt)
              if args.ckpt.endswith(".safetensors")
              else load_torch_checkpoint(args.ckpt))
        # SadTalker combined safetensors prefixes the net: face_3drecon.*
        sd = {k[len("face_3drecon."):] if k.startswith("face_3drecon.")
              else k: v for k, v in sd.items()}
        params = convert_face3d_recon_state_dict(params, sd, strict=False)

    full, coeff, tp = fit_image(net, params, img, kp, lm3d)
    h, w = args.pic_size, args.pic_size
    crop_info = np.array(((w, h), (0, 0, w, h), (0, 0, w, h)), object)
    os.makedirs(os.path.dirname(os.path.abspath(args.save)), exist_ok=True)
    np.savez(args.save, full_3dmm=full, coeff_3dmm=coeff, trans_params=tp,
             crop_info=crop_info)
    print(f"wrote {args.save} full_3dmm{full.shape} trans_params={tp[:5]}")


def main(argv=None):
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
