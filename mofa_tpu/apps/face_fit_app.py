"""3DMM fit CLI — CropAndExtract (utils/preprocess.py:46-175) minus the
facexlib keypoint detector.

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
    p.add_argument("--kp", required=True,
                   help="[68, 2] keypoints (.npy or whitespace .txt)")
    p.add_argument("--lm3d_mat", required=True,
                   help="similarity_Lm3D_all.mat (BFM fitting dir)")
    p.add_argument("--ckpt", default=None,
                   help="net_recon checkpoint (epoch_*.pth / safetensors)")
    p.add_argument("--save", required=True, help="output npz path")
    p.add_argument("--pic_size", type=int, default=256)
    p.add_argument("--tiny", action="store_true")
    return p


def run(args):
    from PIL import Image
    from mofa_tpu.models.audio.face3d_fit import (ReconNet, fit_image,
                                                  load_lm3d)
    from mofa_tpu.models.weights import (convert_face3d_recon_state_dict,
                                         load_safetensors,
                                         load_torch_checkpoint)

    img = Image.open(args.image).convert("RGB")
    img = img.resize((args.pic_size, args.pic_size), Image.BILINEAR)
    kp = (np.load(args.kp) if args.kp.endswith(".npy")
          else np.loadtxt(args.kp)).reshape(-1, 2).astype(np.float32)
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
