"""Post-processing: face paste-back + enhancer stage contract.

Covers the reference's facerender post-processing half
(/root/reference/MOFA-Video-Hybrid/sadtalker_audio2pose/src/utils/
paste_pic.py and face_enhancer.py):

- `paste_back_frames` reproduces paste_pic.py:38-66: resize each generated
  face-crop frame to the original crop box and Poisson-blend
  (cv2.seamlessClone NORMAL_CLONE) into the full source image at the box
  center. crop_info is the 3-tuple CropAndExtract produces
  ((r_w, r_h), (clx, cly, crx, cry), (lx, ly, rx, ry)) — the same object
  models/audio/face3d_fit.py's crop path emits.

- `enhance_frames` is the face-enhancer hook (face_enhancer.py:42-123):
    method="none"    passthrough (reference default when --enhancer unset)
    method="gfpgan"  IN-FRAMEWORK GFPGAN v1 clean (models/gfpgan.py) in the
                     aligned-crop mode (GFPGANer(has_aligned=True)): each
                     frame is an aligned face crop, resized to the model
                     size, restored, resized back. Pass ckpt=GFPGANv1.4.pth.
    method="npz"     frames restored offline by any enhancer, stored as
                     {"frames": uint8 [T, H, W, 3] RGB} — shape-checked
                     (escape hatch for detection-based whole-scene
                     enhancement, whose retinaface detector stays external
                     per README "Deliberate omissions")
"""

from __future__ import annotations

import numpy as np


def crop_box(crop_info, extended_crop: bool = False):
    """Original-image box (ox1, oy1, ox2, oy2) targeted by the paste
    (paste_pic.py:44-55)."""
    if len(crop_info) != 3:
        raise ValueError("crop_info must be ((rw,rh),(clx,cly,crx,cry),"
                         "(lx,ly,rx,ry))")
    _, (clx, cly, crx, cry), (lx, ly, rx, ry) = crop_info
    lx, ly, rx, ry = int(lx), int(ly), int(rx), int(ry)
    if extended_crop:
        return int(clx), int(cly), int(crx), int(cry)
    return int(clx) + lx, int(cly) + ly, int(clx) + rx, int(cly) + ry


def paste_back_frames(crop_frames: np.ndarray, full_img: np.ndarray,
                      crop_info, extended_crop: bool = False) -> np.ndarray:
    """crop_frames [T, h, w, 3] uint8 RGB; full_img [H, W, 3] uint8 RGB.
    Returns [T, H, W, 3] uint8 — each frame seamless-cloned into full_img.
    """
    import cv2

    ox1, oy1, ox2, oy2 = crop_box(crop_info, extended_crop)
    h, w = full_img.shape[:2]
    ox1, ox2 = np.clip([ox1, ox2], 0, w).tolist()
    oy1, oy2 = np.clip([oy1, oy2], 0, h).tolist()
    if ox2 <= ox1 or oy2 <= oy1:
        raise ValueError(f"empty paste box {(ox1, oy1, ox2, oy2)}")
    location = ((ox1 + ox2) // 2, (oy1 + oy2) // 2)
    out = []
    for frame in np.asarray(crop_frames, np.uint8):
        p = cv2.resize(frame, (ox2 - ox1, oy2 - oy1))
        mask = 255 * np.ones(p.shape, p.dtype)
        out.append(cv2.seamlessClone(p, full_img, mask, location,
                                     cv2.NORMAL_CLONE))
    return np.stack(out)


def enhance_frames(frames: np.ndarray, method: str = "none",
                   npz_path: str | None = None,
                   ckpt: str | None = None, tiny: bool = False) -> np.ndarray:
    """Face-enhancer stage (face_enhancer.py contract). frames [T,H,W,3]
    uint8 RGB -> same shape/dtype (the reference's GFPGAN upscale=2 output
    is resized back by its caller, so shape is preserved end-to-end)."""
    frames = np.asarray(frames)
    if method in ("none", None, ""):
        return frames
    if method == "gfpgan":
        import jax
        import jax.numpy as jnp
        from mofa_tpu.models.gfpgan import (GFPGANv1Clean,
                                            TINY_GFPGAN_CONFIG,
                                            enhance_aligned)
        from mofa_tpu.models.weights import (convert_gfpgan_state_dict,
                                             load_torch_checkpoint)
        model = (GFPGANv1Clean(**TINY_GFPGAN_CONFIG) if tiny
                 else GFPGANv1Clean())
        s = model.out_size
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, s, s, 3), jnp.float32))
        if ckpt:
            params = convert_gfpgan_state_dict(params,
                                               load_torch_checkpoint(ckpt))
        elif not tiny:
            raise ValueError("method='gfpgan' needs ckpt=GFPGANv1.4.pth")
        out = enhance_aligned(model, params,
                              frames.astype(np.float32) / 255.0)
        return (out * 255.0 + 0.5).astype(np.uint8)
    if method == "npz":
        if not npz_path:
            raise ValueError("method='npz' needs npz_path "
                             "({'frames': uint8 [T,H,W,3]})")
        data = np.load(npz_path)
        enhanced = np.asarray(data["frames"])
        if enhanced.shape[0] != frames.shape[0]:
            raise ValueError(
                f"enhanced npz has {enhanced.shape[0]} frames, "
                f"expected {frames.shape[0]}")
        if enhanced.ndim != 4 or enhanced.shape[-1] != 3:
            raise ValueError(f"bad enhanced frames shape {enhanced.shape}")
        return enhanced.astype(np.uint8)
    raise ValueError(f"unknown enhancer '{method}'")
