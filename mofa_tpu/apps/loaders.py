"""Model-bundle assembly from reference-format checkpoints.

Mirrors `init_models` (/root/reference/MOFA-Video-Traj/run_gradio.py:90-159):
SVD components from a diffusers tree (`ckpts/stable-video-diffusion-img2vid-
xt-1-1/{unet,vae,image_encoder}`), the MOFA adapter from
`ckpts/controlnet`, CMP from `ckpt_iter_42000.pth.tar` — all converted
through models/weights.py (safetensors -> NHWC/HWIO flax trees). Random
init fallback keeps every app runnable without weights.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from mofa_tpu.models.clip_vision import (
    CLIPVisionModelWithProjection, CLIPVisionConfig)
from mofa_tpu.models.mofa_adapter import FlowControlNet, LdmkFlowControlNet
from mofa_tpu.models.svd_unet import (
    UNetSpatioTemporalConditionModel, SVDUNetConfig)
from mofa_tpu.models.vae import AutoencoderKLTemporalDecoder, VAEConfig
from mofa_tpu.models.weights import (
    convert_torch_state_dict, load_safetensors, load_torch_checkpoint,
    convert_cmp_state_dict)
from mofa_tpu.pipelines.common import ModelBundle

# SVD-XT 1.1 production configs (HF repo config.json values; the reference
# loads them via from_pretrained at run_gradio.py:98-108)
SVD_XT_UNET = SVDUNetConfig()
SVD_XT_VAE = VAEConfig()
SVD_XT_CLIP = CLIPVisionConfig()


def _find_weights(subdir: str) -> Optional[str]:
    for name in ("diffusion_pytorch_model.safetensors", "model.safetensors",
                 "diffusion_pytorch_model.bin", "pytorch_model.bin"):
        p = os.path.join(subdir, name)
        if os.path.exists(p):
            return p
    return None


def _load_sd(path: str):
    if path.endswith(".safetensors"):
        return load_safetensors(path)
    return load_torch_checkpoint(path)


def _init_and_convert(module, init_args, ckpt_subdir, desc, strict=True):
    # Init on the HOST: keeps fp32 init tensors out of HBM entirely (the
    # fp32->bf16 cast would otherwise transiently hold both copies on
    # device, fragmenting a 16 GB chip before the real work starts).
    # close over args so non-array statics (e.g. VAE num_frames) stay python
    key, *rest = init_args
    params = jax.jit(lambda k: module.init(k, *rest), backend="cpu")(key)
    wpath = _find_weights(ckpt_subdir) if ckpt_subdir else None
    if wpath is None:
        print(f"[loaders] {desc}: no weights at {ckpt_subdir!r}; random init")
        return params
    sd = _load_sd(wpath)
    return convert_torch_state_dict(params, sd, strict=strict)


def load_bundle(svd_dir: Optional[str] = None,
                controlnet_dir: Optional[str] = None,
                controlnet2_dir: Optional[str] = None,
                ldmk: bool = False,
                unet_cfg: SVDUNetConfig = SVD_XT_UNET,
                vae_cfg: VAEConfig = SVD_XT_VAE,
                clip_cfg: CLIPVisionConfig = SVD_XT_CLIP,
                dtype=jnp.float32,
                image_size=(64, 64), num_frames: int = 3) -> ModelBundle:
    """Assemble a ModelBundle; any missing directory falls back to random
    init (tiny-shape tracing keeps init cheap; weights define real shapes)."""
    h, w = image_size
    t = num_frames
    k = jax.random.PRNGKey(0)

    unet = UNetSpatioTemporalConditionModel(unet_cfg)
    sample = jnp.zeros((1, t, h // 8, w // 8, unet_cfg.in_channels))
    ehs = jnp.zeros((1, 1, unet_cfg.cross_attention_dim))
    ids = jnp.zeros((1, 3))
    unet_params = _init_and_convert(
        unet, (k, sample, 1.0, ehs, ids),
        os.path.join(svd_dir, "unet") if svd_dir else None, "SVD UNet")

    vae = AutoencoderKLTemporalDecoder(vae_cfg)
    vae_params = _init_and_convert(
        vae, (k, jnp.zeros((1, h, w, 3)), 1),
        os.path.join(svd_dir, "vae") if svd_dir else None, "VAE")

    clip = CLIPVisionModelWithProjection(clip_cfg)
    clip_params = _init_and_convert(
        clip, (k, jnp.zeros((1, clip_cfg.image_size, clip_cfg.image_size, 3))),
        os.path.join(svd_dir, "image_encoder") if svd_dir else None,
        "CLIP vision", strict=False)

    cond = jnp.zeros((1, h, w, 3))
    flow = jnp.zeros((1, t - 1, h, w, 2))
    if ldmk:
        cn = LdmkFlowControlNet(unet_cfg)
        lmk = jnp.zeros((1, t, h, w, 3))
        cn_params = _init_and_convert(
            cn, (k, sample, 1.0, ehs, ids, cond, flow, lmk),
            controlnet_dir, "Ldmk MOFA-Adapter")
    else:
        cn = FlowControlNet(unet_cfg)
        cn_params = _init_and_convert(
            cn, (k, sample, 1.0, ehs, ids, cond, flow), controlnet_dir,
            "MOFA-Adapter")

    cn2 = cn2_params = None
    if controlnet2_dir is not None:
        cn2 = FlowControlNet(unet_cfg)
        cn2_params = _init_and_convert(
            cn2, (k, sample, 1.0, ehs, ids, cond, flow), controlnet2_dir,
            "Drag MOFA-Adapter")

    bundle = ModelBundle(unet, unet_params, cn, cn_params, vae, vae_params,
                         clip, clip_params, cn2, cn2_params)
    device = jax.devices()[0]

    def ship(tree):
        # cast on host, then move ONLY the target-dtype copy to the device
        tree = jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)
        return jax.device_put(tree, device)

    bundle.unet_params = ship(bundle.unet_params)
    bundle.controlnet_params = ship(bundle.controlnet_params)
    bundle.vae_params = ship(bundle.vae_params)
    bundle.clip_params = ship(bundle.clip_params)
    if cn2_params is not None:
        bundle.controlnet2_params = ship(bundle.controlnet2_params)
    return bundle


def load_cmp_params(ckpt_path: Optional[str] = None, size: int = 384):
    """CMP params (resnet50 + shallownet8x + SkipLayer decoder), converted
    from `ckpt_iter_42000.pth.tar` when available."""
    from mofa_tpu.models.cmp.model import CMP
    cmp = CMP()
    k = jax.random.PRNGKey(0)
    params = jax.jit(cmp.init)(
        k, jnp.zeros((1, size, size, 3)), jnp.zeros((1, size, size, 2)),
        jnp.zeros((1, size, size, 2)))
    if ckpt_path and os.path.exists(ckpt_path):
        sd = load_torch_checkpoint(ckpt_path)
        params = convert_cmp_state_dict(params, sd)
    else:
        if ckpt_path:
            print(f"[loaders] CMP: no checkpoint at {ckpt_path}; random init")
    return params


def write_video(frames01, path: str, fps: int = 7):
    """[T, H, W, 3] float in [0,1] -> mp4 (cv2) or gif (PIL)."""
    import numpy as np
    frames = (np.asarray(frames01) * 255).clip(0, 255).astype("uint8")
    if path.endswith(".gif"):
        from PIL import Image
        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)
        return
    import cv2
    h, w = frames.shape[1:3]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()
