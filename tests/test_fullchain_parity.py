"""END-TO-END pipeline parity vs torch at BASELINE.json's CPU config.

This is the full-chain proof the per-module goldens can't give: ONE video
generated twice — by the repo's `TrajPipeline` and by an independent torch
execution of the reference pipeline semantics
(/root/reference/MOFA-Video-Traj/pipeline/pipeline.py:282-528) — from
identical converted random weights, identical latents, identical control
flow. Covers the whole chain: CLIP encode with the un-normalized
antialias-resize quirk (:114-141), VAE encode mode (:339-352), hardcoded
(6,128,0.02) added_time_ids (:431-440), 4-step CFG denoise with per-frame
linspace guidance (:446-511), chunk-local temporal VAE decode (:194-220),
tensor2vid postprocess (:57).

Config: BASELINE.json parity config — traj, 14-frame 256x384, 4 steps,
fp32 — at test-size channel counts (MICRO UNet / TINY VAE / tiny CLIP;
full-size weights don't exist in this image and CPU torch at 1.5B params
is not runnable in a test). Reports PSNR between the two outputs; the
north-star target is >35 dB vs the CUDA reference, and two correct
implementations of the same math in fp32 must clear it by a wide margin.

The torch side reuses tests/torch_ref/{svd,vae,clip}_torch.py (themselves
golden-tested module-by-module) and the schedule tables of ops/euler.py
(golden vs the vendored scheduler in test_euler.py); the Euler update and
CFG math are written out independently below.
"""

import ast

import numpy as np
import torch
import jax
import jax.numpy as jnp

from mofa_tpu.models.svd_unet import (UNetSpatioTemporalConditionModel,
                                      MICRO_UNET_CONFIG)
from mofa_tpu.models.mofa_adapter import FlowControlNet
from mofa_tpu.models.vae import (AutoencoderKLTemporalDecoder,
                                 TINY_VAE_CONFIG)
from mofa_tpu.models.clip_vision import (CLIPVisionModelWithProjection,
                                         CLIPVisionConfig)
from mofa_tpu.models.weights import (convert_torch_state_dict,
                                     convert_flow_controlnet_state_dict,
                                     convert_vae_state_dict,
                                     convert_clip_vision_state_dict)
from mofa_tpu.ops.euler import make_euler_schedule
from mofa_tpu.pipelines.common import ModelBundle
from mofa_tpu.pipelines.traj import TrajPipeline
from tests.torch_ref.svd_torch import (
    UNetSpatioTemporalConditionControlNetModelTorch, FlowControlNetTorch)
from tests.torch_ref.vae_torch import AutoencoderKLTemporalDecoderTorch
from tests.torch_ref.clip_torch import CLIPVisionModelWithProjectionTorch

PIPELINE_REF = "/root/reference/MOFA-Video-Traj/pipeline/pipeline.py"

# BASELINE.json: "MOFA-Video-Traj: single drag trajectory, 14-frame
# 256x384, 4 DDIM steps, fp32 (CPU-runnable)"
H, W, T, STEPS = 256, 384, 14, 4
CLIP_CFG = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                            num_layers=2, num_heads=2, patch_size=16,
                            image_size=48,
                            projection_dim=MICRO_UNET_CONFIG.cross_attention_dim)


def _reference_resize():
    tree = ast.parse(open(PIPELINE_REF).read())
    keep = [n for n in tree.body if isinstance(n, ast.FunctionDef)
            and n.name in ("_resize_with_antialiasing", "_compute_padding",
                           "_filter2d", "_gaussian", "_gaussian_blur2d")]
    ns = {"torch": torch}
    exec(compile(ast.Module(body=keep, type_ignores=[]), PIPELINE_REF,
                 "exec"), ns)
    return ns["_resize_with_antialiasing"]


def _build_pair():
    """Torch modules + converted Flax bundle (identical weights)."""
    torch.manual_seed(0)
    ucfg, vcfg = MICRO_UNET_CONFIG, TINY_VAE_CONFIG
    tm_unet = UNetSpatioTemporalConditionControlNetModelTorch(ucfg).eval()
    tm_cn = FlowControlNetTorch(ucfg).eval()
    tm_vae = AutoencoderKLTemporalDecoderTorch(
        block_out_channels=vcfg.block_out_channels,
        layers_per_block=vcfg.layers_per_block,
        latent_channels=vcfg.latent_channels).eval()
    tm_clip = CLIPVisionModelWithProjectionTorch(
        hidden_size=CLIP_CFG.hidden_size,
        intermediate_size=CLIP_CFG.intermediate_size,
        num_layers=CLIP_CFG.num_layers, num_heads=CLIP_CFG.num_heads,
        patch_size=CLIP_CFG.patch_size, image_size=CLIP_CFG.image_size,
        projection_dim=CLIP_CFG.projection_dim).eval()

    bundle = ModelBundle.init_random(
        jax.random.PRNGKey(0), ucfg, vcfg, CLIP_CFG,
        image_size=(64, 64), num_frames=2)
    vae_sd = {k: v for k, v in tm_vae.state_dict().items()
              if not k.startswith("decoder.mid_block.attentions.")}
    bundle.unet_params = convert_torch_state_dict(bundle.unet_params,
                                                  tm_unet.state_dict())
    bundle.controlnet_params = convert_flow_controlnet_state_dict(
        bundle.controlnet_params, tm_cn.state_dict())
    bundle.vae_params = convert_vae_state_dict(bundle.vae_params, vae_sd)
    bundle.clip_params = convert_clip_vision_state_dict(bundle.clip_params,
                                                        tm_clip.state_dict())
    return bundle, tm_unet, tm_cn, tm_vae, tm_clip


def _torch_chain(tm_unet, tm_cn, tm_vae, tm_clip, image01, flow, latents0):
    """The reference __call__ (pipeline.py:282-528), torch, fp32, aug=0."""
    sched = make_euler_schedule(STEPS)
    img_nchw = torch.from_numpy(np.moveaxis(image01, -1, 1).copy())

    # 3. CLIP with the un-normalized [0,1] antialias-resize quirk (:114-141)
    resize = _reference_resize()
    emb = tm_clip(resize(img_nchw, (CLIP_CFG.image_size,) * 2)).unsqueeze(1)
    image_embeddings = torch.cat([torch.zeros_like(emb), emb])

    # 4. VAE encode of the preprocessed ([-1,1]) image, mode(), CFG zeros,
    #    frame repeat (:339-359; noise_aug_strength=0 for determinism)
    image_pm1 = img_nchw * 2.0 - 1.0
    lat = tm_vae.encode_mode(image_pm1)
    image_latents = torch.cat([torch.zeros_like(lat), lat])
    image_latents = image_latents.unsqueeze(1).repeat(1, T, 1, 1, 1)

    # 5. hardcoded added_time_ids quirk (:431-440)
    ids = torch.tensor([[6.0, 128.0, 0.02]]).repeat(2, 1)

    # 6-7. latents, cond stacks, per-frame guidance (:377-427)
    latents = torch.from_numpy(np.moveaxis(latents0, -1, 2).copy())
    latents = latents * sched.init_noise_sigma
    cond = torch.cat([image_pm1] * 2)
    flow_t = torch.from_numpy(np.moveaxis(flow, -1, 2).copy())
    flow_cfg = torch.cat([flow_t] * 2)
    guidance = torch.linspace(1.0, 3.0, T)[None, :, None, None, None]

    # 8. denoise loop (:446-511); scale/step math per the vendored
    # scheduler (scheduling_euler_discrete_karras_fix.py:398-440)
    for i in range(STEPS):
        sigma = float(sched.sigmas[i])
        sigma_next = float(sched.sigmas[i + 1])
        ts = float(sched.timesteps[i])
        lat_in = torch.cat([latents] * 2) / float(np.sqrt(sigma ** 2 + 1))
        lat_in = torch.cat([lat_in, image_latents], dim=2)
        down, mid = tm_cn(lat_in, ts, image_embeddings, ids, cond, flow_cfg,
                          conditioning_scale=1.0)
        pred = tm_unet(lat_in, ts, image_embeddings, ids, down, mid)
        unc, cnd = pred.chunk(2)
        pred = unc + guidance * (cnd - unc)
        pred_x0 = (pred * (-sigma / float(np.sqrt(sigma ** 2 + 1)))
                   + latents / (sigma ** 2 + 1))
        latents = latents + (latents - pred_x0) / sigma * (sigma_next - sigma)

    # decode_latents: chunk-local temporal convs (:194-220)
    flat = latents.flatten(0, 1) / tm_vae.scaling_factor
    frames = []
    for i in range(0, flat.shape[0], 8):
        chunk = flat[i:i + 8]
        frames.append(tm_vae.decode(chunk, chunk.shape[0]))
    frames = torch.cat(frames, 0)
    # tensor2vid 'np' postprocess (:57, VaeImageProcessor.postprocess)
    out = (frames / 2 + 0.5).clamp(0, 1)
    return np.moveaxis(out.numpy(), 1, -1)[None]     # [1, T, H, W, 3]


def test_fullchain_traj_parity_psnr():
    bundle, tm_unet, tm_cn, tm_vae, tm_clip = _build_pair()
    rng = np.random.RandomState(42)
    image01 = rng.rand(1, H, W, 3).astype(np.float32)
    flow = (rng.rand(1, T - 1, H, W, 2).astype(np.float32) * 6 - 3)
    latents0 = rng.randn(1, T, H // 8, W // 8, 4).astype(np.float32)

    with torch.no_grad():
        ref = _torch_chain(tm_unet, tm_cn, tm_vae, tm_clip, image01, flow,
                           latents0)

    pipe = TrajPipeline(bundle, bug_compat=True)
    got, _ = pipe(
        jnp.asarray(image01), jnp.asarray(flow),
        num_inference_steps=STEPS, noise_aug_strength=0.0,
        latents=jnp.asarray(latents0), decode_chunk_size=8,
        output_type="np")
    got = np.asarray(got)

    assert got.shape == ref.shape == (1, T, H, W, 3)
    mse = float(np.mean((got - ref) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    print(f"\nfull-chain traj parity: PSNR {psnr:.1f} dB "
          f"(max|diff| {np.abs(got - ref).max():.2e})")
    # north-star target is >35 dB vs the reference; same-math fp32
    # implementations must clear it with a wide margin
    assert psnr > 45.0, f"full-chain PSNR {psnr:.1f} dB"
