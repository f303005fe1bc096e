"""Shared pipeline pieces: model bundle, encoders, CFG helpers, VAE decode.

Mirrors FlowControlNetPipeline internals
(/root/reference/MOFA-Video-Traj/pipeline/pipeline.py) as pure functions
over a `ModelBundle` of Flax modules + params. All image tensors are
channel-last; frames layout [B, T, H, W, C].
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from mofa_tpu.models.clip_vision import CLIPVisionModelWithProjection, CLIPVisionConfig
from mofa_tpu.models.mofa_adapter import FlowControlNet, LdmkFlowControlNet
from mofa_tpu.models.svd_unet import UNetSpatioTemporalConditionModel, SVDUNetConfig
from mofa_tpu.models.vae import AutoencoderKLTemporalDecoder, VAEConfig
from mofa_tpu.ops.resize import resize_antialias_hw


@dataclasses.dataclass
class ModelBundle:
    unet: UNetSpatioTemporalConditionModel
    unet_params: Any
    controlnet: Any                      # FlowControlNet | LdmkFlowControlNet
    controlnet_params: Any
    vae: AutoencoderKLTemporalDecoder
    vae_params: Any
    clip: CLIPVisionModelWithProjection
    clip_params: Any
    # optional second adapter (Hybrid dual-control)
    controlnet2: Any = None
    controlnet2_params: Any = None
    # host staging for phase-scoped encoder residency (offload_encoders)
    _vae_host: Any = dataclasses.field(default=None, repr=False)
    _clip_host: Any = dataclasses.field(default=None, repr=False)

    # -- phase-scoped encoder residency -------------------------------
    # VAE + CLIP params (~1.36 GB bf16 at the SVD config) are dead weight
    # during the denoise loop: CLIP runs once at encode, the VAE at
    # encode + final decode. The reference holds everything resident on a
    # 24 GB+ CUDA GPU (run_gradio_audio_driven.py loads all five modules
    # up front); on a 16 GB v5e that margin is what the dual-adapter
    # flagship needs for its second residual stack. Offload keeps a host
    # copy (fetched once) and deletes the device buffers; ensure_* lazily
    # re-uploads before the next encoder/decoder use.

    def offload_encoders(self) -> None:
        """Free VAE+CLIP device buffers (host copies cached on first call)."""
        for attr, host_attr in (("vae_params", "_vae_host"),
                                ("clip_params", "_clip_host")):
            params = getattr(self, attr)
            if params is None:
                continue
            if getattr(self, host_attr) is None:
                setattr(self, host_attr, jax.device_get(params))
            for leaf in jax.tree_util.tree_leaves(params):
                if isinstance(leaf, jax.Array):
                    leaf.delete()
            setattr(self, attr, None)

    def _ensure(self, attr: str, host_attr: str) -> None:
        if getattr(self, attr) is None:
            host = getattr(self, host_attr)
            assert host is not None, f"{attr} offloaded without a host copy"
            setattr(self, attr, jax.device_put(host))

    def ensure_vae(self) -> None:
        self._ensure("vae_params", "_vae_host")

    def ensure_clip(self) -> None:
        self._ensure("clip_params", "_clip_host")

    @classmethod
    def init_random(cls, key, unet_cfg: SVDUNetConfig, vae_cfg: VAEConfig,
                    clip_cfg: CLIPVisionConfig, ldmk: bool = False,
                    dual: bool = False, image_size=(64, 64), num_frames=3):
        """Random-weight bundle (tests / benchmarks without checkpoints)."""
        h, w = image_size
        t = num_frames
        ks = iter(jax.random.split(key, 8))
        unet = UNetSpatioTemporalConditionModel(unet_cfg)
        sample = jnp.zeros((1, t, h // 8, w // 8, unet_cfg.in_channels))
        ehs = jnp.zeros((1, 1, unet_cfg.cross_attention_dim))
        ids = jnp.zeros((1, 3))
        unet_params = unet.init(next(ks), sample, 1.0, ehs, ids)

        cond = jnp.zeros((1, h, w, 3))
        flow = jnp.zeros((1, t - 1, h, w, 2))
        if ldmk:
            cn = LdmkFlowControlNet(unet_cfg)
            lmk = jnp.zeros((1, t, h, w, 3))
            cn_params = cn.init(next(ks), sample, 1.0, ehs, ids, cond, flow, lmk)
        else:
            cn = FlowControlNet(unet_cfg)
            cn_params = cn.init(next(ks), sample, 1.0, ehs, ids, cond, flow)
        cn2 = cn2_params = None
        if dual:
            cn2 = FlowControlNet(unet_cfg)
            cn2_params = cn2.init(next(ks), sample, 1.0, ehs, ids, cond, flow)

        vae = AutoencoderKLTemporalDecoder(vae_cfg)
        vae_params = vae.init(next(ks), jnp.zeros((1, h, w, 3)), num_frames=1)
        clip = CLIPVisionModelWithProjection(clip_cfg)
        clip_params = clip.init(
            next(ks), jnp.zeros((1, clip_cfg.image_size, clip_cfg.image_size, 3)))
        return cls(unet, unet_params, cn, cn_params, vae, vae_params, clip,
                   clip_params, cn2, cn2_params)


def params_dtype(params) -> jnp.dtype:
    """Compute dtype implied by a param tree (first floating leaf).

    The denoise bodies keep the latent scan-carry and the Euler update in
    fp32 for integration accuracy but must cast MODEL inputs to the
    parameter dtype: flax promotes `bf16 params x fp32 input` to fp32
    compute, so an uncast fp32 latent would silently run the whole UNet
    off the bf16 MXU path (2-3x slower, 2x activation HBM). Mirrors the
    reference's fp16 autocast boundary (pipeline.py:446-511 runs the
    model fp16 while scheduler math stays fp32).

    Quant-aware: int8 weight-only trees (core/quant.py) carry fp32
    scales that must not masquerade as the compute dtype — the dtype is
    taken from the first floating NON-quantized leaf (norm affines and
    biases keep the compute dtype)."""
    from mofa_tpu.core.quant import quant_params_dtype
    dt = quant_params_dtype(params)
    return dt if dt is not None else jnp.float32


@functools.partial(jax.jit, static_argnames=("clip", "do_cfg"))
def _encode_clip_jit(clip, clip_params, image01, do_cfg):
    size = clip.cfg.image_size
    x = jnp.moveaxis(image01, -1, 1)              # to NCHW for hw resize
    x = resize_antialias_hw(x, (size, size))
    x = jnp.moveaxis(x, 1, -1)
    x = x.astype(params_dtype(clip_params))
    emb = clip.apply(clip_params, x)[:, None, :]  # [B, 1, D]
    if do_cfg:
        emb = jnp.concatenate([jnp.zeros_like(emb), emb], axis=0)
    return emb


def encode_clip_image(bundle: ModelBundle, image01: jnp.ndarray,
                      do_cfg: bool) -> jnp.ndarray:
    """[B, H, W, 3] in [0,1] -> [2B or B, 1, proj_dim].

    Replicates the reference quirk of feeding un-normalized [0,1] pixels
    through antialiased bicubic resize (pipeline.py:114-133). Runs as ONE
    module-level jit program: eagerly dispatching the ~hundreds of CLIP
    ops costs ~9 s/video over the axon tunnel (~30 ms RTT per dispatch).
    """
    bundle.ensure_clip()
    return _encode_clip_jit(bundle.clip, bundle.clip_params, image01, do_cfg)


@functools.partial(jax.jit, static_argnames=("vae", "do_cfg"))
def _encode_vae_jit(vae, vae_params, image_pm1, do_cfg):
    image_pm1 = image_pm1.astype(params_dtype(vae_params))
    lat = vae.apply(vae_params, image_pm1,
                    method=AutoencoderKLTemporalDecoder.encode_mode)
    if do_cfg:
        lat = jnp.concatenate([jnp.zeros_like(lat), lat], axis=0)
    return lat


def encode_vae_image(bundle: ModelBundle, image_pm1: jnp.ndarray,
                     do_cfg: bool) -> jnp.ndarray:
    """[B, H, W, 3] in [-1,1] -> latent mean [2B or B, h, w, 4] (UNSCALED,
    matching pipeline.py:143-163). One jit program per shape (see
    encode_clip_image on tunnel dispatch cost)."""
    bundle.ensure_vae()
    return _encode_vae_jit(bundle.vae, bundle.vae_params, image_pm1, do_cfg)


def decode_latents(bundle: ModelBundle, latents: jnp.ndarray,
                   decode_chunk_size: int = 8, vae_params=None) -> jnp.ndarray:
    """[B, T, h, w, 4] -> frames [B, T, H, W, 3] fp32 in [-1,1].

    Chunked temporal decode with chunk-local temporal convs, matching
    pipeline.py:194-220 (each chunk is its own 'video').
    """
    if vae_params is None:
        bundle.ensure_vae()
        vae_params = bundle.vae_params
    b, t = latents.shape[:2]
    flat = latents.reshape((b * t,) + latents.shape[2:])
    flat = (flat / bundle.vae.cfg.scaling_factor).astype(
        params_dtype(vae_params))
    frames = []
    for i in range(0, b * t, decode_chunk_size):
        chunk = flat[i:i + decode_chunk_size]
        dec = bundle.vae.apply(vae_params, chunk, chunk.shape[0],
                               method=AutoencoderKLTemporalDecoder.decode)
        frames.append(dec.astype(jnp.float32))
    out = jnp.concatenate(frames, axis=0)
    return out.reshape((b, t) + out.shape[1:])


@functools.partial(jax.jit, static_argnames=("vae",))
def _decode_chunk_jit(vae, vp, chunk):
    """One chunk's decode as a module-level jit: the compiled program is
    cached across decode_latents_jit CALLS (a per-call inner `@jax.jit`
    would recompile the VAE on every video — 60-150 s of tunnel compile
    each time). flax modules hash by config, so `vae` keys the cache."""
    n = chunk.shape[0]
    chunk = (chunk / vae.cfg.scaling_factor).astype(params_dtype(vp))
    out = vae.apply(vp, chunk, n,
                    method=AutoencoderKLTemporalDecoder.decode)
    return out.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("vae", "mesh"))
def _decode_chunks_sharded_jit(vae, mesh, vp, x):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mofa_tpu.core.mesh import AXES

    x = jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(AXES.frames)))
    return jax.vmap(lambda c: _decode_chunk_jit(vae, vp, c))(x)


def decode_latents_jit(bundle: ModelBundle, latents: jnp.ndarray,
                       decode_chunk_size: int = 8, mesh=None) -> jnp.ndarray:
    """decode_latents as its OWN jit program (one per chunk shape).

    Keeping the VAE decode out of the denoise program lowers the combined
    HBM peak — at 25-frame 512^2 bf16 the fused program exceeds a 16 GB
    chip by ~0.8 GB while the split programs fit.

    With a mesh, the full-size chunks are decoded in one vmapped program
    whose chunk axis is sharded over the "frames" mesh axis: each device
    decodes whole chunks, so the chunk-local temporal-conv semantics of
    pipeline.py:194-220 stay exact and no collective is needed inside the
    decoder. A ragged remainder chunk is decoded separately (padding it
    would change its temporal-conv neighborhood)."""
    bundle.ensure_vae()
    vae = bundle.vae

    b, t = latents.shape[:2]
    flat = latents.reshape((b * t,) + latents.shape[2:])
    n_full = (b * t) // decode_chunk_size
    if mesh is not None and n_full > 1:
        main = flat[:n_full * decode_chunk_size].reshape(
            (n_full, decode_chunk_size) + flat.shape[1:])
        out_main = _decode_chunks_sharded_jit(vae, mesh, bundle.vae_params,
                                              main)
        frames = [out_main.reshape((-1,) + out_main.shape[2:])]
        start = n_full * decode_chunk_size
    else:
        frames, start = [], 0
    frames += [_decode_chunk_jit(vae, bundle.vae_params,
                                 flat[i:i + decode_chunk_size])
               for i in range(start, b * t, decode_chunk_size)]
    out = jnp.concatenate(frames, axis=0)
    return out.reshape((b, t) + out.shape[1:])


def get_add_time_ids(fps: float, motion_bucket_id: float, noise_aug: float,
                     batch_size: int, do_cfg: bool) -> jnp.ndarray:
    ids = jnp.asarray([[fps, motion_bucket_id, noise_aug]], jnp.float32)
    ids = jnp.tile(ids, (batch_size, 1))
    if do_cfg:
        ids = jnp.concatenate([ids, ids], axis=0)
    return ids


def postprocess_frames(frames_pm1: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] -> [0,1] clipped (VaeImageProcessor.postprocess 'np')."""
    return jnp.clip(frames_pm1 / 2 + 0.5, 0.0, 1.0)
