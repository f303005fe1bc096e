"""Trajectory pipeline: single-adapter SVD denoise loop as a scanned jit program.

Re-derivation of `FlowControlNetPipeline.__call__`
(/root/reference/MOFA-Video-Traj/pipeline/pipeline.py:282-528) with TPU-first
restructuring:
- the MOFA-Adapter's warped feature stack is computed ONCE per video
  (step/timestep-independent) instead of per denoise step;
- the 25-step Euler loop is a single `lax.scan` inside one jit program;
- CFG batch (uncond, cond) rides the leading axis as in the reference.

Bug-compat quirks preserved (default on):
- `added_time_ids` hardcoded to (fps=6, motion=128, aug=0.02) overriding the
  user values (pipeline.py:430-440);
- CLIP sees un-normalized [0,1] pixels (pipeline.py:114-133);
- per-frame guidance linspace(min, max) (pipeline.py:423-428).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from mofa_tpu.ops.euler import make_euler_schedule, euler_step, scale_model_input
from mofa_tpu.pipelines.common import (
    ModelBundle, encode_clip_image, encode_vae_image, decode_latents,
    decode_latents_jit, get_add_time_ids, params_dtype, postprocess_frames,
)


class TrajPipeline:
    def __init__(self, bundle: ModelBundle, bug_compat: bool = True,
                 mesh=None):
        """mesh: optional jax Mesh — frame-parallel inference (activations
        sharded over the "frames" axis; temporal-attention collectives
        inserted by GSPMD). `self` keys the jit cache, so one pipeline
        instance = one consistent sharding mode."""
        self.bundle = bundle
        self.bug_compat = bug_compat
        self.mesh = mesh

    # jit caches key on `self`: make equal-configured pipelines over the
    # same bundle/mesh share compiled programs across instances
    def __hash__(self):
        return hash((id(self.bundle), id(self.mesh), self.bug_compat))

    def __eq__(self, other):
        return (type(other) is type(self)
                and other.bundle is self.bundle
                and other.mesh is self.mesh
                and other.bug_compat == self.bug_compat)

    def __call__(self, image01: jnp.ndarray, controlnet_flow: jnp.ndarray,
                 num_inference_steps: int = 25,
                 min_guidance_scale: float = 1.0, max_guidance_scale: float = 3.0,
                 fps: int = 7, motion_bucket_id: int = 127,
                 noise_aug_strength: float = 0.02,
                 controlnet_cond_scale: float = 1.0,
                 decode_chunk_size: int = 8,
                 key: Optional[jax.Array] = None,
                 latents: Optional[jnp.ndarray] = None,
                 output_type: str = "np",
                 cfg_split: bool = False,
                 step_chunk: Optional[int] = None,
                 offload_encoders: bool = False):
        """image01: [B, H, W, 3] first frame in [0,1] (already sized /64);
        controlnet_flow: [B, T-1, H, W, 2]. Returns (frames [B,T,H,W,3] in
        [0,1] (or latents), controlnet_flow).

        cfg_split: run the uncond/cond CFG halves sequentially through ONE
        shared-compile `lax.map` body instead of a 2B batch, at half the
        peak activation HBM — required to fit the full 25-frame 576x1024
        video on a single 16 GB v5e chip. Identical math ONLY with
        time_context_hw_major_quirk=False: batch rows are independent
        through the UNet then, and the halves see the same cond
        image/flow. With the quirk ON (the default) the split runs each
        half at B=1, which disables the pairwise hw-major context quirk,
        so outputs differ from both the batched path and the reference
        (see traj_app --cfg_split help; test_pipeline_traj tests the
        equivalence with the quirk off).

        step_chunk: run the Euler loop as ceil(steps/K) calls of ONE
        compiled K-step scan with the latent carry round-tripping through
        the host (identical math; overrun steps in a ragged tail are
        masked to no-ops). The adapter's warped features are encoded once
        in their own program and passed in. Use when a single program
        would run long enough to trip an execution watchdog — the axon
        tunnel kills device programs running >~1 min (T=25 576x1024
        25-step is ~70 s in one program).

        offload_encoders: free the VAE+CLIP device buffers (~1.36 GB
        bf16) for the denoise loop; re-uploaded lazily at decode
        (ModelBundle.offload_encoders, bit-identical outputs)."""
        b = image01.shape[0]
        if (cfg_split and b != 1
                and self.bundle.unet.cfg.time_context_hw_major_quirk):
            # split halves run at even bsz=B; the pairwise hw-major quirk
            # would pair distinct videos as if they were a CFG pair
            raise ValueError(
                "cfg_split requires batch size 1 when "
                "time_context_hw_major_quirk is enabled (got B=%d)" % b)
        t = controlnet_flow.shape[1] + 1
        h, w = image01.shape[1:3]
        key = key if key is not None else jax.random.PRNGKey(42)
        k_noise, k_aug, k_lat = jax.random.split(key, 3)

        sched = make_euler_schedule(num_inference_steps)

        image_embeddings = encode_clip_image(self.bundle, image01, do_cfg=True)

        image_pm1 = image01 * 2.0 - 1.0
        image_pm1 = image_pm1 + noise_aug_strength * jax.random.normal(
            k_aug, image_pm1.shape, image_pm1.dtype)
        image_latents = encode_vae_image(self.bundle, image_pm1, do_cfg=True)
        image_latents = jnp.repeat(image_latents[:, None], t, axis=1)  # [2B,T,h,w,4]

        if self.bug_compat:
            added_time_ids = get_add_time_ids(6, 128, 0.02, b, do_cfg=True)
        else:
            added_time_ids = get_add_time_ids(fps - 1, motion_bucket_id,
                                              noise_aug_strength, b, do_cfg=True)

        if offload_encoders:
            # encodes are done; VAE/CLIP are dead weight until decode
            self.bundle.offload_encoders()

        latent_c = self.bundle.unet.cfg.in_channels // 2
        if latents is None:
            latents = jax.random.normal(k_lat, (b, t, h // 8, w // 8, latent_c),
                                        jnp.float32)
        latents = latents * sched.init_noise_sigma

        # CFG inputs for the adapter
        cond_image = jnp.concatenate([image01 * 2.0 - 1.0] * 2, axis=0)
        flow_cfg = jnp.concatenate([controlnet_flow] * 2, axis=0)

        guidance = jnp.linspace(min_guidance_scale, max_guidance_scale, t)
        guidance = guidance[None, :, None, None, None]

        sigmas = jnp.asarray(sched.sigmas)
        timesteps = jnp.asarray(sched.timesteps)

        if step_chunk is not None and step_chunk < num_inference_steps:
            out_latents = self._denoise_stepchunked(
                latents, image_latents, image_embeddings, added_time_ids,
                cond_image, flow_cfg, guidance, sigmas, timesteps,
                jnp.float32(controlnet_cond_scale), num_inference_steps,
                step_chunk, cfg_split)
        else:
            out_latents = self._denoise_and_decode(
                self.bundle.unet_params, self.bundle.controlnet_params,
                self.bundle.vae_params, latents, image_latents,
                image_embeddings, added_time_ids, cond_image, flow_cfg,
                guidance, sigmas, timesteps,
                jnp.float32(controlnet_cond_scale),
                num_steps=num_inference_steps,
                decode_chunk_size=decode_chunk_size,
                return_latent=True, cfg_split=cfg_split)
        if output_type == "latent":
            return out_latents, controlnet_flow
        # VAE decode runs as its own jit program (HBM peak, see common.py)
        frames = decode_latents_jit(self.bundle, out_latents,
                                    decode_chunk_size, mesh=self.mesh)
        return postprocess_frames(frames), controlnet_flow

    @functools.partial(jax.jit, static_argnames=("self", "num_steps",
                                                 "decode_chunk_size",
                                                 "return_latent", "cfg_split"))
    def _denoise_and_decode(self, unet_params, cn_params, vae_params, latents,
                            image_latents, image_embeddings, added_time_ids,
                            cond_image, flow_cfg, guidance, sigmas, timesteps,
                            cond_scale, *, num_steps: int,
                            decode_chunk_size: int, return_latent: bool,
                            cfg_split: bool = False):
        import contextlib
        from mofa_tpu.parallel.activation import frame_parallel
        ctx = (frame_parallel(self.mesh) if self.mesh is not None
               else contextlib.nullcontext())
        with ctx:
            return self._denoise_body(
                unet_params, cn_params, vae_params, latents, image_latents,
                image_embeddings, added_time_ids, cond_image, flow_cfg,
                guidance, sigmas, timesteps, cond_scale, num_steps,
                decode_chunk_size, return_latent, cfg_split)

    def _encode_inject_traced(self, cn_params, cond_image, flow_cfg):
        """Step-independent warped feature stack (warp once per video)."""
        bundle = self.bundle
        inject = bundle.controlnet.apply(
            cn_params, cond_image, flow_cfg,
            method=type(bundle.controlnet).encode_features)
        if isinstance(inject, tuple):    # ldmk adapter returns (inject, occ_masks)
            inject = inject[0]
        return list(inject)

    def _make_step_fn(self, unet_params, cn_params, inject, image_latents,
                      image_embeddings, added_time_ids, guidance, sigmas,
                      timesteps, cond_scale, num_steps, cfg_split, cd):
        """Shared Euler-step body for the full-scan and step-chunked paths.

        The returned step_fn(lat, idx) takes a GLOBAL step index; idx >=
        num_steps is a masked no-op (lets a ragged step_chunk tail reuse
        the same compiled program)."""
        bundle = self.bundle
        b = image_latents.shape[0] // 2

        def model_call(latent_in, ts, ehs, ids):
            down_res, mid_res = bundle.controlnet.apply(
                cn_params, latent_in, ts, ehs, ids,
                conditioning_scale=cond_scale,
                precomputed_features=inject)
            return bundle.unet.apply(
                unet_params, latent_in, ts, ehs, ids,
                down_block_additional_residuals=down_res,
                mid_block_additional_residual=mid_res)

        if cfg_split:
            # [2B, ...] CFG-major stacks -> [2, B, ...] for the lax.map
            il2 = image_latents.reshape((2, b) + image_latents.shape[1:])
            ehs2 = image_embeddings.reshape((2, b) + image_embeddings.shape[1:])
            ids2 = added_time_ids.reshape((2, b) + added_time_ids.shape[1:])

        def step_fn(lat, idx):
            safe = jnp.minimum(idx, num_steps - 1)
            sigma = sigmas[safe]
            sigma_next = sigmas[safe + 1]
            ts = timesteps[safe]
            if cfg_split:
                # sequential halves through ONE compiled body: half the
                # peak activation HBM, half the UNet program size
                scaled = scale_model_input(lat, sigma).astype(cd)
                preds = jax.lax.map(
                    lambda side: model_call(
                        jnp.concatenate([scaled, side[0]], axis=-1),
                        ts, side[1], side[2]),
                    (il2, ehs2, ids2))                  # [2, B, T, h, w, 4]
                uncond, cond = preds[0], preds[1]
            else:
                latent_in = jnp.concatenate([lat] * 2, axis=0)
                latent_in = scale_model_input(latent_in, sigma)
                latent_in = jnp.concatenate(
                    [latent_in.astype(cd), image_latents], axis=-1)
                noise_pred = model_call(latent_in, ts, image_embeddings,
                                        added_time_ids)
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
            noise_pred = uncond + guidance.astype(cond.dtype) * (cond - uncond)
            new_lat, _ = euler_step(noise_pred, lat, sigma, sigma_next)
            new_lat = jnp.where(idx < num_steps, new_lat, lat)
            return new_lat, None

        return step_fn

    def _denoise_body(self, unet_params, cn_params, vae_params, latents,
                      image_latents, image_embeddings, added_time_ids,
                      cond_image, flow_cfg, guidance, sigmas, timesteps,
                      cond_scale, num_steps, decode_chunk_size, return_latent,
                      cfg_split=False):
        bundle = self.bundle
        # model compute dtype: cast all MODEL inputs to the param dtype so
        # a bf16 bundle runs the UNet/adapter on the bf16 MXU path; the
        # latent carry + Euler math stay fp32 (see common.params_dtype)
        cd = params_dtype(unet_params)
        image_latents = image_latents.astype(cd)
        image_embeddings = image_embeddings.astype(cd)
        cond_image = cond_image.astype(cd)
        flow_cfg = flow_cfg.astype(cd)
        b = latents.shape[0]
        if cfg_split:
            # both CFG halves see the SAME cond image/flow (the reference
            # concats identical halves, pipeline.py:393-396): encode the
            # warped features once for B rows and share them across sides
            cond_image, flow_cfg = cond_image[:b], flow_cfg[:b]
        inject = self._encode_inject_traced(cn_params, cond_image, flow_cfg)

        step_fn = self._make_step_fn(
            unet_params, cn_params, inject, image_latents, image_embeddings,
            added_time_ids, guidance, sigmas, timesteps, cond_scale,
            num_steps, cfg_split, cd)
        latents, _ = jax.lax.scan(step_fn, latents, jnp.arange(num_steps))
        if return_latent:
            return latents
        return decode_latents(bundle, latents, decode_chunk_size,
                              vae_params=vae_params)

    @functools.partial(jax.jit, static_argnames=("self", "cfg_split"))
    def _encode_inject(self, cn_params, cond_image, flow_cfg, *,
                       cfg_split: bool = False):
        import contextlib
        from mofa_tpu.parallel.activation import frame_parallel
        ctx = (frame_parallel(self.mesh) if self.mesh is not None
               else contextlib.nullcontext())
        with ctx:
            cd = params_dtype(cn_params)
            return self._encode_inject_traced(
                cn_params, cond_image.astype(cd), flow_cfg.astype(cd))

    @functools.partial(jax.jit, static_argnames=("self", "k", "num_steps",
                                                 "cfg_split"))
    def _denoise_chunk(self, unet_params, cn_params, inject, lat,
                       image_latents, image_embeddings, added_time_ids,
                       guidance, sigmas, timesteps, cond_scale, start, *,
                       k: int, num_steps: int, cfg_split: bool):
        """K steps of the Euler loop starting at global step `start` (a
        device scalar — one compiled program serves every chunk)."""
        import contextlib
        from mofa_tpu.parallel.activation import frame_parallel
        ctx = (frame_parallel(self.mesh) if self.mesh is not None
               else contextlib.nullcontext())
        with ctx:
            cd = params_dtype(unet_params)
            step_fn = self._make_step_fn(
                unet_params, cn_params, inject,
                image_latents.astype(cd), image_embeddings.astype(cd),
                added_time_ids, guidance, sigmas, timesteps, cond_scale,
                num_steps, cfg_split, cd)
            lat, _ = jax.lax.scan(step_fn, lat, start + jnp.arange(k))
            return lat

    def _denoise_stepchunked(self, latents, image_latents, image_embeddings,
                             added_time_ids, cond_image, flow_cfg, guidance,
                             sigmas, timesteps, cond_scale, num_steps,
                             step_chunk, cfg_split):
        bundle = self.bundle
        if cfg_split:
            b = latents.shape[0]
            cond_image, flow_cfg = cond_image[:b], flow_cfg[:b]
        inject = self._encode_inject(bundle.controlnet_params, cond_image,
                                     flow_cfg, cfg_split=cfg_split)
        lat = latents
        for s0 in range(0, num_steps, step_chunk):
            lat = self._denoise_chunk(
                bundle.unet_params, bundle.controlnet_params, inject, lat,
                image_latents, image_embeddings, added_time_ids, guidance,
                sigmas, timesteps, cond_scale, jnp.int32(s0),
                k=step_chunk, num_steps=num_steps, cfg_split=cfg_split)
        return lat
