"""Dual-adapter (face + drag) pipeline for the Hybrid workload.

Re-derivation of `FlowControlNetPipeline.__call__`
(/root/reference/MOFA-Video-Hybrid/pipeline/pipeline.py:287-530): two
MOFA-Adapters run per step — the landmark/face adapter (flow + rasterized
landmarks, scale `ctrl_scale_ldmk`) and the trajectory adapter (drag flow,
scale `ctrl_scale_traj`) — and their residuals are blended per resolution
with a nearest-resized face mask `face*mask + drag*(1-mask)`
(pipeline.py:478-488).

TPU-first: both adapters' warped-feature stacks are step-independent and
hoisted out of the scanned denoise loop; the mask pyramid (one nearest
resize per residual resolution, torch-parity `interp_matrix`) is
precomputed once.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from mofa_tpu.ops.euler import make_euler_schedule, euler_step, scale_model_input
from mofa_tpu.ops.resize import resize_nhwc
from mofa_tpu.pipelines.common import (
    ModelBundle, encode_clip_image, encode_vae_image, decode_latents,
    decode_latents_jit, get_add_time_ids, params_dtype, postprocess_frames,
)


class HybridPipeline:
    """bundle.controlnet = LdmkFlowControlNet (face);
    bundle.controlnet2 = FlowControlNet (drag)."""

    def __init__(self, bundle: ModelBundle, bug_compat: bool = True,
                 mesh=None):
        assert bundle.controlnet2 is not None, "dual-adapter bundle required"
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
                 drag_flow: jnp.ndarray, landmarks: jnp.ndarray,
                 face_mask: jnp.ndarray,
                 num_inference_steps: int = 25,
                 min_guidance_scale: float = 1.0, max_guidance_scale: float = 3.0,
                 noise_aug_strength: float = 0.02,
                 ctrl_scale_ldmk: float = 1.0, ctrl_scale_traj: float = 1.0,
                 decode_chunk_size: int = 8,
                 key: Optional[jax.Array] = None,
                 latents: Optional[jnp.ndarray] = None,
                 output_type: str = "np",
                 cfg_split: bool = False,
                 step_chunk: Optional[int] = None,
                 offload_encoders: bool = False):
        """image01 [B,H,W,3]; controlnet_flow/drag_flow [B,T-1,H,W,2];
        landmarks [B,T,H,W,3]; face_mask [B,H,W,1] in {0,1}.

        cfg_split / step_chunk: same semantics as TrajPipeline (sequential
        CFG halves at half the activation HBM; host-chunked Euler loop of
        one compiled K-step program for watchdog-bounded device programs).
        Both are required to run the dual-adapter path at the full
        576x1024 / T=25 deployment point on one 16 GB v5e chip. As in
        traj, cfg_split is bit-identical to the batched path only with
        time_context_hw_major_quirk=False (the split halves run at B=1,
        which disables the pairwise hw-major context quirk).

        offload_encoders: free the VAE+CLIP device buffers (~1.36 GB
        bf16) for the denoise loop once the encodes are done; they are
        lazily re-uploaded at decode (ModelBundle.offload_encoders).
        Bit-identical to the resident path — the third lever (with
        cfg_split + step_chunk) that fits the dual-adapter flagship at
        576x1024/T=25 on one 16 GB chip."""
        b = image01.shape[0]
        if (cfg_split and b != 1
                and self.bundle.unet.cfg.time_context_hw_major_quirk):
            # with the pairwise hw-major quirk on, each split half runs at
            # even bsz=B and the quirk would treat DISTINCT videos as a CFG
            # pair, cross-contaminating their CLIP time-contexts
            raise ValueError(
                "cfg_split requires batch size 1 when "
                "time_context_hw_major_quirk is enabled (got B=%d)" % b)
        t = landmarks.shape[1]
        h, w = image01.shape[1:3]
        key = key if key is not None else jax.random.PRNGKey(42)
        k_aug, k_lat = jax.random.split(key)

        sched = make_euler_schedule(num_inference_steps)
        image_embeddings = encode_clip_image(self.bundle, image01, do_cfg=True)
        image_pm1 = image01 * 2.0 - 1.0
        image_aug = image_pm1 + noise_aug_strength * jax.random.normal(
            k_aug, image_pm1.shape, image_pm1.dtype)
        image_latents = encode_vae_image(self.bundle, image_aug, do_cfg=True)
        image_latents = jnp.repeat(image_latents[:, None], t, axis=1)

        added_time_ids = get_add_time_ids(6, 128, noise_aug_strength, b,
                                          do_cfg=True)
        if offload_encoders:
            # encodes are done; VAE/CLIP are dead weight until decode
            self.bundle.offload_encoders()

        latent_c = self.bundle.unet.cfg.in_channels // 2
        if latents is None:
            latents = jax.random.normal(
                k_lat, (b, t, h // 8, w // 8, latent_c), jnp.float32)
        latents = latents * sched.init_noise_sigma

        cond_image = jnp.concatenate([image_pm1] * 2, axis=0)
        flow_cfg = jnp.concatenate([controlnet_flow] * 2, axis=0)
        drag_cfg = jnp.concatenate([drag_flow] * 2, axis=0)
        ldmk_cfg = jnp.concatenate([landmarks] * 2, axis=0)

        guidance = jnp.linspace(min_guidance_scale, max_guidance_scale, t)
        guidance = guidance[None, :, None, None, None]

        sigmas = jnp.asarray(sched.sigmas)
        timesteps = jnp.asarray(sched.timesteps)

        if step_chunk is not None and step_chunk < num_inference_steps:
            out = self._denoise_stepchunked(
                latents, image_latents, image_embeddings, added_time_ids,
                cond_image, flow_cfg, drag_cfg, ldmk_cfg, face_mask, guidance,
                sigmas, timesteps, jnp.float32(ctrl_scale_ldmk),
                jnp.float32(ctrl_scale_traj), num_inference_steps,
                step_chunk, cfg_split)
        else:
            out = self._denoise_and_decode(
                self.bundle.unet_params, self.bundle.controlnet_params,
                self.bundle.controlnet2_params, self.bundle.vae_params,
                latents, image_latents, image_embeddings, added_time_ids,
                cond_image, flow_cfg, drag_cfg, ldmk_cfg, face_mask, guidance,
                sigmas, timesteps, jnp.float32(ctrl_scale_ldmk),
                jnp.float32(ctrl_scale_traj),
                num_steps=num_inference_steps,
                decode_chunk_size=decode_chunk_size,
                return_latent=True, cfg_split=cfg_split)
        if output_type == "latent":
            return out, controlnet_flow
        frames = decode_latents_jit(self.bundle, out, decode_chunk_size,
                                    mesh=self.mesh)
        return postprocess_frames(frames), controlnet_flow

    @functools.partial(jax.jit, static_argnames=(
        "self", "num_steps", "decode_chunk_size", "return_latent",
        "cfg_split"))
    def _denoise_and_decode(self, unet_params, face_params, drag_params,
                            vae_params, latents, image_latents,
                            image_embeddings, added_time_ids, cond_image,
                            flow_cfg, drag_cfg, ldmk_cfg, face_mask, guidance,
                            sigmas, timesteps, scale_ldmk, scale_traj, *,
                            num_steps: int, decode_chunk_size: int,
                            return_latent: bool, cfg_split: bool = False):
        import contextlib
        from mofa_tpu.parallel.activation import frame_parallel
        ctx = (frame_parallel(self.mesh) if self.mesh is not None
               else contextlib.nullcontext())
        with ctx:
            return self._denoise_body(
                unet_params, face_params, drag_params, vae_params, latents,
                image_latents, image_embeddings, added_time_ids, cond_image,
                flow_cfg, drag_cfg, ldmk_cfg, face_mask, guidance, sigmas,
                timesteps, scale_ldmk, scale_traj, num_steps,
                decode_chunk_size, return_latent, cfg_split)

    def _encode_injects_traced(self, face_params, drag_params, cond_image,
                               flow_cfg, drag_cfg, ldmk_cfg):
        """Step-independent warped feature stacks for BOTH adapters
        (warp once per video; occlusion masks are diagnostics, dropped)."""
        from mofa_tpu.core.quant import maybe_dequantize
        from mofa_tpu.pipelines.common import params_dtype
        face_cn, drag_cn = self.bundle.controlnet, self.bundle.controlnet2
        # single-use context: dequant without a loop token (core/quant.py)
        cd = params_dtype(face_params)
        face_params = maybe_dequantize(face_params, cd)
        drag_params = maybe_dequantize(drag_params, cd)
        inject_face, _ = face_cn.apply(
            face_params, cond_image, flow_cfg, ldmk_cfg,
            method=type(face_cn).encode_features)
        inject_drag = drag_cn.apply(
            drag_params, cond_image, drag_cfg,
            method=type(drag_cn).encode_features)
        return list(inject_face), list(inject_drag)

    def _make_step_fn(self, unet_params, face_params, drag_params,
                      inject_face, inject_drag, image_latents,
                      image_embeddings, added_time_ids, face_mask, guidance,
                      sigmas, timesteps, scale_ldmk, scale_traj, num_steps,
                      cfg_split, cd):
        """Shared Euler-step body (full-scan and step-chunked paths).

        step_fn(lat, idx) takes a GLOBAL step index; idx >= num_steps is a
        masked no-op so a ragged step_chunk tail reuses the program."""
        bundle = self.bundle
        face_cn, drag_cn = bundle.controlnet, bundle.controlnet2
        b2 = image_latents.shape[0]          # 2B batched path
        b = b2 // 2

        def model_call(latent_in, ts, ehs, ids):
            from mofa_tpu.core.quant import maybe_dequantize
            # int8 bundles: materialize compute-dtype weights HERE, pinned
            # by a loop-varying token — (ts, ehs) varies per Euler step
            # AND per CFG side, so under cfg_split each lax.map body gets
            # its own transient copy instead of one held across the step
            token = (ts, ehs)
            u_params = maybe_dequantize(unet_params, cd, token)
            f_params = maybe_dequantize(face_params, cd, token)
            d_params = maybe_dequantize(drag_params, cd, token)
            down_face, mid_face = face_cn.apply(
                f_params, latent_in, ts, ehs, ids,
                conditioning_scale=scale_ldmk,
                precomputed_features=inject_face)
            down_drag, mid_drag = drag_cn.apply(
                d_params, latent_in, ts, ehs, ids,
                conditioning_scale=scale_traj,
                precomputed_features=inject_drag)

            # residuals are [(nB*T), h, w, c] with nB in {B, 2B}; the mask
            # pyramid (one nearest resize per resolution,
            # pipeline.py:478-488) is loop-invariant — XLA hoists it out
            # of the scan
            t = latent_in.shape[1]
            n = latent_in.shape[0]

            def blend_bt(rf, rd):
                hw = rf.shape[1:3]
                m = resize_nhwc(face_mask, hw, method="nearest")
                m = jnp.repeat(m, t, axis=0)                  # [B*T, h, w, 1]
                if n * t != m.shape[0]:
                    m = jnp.concatenate([m] * 2, axis=0)      # CFG batch
                return rf * m + rd * (1.0 - m)

            down_res = tuple(blend_bt(f, d)
                             for f, d in zip(down_face, down_drag))
            mid_res = blend_bt(mid_face, mid_drag)

            return bundle.unet.apply(
                u_params, latent_in, ts, ehs, ids,
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
                # peak activation HBM (both adapters + UNet at B rows)
                scaled = scale_model_input(lat, sigma).astype(cd)
                preds = jax.lax.map(
                    lambda side: model_call(
                        jnp.concatenate([scaled, side[0]], axis=-1),
                        ts, side[1], side[2]),
                    (il2, ehs2, ids2))
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

    def _denoise_body(self, unet_params, face_params, drag_params, vae_params,
                      latents, image_latents, image_embeddings, added_time_ids,
                      cond_image, flow_cfg, drag_cfg, ldmk_cfg, face_mask,
                      guidance, sigmas, timesteps, scale_ldmk, scale_traj,
                      num_steps, decode_chunk_size, return_latent,
                      cfg_split=False):
        bundle = self.bundle

        # cast MODEL inputs to the param dtype (fp32 latent carry would
        # otherwise promote the whole UNet to fp32; see common.params_dtype)
        cd = params_dtype(unet_params)
        image_latents = image_latents.astype(cd)
        image_embeddings = image_embeddings.astype(cd)
        cond_image = cond_image.astype(cd)
        flow_cfg = flow_cfg.astype(cd)
        drag_cfg = drag_cfg.astype(cd)
        ldmk_cfg = ldmk_cfg.astype(cd)
        face_mask = face_mask.astype(cd)

        b = latents.shape[0]
        if cfg_split:
            # both CFG halves see the SAME cond image/flow/landmarks (the
            # reference concats identical halves, pipeline.py:393-400):
            # encode once at B rows and share across sides
            cond_image, flow_cfg = cond_image[:b], flow_cfg[:b]
            drag_cfg, ldmk_cfg = drag_cfg[:b], ldmk_cfg[:b]
        inject_face, inject_drag = self._encode_injects_traced(
            face_params, drag_params, cond_image, flow_cfg, drag_cfg,
            ldmk_cfg)

        step_fn = self._make_step_fn(
            unet_params, face_params, drag_params, inject_face, inject_drag,
            image_latents, image_embeddings, added_time_ids, face_mask,
            guidance, sigmas, timesteps, scale_ldmk, scale_traj, num_steps,
            cfg_split, cd)
        latents, _ = jax.lax.scan(step_fn, latents, jnp.arange(num_steps))
        if return_latent:
            return latents
        return decode_latents(bundle, latents, decode_chunk_size,
                              vae_params=vae_params)

    @functools.partial(jax.jit, static_argnames=("self", "cfg_split"))
    def _encode_injects(self, face_params, drag_params, cond_image, flow_cfg,
                        drag_cfg, ldmk_cfg, *, cfg_split: bool = False):
        import contextlib
        from mofa_tpu.parallel.activation import frame_parallel
        ctx = (frame_parallel(self.mesh) if self.mesh is not None
               else contextlib.nullcontext())
        with ctx:
            cd = params_dtype(face_params)
            return self._encode_injects_traced(
                face_params, drag_params, cond_image.astype(cd),
                flow_cfg.astype(cd), drag_cfg.astype(cd), ldmk_cfg.astype(cd))

    @functools.partial(jax.jit, static_argnames=("self", "k", "num_steps",
                                                 "cfg_split"))
    def _denoise_chunk(self, unet_params, face_params, drag_params,
                       inject_face, inject_drag, lat, image_latents,
                       image_embeddings, added_time_ids, face_mask, guidance,
                       sigmas, timesteps, scale_ldmk, scale_traj, start, *,
                       k: int, num_steps: int, cfg_split: bool):
        """K Euler steps from global step `start` (a device scalar — one
        compiled program serves every chunk)."""
        import contextlib
        from mofa_tpu.parallel.activation import frame_parallel
        ctx = (frame_parallel(self.mesh) if self.mesh is not None
               else contextlib.nullcontext())
        with ctx:
            cd = params_dtype(unet_params)
            step_fn = self._make_step_fn(
                unet_params, face_params, drag_params, inject_face,
                inject_drag, image_latents.astype(cd),
                image_embeddings.astype(cd), added_time_ids,
                face_mask.astype(cd), guidance, sigmas, timesteps, scale_ldmk,
                scale_traj, num_steps, cfg_split, cd)
            lat, _ = jax.lax.scan(step_fn, lat, start + jnp.arange(k))
            return lat

    def _denoise_stepchunked(self, latents, image_latents, image_embeddings,
                             added_time_ids, cond_image, flow_cfg, drag_cfg,
                             ldmk_cfg, face_mask, guidance, sigmas, timesteps,
                             scale_ldmk, scale_traj, num_steps, step_chunk,
                             cfg_split):
        bundle = self.bundle
        if cfg_split:
            b = latents.shape[0]
            cond_image, flow_cfg = cond_image[:b], flow_cfg[:b]
            drag_cfg, ldmk_cfg = drag_cfg[:b], ldmk_cfg[:b]
        inject_face, inject_drag = self._encode_injects(
            bundle.controlnet_params, bundle.controlnet2_params, cond_image,
            flow_cfg, drag_cfg, ldmk_cfg, cfg_split=cfg_split)
        lat = latents
        for s0 in range(0, num_steps, step_chunk):
            lat = self._denoise_chunk(
                bundle.unet_params, bundle.controlnet_params,
                bundle.controlnet2_params, inject_face, inject_drag, lat,
                image_latents, image_embeddings, added_time_ids, face_mask,
                guidance, sigmas, timesteps, scale_ldmk, scale_traj,
                jnp.int32(s0), k=step_chunk, num_steps=num_steps,
                cfg_split=cfg_split)
        return lat
