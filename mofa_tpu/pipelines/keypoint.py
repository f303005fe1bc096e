"""Long-video sliding-window denoise pipeline (Keypoint workload).

Re-derivation of `svdxt_pipeline_ctrlnet_loop.py.__call__`
(/root/reference/MOFA-Video-Keypoint/pipeline/svdxt_pipeline_ctrlnet_loop.py:287-528)
as one jit program:

- views `[(1+i*s, i*s+W-1+1)]+[(N-W+1, N)]` (`:426-429`), each window =
  frame-0 anchor + (W-1) frames (`:452-457`);
- per denoise step every window is denoised at the SAME sigma — the
  reference achieves this by rolling `scheduler._step_index` back between
  windows (`:499-500`); here sigma is indexed by the step counter so the
  rollback is structural, not stateful;
- overlaps averaged via value/count buffers; the frame-0 anchor result is
  accumulated only for the first view (`:502-511`);
- per-window guidance linspace(min,max,W) (`:407-410`), hardcoded
  added_time_ids (6, 128) (`:415-423`).

TPU-first restructuring: the landmark adapter's warped-feature stack is
step-independent, so all V windows' injection features are precomputed
once (lax.map over views) and the denoise loop is a scan-over-steps of a
scan-over-views — no Python loops inside jit.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mofa_tpu.ops.euler import make_euler_schedule, euler_step, scale_model_input
from mofa_tpu.pipelines.common import (
    ModelBundle, encode_clip_image, encode_vae_image, decode_latents,
    decode_latents_jit, get_add_time_ids, postprocess_frames,
)


def window_views(num_frames: int, window_size: int, stride: int) -> list[tuple[int, int]]:
    """Reference view list: [(1+i*s, i*s+W)]+[(N-W+1, N)] over 1-based
    non-anchor frames (svdxt_pipeline_ctrlnet_loop.py:426-429)."""
    n = (num_frames - window_size) // stride + 1
    views = [(1 + i * stride, i * stride + window_size) for i in range(n)]
    views.append((num_frames - window_size + 1, num_frames))
    return views


def view_index_array(num_frames: int, window_size: int, stride: int) -> np.ndarray:
    """[V, W] frame indices per window: anchor 0 + frames t_start..t_end-1."""
    views = window_views(num_frames, window_size, stride)
    idx = np.zeros((len(views), window_size), np.int32)
    for v, (t_start, t_end) in enumerate(views):
        idx[v] = np.concatenate([[0], np.arange(t_start, t_end)])
    return idx


class KeypointPipeline:
    """Windowed landmark-driven pipeline (LdmkFlowControlNet adapter)."""

    def __init__(self, bundle: ModelBundle, bug_compat: bool = True,
                 mesh=None, big_program: bool = True):
        """big_program=True compiles the whole steps-x-views denoise as one
        scan-of-scans jit (fastest steady state). big_program=False uses a
        jitted single-window step driven by host loops — a much smaller
        XLA program (the 125-frame/10-view/25-step monolith can exhaust
        constrained compile environments)."""
        self.bundle = bundle
        self.bug_compat = bug_compat
        self.mesh = mesh
        self.big_program = big_program

    # jit caches key on `self`: make equal-configured pipelines over the
    # same bundle/mesh share compiled programs across instances
    def __hash__(self):
        return hash((id(self.bundle), id(self.mesh), self.bug_compat,
                     self.big_program))

    def __eq__(self, other):
        return (type(other) is type(self)
                and other.bundle is self.bundle
                and other.mesh is self.mesh
                and other.bug_compat == self.bug_compat
                and other.big_program == self.big_program)

    def __call__(self, image01: jnp.ndarray, controlnet_flow: jnp.ndarray,
                 landmarks: jnp.ndarray,
                 window_size: int = 25, stride: int = 12,
                 num_inference_steps: int = 25,
                 min_guidance_scale: float = 1.0, max_guidance_scale: float = 3.0,
                 noise_aug_strength: float = 0.02,
                 controlnet_cond_scale: float = 1.0,
                 decode_chunk_size: int = 8,
                 key: Optional[jax.Array] = None,
                 latents: Optional[jnp.ndarray] = None,
                 output_type: str = "np"):
        """image01 [1,H,W,3] in [0,1]; controlnet_flow [1,T-1,H,W,2];
        landmarks [1,T,H,W,3] rasterized landmark images in [0,1]."""
        b = image01.shape[0]
        assert b == 1, "windowed pipeline is single-video (reference batch_size=1)"
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

        added_time_ids = get_add_time_ids(6, 128, noise_aug_strength, b, do_cfg=True)

        latent_c = self.bundle.unet.cfg.in_channels // 2
        if latents is None:
            latents = jax.random.normal(
                k_lat, (b, t, h // 8, w // 8, latent_c), jnp.float32)
        latents = latents * sched.init_noise_sigma

        cond_image = jnp.concatenate([image_pm1] * 2, axis=0)
        flow_cfg = jnp.concatenate([controlnet_flow] * 2, axis=0)
        ldmk_cfg = jnp.concatenate([landmarks] * 2, axis=0)

        guidance = jnp.linspace(min_guidance_scale, max_guidance_scale,
                                window_size)[None, :, None, None, None]

        idx = jnp.asarray(view_index_array(t, window_size, stride))
        sigmas = jnp.asarray(sched.sigmas)
        timesteps = jnp.asarray(sched.timesteps)

        denoise = (self._denoise_and_decode if self.big_program
                   else self._denoise_small_programs)
        out = denoise(
            self.bundle.unet_params, self.bundle.controlnet_params,
            self.bundle.vae_params, latents, image_latents, image_embeddings,
            added_time_ids, cond_image, flow_cfg, ldmk_cfg, guidance, sigmas,
            timesteps, idx, jnp.float32(controlnet_cond_scale),
            num_steps=num_inference_steps, window_size=window_size,
            decode_chunk_size=decode_chunk_size,
            return_latent=True)
        if output_type == "latent":
            return out, controlnet_flow
        frames = decode_latents_jit(self.bundle, out, decode_chunk_size,
                                    mesh=self.mesh)
        return postprocess_frames(frames), controlnet_flow

    @functools.partial(jax.jit, static_argnames=(
        "self", "num_steps", "window_size", "decode_chunk_size", "return_latent"))
    def _denoise_and_decode(self, unet_params, cn_params, vae_params, latents,
                            image_latents, image_embeddings, added_time_ids,
                            cond_image, flow_cfg, ldmk_cfg, guidance, sigmas,
                            timesteps, idx, cond_scale, *, num_steps: int,
                            window_size: int, decode_chunk_size: int,
                            return_latent: bool):
        import contextlib
        from mofa_tpu.parallel.activation import frame_parallel
        ctx = (frame_parallel(self.mesh) if self.mesh is not None
               else contextlib.nullcontext())
        with ctx:
            return self._denoise_body(
                unet_params, cn_params, vae_params, latents, image_latents,
                image_embeddings, added_time_ids, cond_image, flow_cfg,
                ldmk_cfg, guidance, sigmas, timesteps, idx, cond_scale,
                num_steps, window_size, decode_chunk_size, return_latent)

    def _denoise_body(self, unet_params, cn_params, vae_params, latents,
                      image_latents, image_embeddings, added_time_ids,
                      cond_image, flow_cfg, ldmk_cfg, guidance, sigmas,
                      timesteps, idx, cond_scale, num_steps, window_size,
                      decode_chunk_size, return_latent):
        bundle = self.bundle
        cn = bundle.controlnet
        w_len = window_size

        # precompute per-view injection features (step-independent):
        # flow window = flow[t_start-1 : t_end-1]  == idx[1:] - 1 positions;
        # landmark window = landmarks at idx (anchor included).
        def encode_view(idx_v):
            flow_v = jnp.take(flow_cfg, idx_v[1:] - 1, axis=1)
            ldmk_v = jnp.take(ldmk_cfg, idx_v, axis=1)
            inject, _ = cn.apply(cn_params, cond_image, flow_v, ldmk_v,
                                 method=type(cn).encode_features)
            return tuple(inject)

        inject_stack = jax.lax.map(encode_view, idx)   # each [V, 2*W*?, h, w, c]

        # anchor weight: frame-0 contribution only from view 0
        n_views = idx.shape[0]
        anchor_w = jnp.concatenate(
            [jnp.where(jnp.arange(n_views) == 0, 1.0, 0.0)[:, None],
             jnp.ones((n_views, w_len - 1))], axis=1)   # [V, W]

        def step_fn(lat, i):
            sigma, sigma_next, ts = sigmas[i], sigmas[i + 1], timesteps[i]

            def view_fn(carry, xs):
                value, count = carry
                idx_v, inject_v, w_v = xs
                win_lat = jnp.take(lat, idx_v, axis=1)           # [1, W, h, w, 4]
                img_lat = jnp.take(image_latents, idx_v, axis=1)  # [2, W, h, w, 4]
                latent_in = jnp.concatenate([win_lat] * 2, axis=0)
                latent_in = scale_model_input(latent_in, sigma)
                latent_in = jnp.concatenate([latent_in, img_lat], axis=-1)
                down_res, mid_res = cn.apply(
                    cn_params, latent_in, ts, image_embeddings, added_time_ids,
                    conditioning_scale=cond_scale,
                    precomputed_features=list(inject_v))
                noise_pred = bundle.unet.apply(
                    unet_params, latent_in, ts, image_embeddings, added_time_ids,
                    down_block_additional_residuals=down_res,
                    mid_block_additional_residual=mid_res)
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance.astype(cond.dtype) * (cond - uncond)
                new_win, _ = euler_step(noise_pred, win_lat, sigma, sigma_next)
                wv = w_v[None, :, None, None, None]
                value = value.at[:, idx_v].add(new_win * wv)
                count = count.at[:, idx_v].add(
                    jnp.broadcast_to(wv, new_win.shape))
                return (value, count), None

            zeros = jnp.zeros_like(lat)
            (value, count), _ = jax.lax.scan(
                view_fn, (zeros, zeros), (idx, inject_stack, anchor_w))
            return jnp.where(count > 0, value / count, value), None

        latents, _ = jax.lax.scan(step_fn, latents, jnp.arange(num_steps))
        if return_latent:
            return latents
        return decode_latents(bundle, latents, decode_chunk_size,
                              vae_params=vae_params)


    @functools.partial(jax.jit, static_argnames=("self",))
    def _window_inject(self, cn_params, cond_image, flow_v, ldmk_v):
        cn = self.bundle.controlnet
        inject, _ = cn.apply(cn_params, cond_image, flow_v, ldmk_v,
                             method=type(cn).encode_features)
        return tuple(inject)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _window_step(self, unet_params, cn_params, win_lat, img_lat,
                     image_embeddings, added_time_ids, inject_v, guidance,
                     sigma, sigma_next, ts, cond_scale):
        bundle = self.bundle
        latent_in = jnp.concatenate([win_lat] * 2, axis=0)
        latent_in = scale_model_input(latent_in, sigma)
        latent_in = jnp.concatenate([latent_in, img_lat], axis=-1)
        down_res, mid_res = bundle.controlnet.apply(
            cn_params, latent_in, ts, image_embeddings, added_time_ids,
            conditioning_scale=cond_scale,
            precomputed_features=list(inject_v))
        noise_pred = bundle.unet.apply(
            unet_params, latent_in, ts, image_embeddings, added_time_ids,
            down_block_additional_residuals=down_res,
            mid_block_additional_residual=mid_res)
        uncond, cond = jnp.split(noise_pred, 2, axis=0)
        noise_pred = uncond + guidance.astype(cond.dtype) * (cond - uncond)
        new_win, _ = euler_step(noise_pred, win_lat, sigma, sigma_next)
        return new_win

    def _denoise_small_programs(self, unet_params, cn_params, vae_params,
                                latents, image_latents, image_embeddings,
                                added_time_ids, cond_image, flow_cfg,
                                ldmk_cfg, guidance, sigmas, timesteps, idx,
                                cond_scale, *, num_steps, window_size,
                                decode_chunk_size, return_latent):
        """Host-driven loops over steps/views; each window step is one
        small reused jit program (semantics identical to the scan path)."""
        del decode_chunk_size, return_latent  # decode happens in __call__
        idx_np = np.asarray(idx)
        n_views = idx_np.shape[0]
        injects = []
        for v in range(n_views):
            iv = jnp.asarray(idx_np[v])
            flow_v = jnp.take(flow_cfg, iv[1:] - 1, axis=1)
            ldmk_v = jnp.take(ldmk_cfg, iv, axis=1)
            injects.append(self._window_inject(cn_params, cond_image,
                                               flow_v, ldmk_v))
        lat = latents
        for i in range(num_steps):
            value = jnp.zeros_like(lat)
            count = jnp.zeros_like(lat)
            for v in range(n_views):
                iv = idx_np[v]
                win = jnp.take(lat, jnp.asarray(iv), axis=1)
                img = jnp.take(image_latents, jnp.asarray(iv), axis=1)
                new_win = self._window_step(
                    unet_params, cn_params, win, img, image_embeddings,
                    added_time_ids, injects[v], guidance, sigmas[i],
                    sigmas[i + 1], timesteps[i], cond_scale)
                w = np.ones((window_size,), np.float32)
                if v != 0:
                    w[0] = 0.0   # anchor counted only for the first view
                wv = jnp.asarray(w)[None, :, None, None, None]
                value = value.at[:, jnp.asarray(iv)].add(new_win * wv)
                count = count.at[:, jnp.asarray(iv)].add(
                    jnp.broadcast_to(wv, new_win.shape))
            lat = jnp.where(count > 0, value / count, value)
        return lat
