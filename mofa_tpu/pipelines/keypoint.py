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
    decode_latents_jit, get_add_time_ids, params_dtype, postprocess_frames,
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
                 output_type: str = "np",
                 window_batch: int = 1,
                 cfg_split: bool = False,
                 offload_encoders: bool = False):
        """image01 [1,H,W,3] in [0,1]; controlnet_flow [1,T-1,H,W,2];
        landmarks [1,T,H,W,3] rasterized landmark images in [0,1].

        window_batch > 1 denoises that many sliding windows per UNet call
        by stacking them on the batch axis — exact semantics (windows
        within one step are independent in the reference: value/count
        accumulation, svdxt_pipeline_ctrlnet_loop.py:502-511), but one
        wide MXU-friendly program instead of a window-at-a-time loop, and
        near-even frame-axis sharding on a mesh (window count, not the
        in-window frame count, rides the devices).

        cfg_split runs the window step's CFG halves sequentially (half the
        peak activation HBM — required for 576x1024 windows on a 16 GB
        chip). Small-programs mode with window_batch=1 only (it exists to
        SHRINK the program; batching widens it). Same numerics caveat as
        TrajPipeline: identical to the batched path only with
        time_context_hw_major_quirk=False.

        offload_encoders: free the VAE+CLIP device buffers (~1.36 GB
        bf16) after the encodes, re-uploaded lazily at decode
        (ModelBundle.offload_encoders; bit-identical outputs). Measured
        necessary for window_batch=5 at 512^2x125f on one 16 GB chip
        (the wb=5 program peaked 285 MB over HBM with them resident)."""
        if cfg_split and (self.big_program or window_batch != 1):
            raise ValueError("cfg_split requires big_program=False and "
                             "window_batch=1 (it exists to shrink the "
                             "per-program activation footprint)")
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
        ldmk_cfg = jnp.concatenate([landmarks] * 2, axis=0)

        guidance = jnp.linspace(min_guidance_scale, max_guidance_scale,
                                window_size)[None, :, None, None, None]

        idx = jnp.asarray(view_index_array(t, window_size, stride))
        sigmas = jnp.asarray(sched.sigmas)
        timesteps = jnp.asarray(sched.timesteps)

        if self.big_program:
            out = self._denoise_and_decode(
                self.bundle.unet_params, self.bundle.controlnet_params,
                self.bundle.vae_params, latents, image_latents,
                image_embeddings, added_time_ids, cond_image, flow_cfg,
                ldmk_cfg, guidance, sigmas, timesteps, idx,
                jnp.float32(controlnet_cond_scale),
                num_steps=num_inference_steps, window_size=window_size,
                decode_chunk_size=decode_chunk_size,
                return_latent=True, window_batch=int(window_batch))
        else:
            out = self._denoise_small_programs(
                self.bundle.unet_params, self.bundle.controlnet_params,
                self.bundle.vae_params, latents, image_latents,
                image_embeddings, added_time_ids, cond_image, flow_cfg,
                ldmk_cfg, guidance, sigmas, timesteps, idx,
                jnp.float32(controlnet_cond_scale),
                num_steps=num_inference_steps, window_size=window_size,
                decode_chunk_size=decode_chunk_size,
                return_latent=True, window_batch=int(window_batch),
                cfg_split=cfg_split)
        if output_type == "latent":
            return out, controlnet_flow
        frames = decode_latents_jit(self.bundle, out, decode_chunk_size,
                                    mesh=self.mesh)
        return postprocess_frames(frames), controlnet_flow

    @functools.partial(jax.jit, static_argnames=(
        "self", "num_steps", "window_size", "decode_chunk_size",
        "return_latent", "window_batch"))
    def _denoise_and_decode(self, unet_params, cn_params, vae_params, latents,
                            image_latents, image_embeddings, added_time_ids,
                            cond_image, flow_cfg, ldmk_cfg, guidance, sigmas,
                            timesteps, idx, cond_scale, *, num_steps: int,
                            window_size: int, decode_chunk_size: int,
                            return_latent: bool, window_batch: int = 1):
        import contextlib
        from mofa_tpu.parallel.activation import frame_parallel
        ctx = (frame_parallel(self.mesh) if self.mesh is not None
               else contextlib.nullcontext())
        with ctx:
            body = (self._denoise_body if window_batch == 1
                    else functools.partial(self._denoise_body_batched,
                                           window_batch=window_batch))
            return body(
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
        # cast MODEL inputs to the param dtype (see common.params_dtype);
        # latent carry / Euler / overlap averaging stay fp32
        cd = params_dtype(unet_params)
        image_latents = image_latents.astype(cd)
        image_embeddings = image_embeddings.astype(cd)
        cond_image = cond_image.astype(cd)
        flow_cfg = flow_cfg.astype(cd)
        ldmk_cfg = ldmk_cfg.astype(cd)

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
                latent_in = jnp.concatenate(
                    [latent_in.astype(img_lat.dtype), img_lat], axis=-1)
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

    def _denoise_body_batched(self, unet_params, cn_params, vae_params,
                              latents, image_latents, image_embeddings,
                              added_time_ids, cond_image, flow_cfg, ldmk_cfg,
                              guidance, sigmas, timesteps, idx, cond_scale,
                              num_steps, window_size, decode_chunk_size,
                              return_latent, *, window_batch: int):
        """Window-batched denoise: `window_batch` sliding windows stacked on
        the UNet batch axis per call (exact vs the scan-over-views path —
        within one denoise step the reference's windows only interact
        through the value/count overlap average). The view count is padded
        to a multiple of window_batch with zero-weight copies of the last
        view, so every group is one static-shaped program."""
        bundle = self.bundle
        cn = bundle.controlnet
        w_len = window_size
        cd = params_dtype(unet_params)
        image_latents = image_latents.astype(cd)
        image_embeddings = image_embeddings.astype(cd)
        cond_image = cond_image.astype(cd)
        flow_cfg = flow_cfg.astype(cd)
        ldmk_cfg = ldmk_cfg.astype(cd)
        vb = window_batch
        n_views = idx.shape[0]
        g = -(-n_views // vb)
        pad = g * vb - n_views

        # per-view injection features (step-independent), as in the scan path
        def encode_view(idx_v):
            flow_v = jnp.take(flow_cfg, idx_v[1:] - 1, axis=1)
            ldmk_v = jnp.take(ldmk_cfg, idx_v, axis=1)
            inject, _ = cn.apply(cn_params, cond_image, flow_v, ldmk_v,
                                 method=type(cn).encode_features)
            return tuple(inject)

        inject_stack = jax.lax.map(encode_view, idx)  # tuple of [V, 2W, h, w, c]

        anchor_w = jnp.concatenate(
            [jnp.where(jnp.arange(n_views) == 0, 1.0, 0.0)[:, None],
             jnp.ones((n_views, w_len - 1))], axis=1)  # [V, W]
        if pad:
            idx = jnp.concatenate([idx, jnp.tile(idx[-1:], (pad, 1))])
            anchor_w = jnp.concatenate(
                [anchor_w, jnp.zeros((pad, w_len), anchor_w.dtype)])
            inject_stack = tuple(
                jnp.concatenate(
                    [f, jnp.tile(f[-1:], (pad,) + (1,) * (f.ndim - 1))])
                for f in inject_stack)

        # group + reorder injection rows into the batched UNet's
        # (cfg, view, frame) batch order: [G*Vb, 2W, ...] -> [G, 2*Vb*W, ...]
        def group_feats(f):
            tail = f.shape[2:]
            f = f.reshape((g, vb, 2, w_len) + tail)
            f = f.transpose((0, 2, 1, 3) + tuple(range(4, f.ndim)))
            return f.reshape((g, 2 * vb * w_len) + tail)

        inject_g = tuple(group_feats(f) for f in inject_stack)
        idx_g = idx.reshape(g, vb, w_len)
        aw_g = anchor_w.reshape(g, vb, w_len)

        ehs = jnp.repeat(image_embeddings, vb, axis=0)   # [2Vb, 1, D] cfg-major
        ids = jnp.repeat(added_time_ids, vb, axis=0)     # [2Vb, 3]

        def step_fn(lat, i):
            sigma, sigma_next, ts = sigmas[i], sigmas[i + 1], timesteps[i]

            def group_fn(carry, xs):
                value, count = carry
                idx_v, inject_v, w_v = xs           # [Vb, W], tuple, [Vb, W]
                flat = idx_v.reshape(-1)
                win_lat = jnp.take(lat[0], flat, axis=0).reshape(
                    (vb, w_len) + lat.shape[2:])    # [Vb, W, h, w, 4]
                img_lat = jnp.take(image_latents, flat, axis=1).reshape(
                    (2 * vb, w_len) + image_latents.shape[2:])
                latent_in = jnp.concatenate([win_lat] * 2, axis=0)  # [2Vb, W,..]
                latent_in = scale_model_input(latent_in, sigma)
                latent_in = jnp.concatenate(
                    [latent_in.astype(img_lat.dtype), img_lat], axis=-1)
                down_res, mid_res = cn.apply(
                    cn_params, latent_in, ts, ehs, ids,
                    conditioning_scale=cond_scale,
                    precomputed_features=list(inject_v))
                noise_pred = bundle.unet.apply(
                    unet_params, latent_in, ts, ehs, ids,
                    down_block_additional_residuals=down_res,
                    mid_block_additional_residual=mid_res)
                uncond, cond = jnp.split(noise_pred, 2, axis=0)   # [Vb, W, ..]
                noise_pred = uncond + guidance.astype(cond.dtype) * (cond - uncond)
                new_win, _ = euler_step(noise_pred, win_lat, sigma, sigma_next)
                wv = w_v.reshape(-1)[:, None, None, None]         # [Vb*W,1,1,1]
                upd = new_win.reshape((vb * w_len,) + new_win.shape[2:]) * wv
                value = value.at[:, flat].add(upd[None].astype(value.dtype))
                count = count.at[:, flat].add(
                    jnp.broadcast_to(wv, upd.shape)[None].astype(count.dtype))
                return (value, count), None

            zeros = jnp.zeros_like(lat)
            (value, count), _ = jax.lax.scan(
                group_fn, (zeros, zeros), (idx_g, inject_g, aw_g))
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

    @functools.partial(jax.jit, static_argnames=("self", "cfg_split"))
    def _window_step(self, unet_params, cn_params, win_lat, img_lat,
                     image_embeddings, added_time_ids, inject_v, guidance,
                     sigma, sigma_next, ts, cond_scale, *,
                     cfg_split: bool = False):
        bundle = self.bundle

        def model_call(latent_in, ehs, ids):
            down_res, mid_res = bundle.controlnet.apply(
                cn_params, latent_in, ts, ehs, ids,
                conditioning_scale=cond_scale,
                precomputed_features=list(inject_v))
            return bundle.unet.apply(
                unet_params, latent_in, ts, ehs, ids,
                down_block_additional_residuals=down_res,
                mid_block_additional_residual=mid_res)

        if cfg_split:
            # sequential CFG halves through ONE compiled body (half the
            # peak activation HBM); inject_v was encoded at B rows and is
            # shared by both sides (same cond image/flow/landmarks)
            b = win_lat.shape[0]
            scaled = scale_model_input(win_lat, sigma).astype(img_lat.dtype)
            il2 = img_lat.reshape((2, b) + img_lat.shape[1:])
            ehs2 = image_embeddings.reshape(
                (2, b) + image_embeddings.shape[1:])
            ids2 = added_time_ids.reshape((2, b) + added_time_ids.shape[1:])
            preds = jax.lax.map(
                lambda side: model_call(
                    jnp.concatenate([scaled, side[0]], axis=-1),
                    side[1], side[2]),
                (il2, ehs2, ids2))
            uncond, cond = preds[0], preds[1]
        else:
            latent_in = jnp.concatenate([win_lat] * 2, axis=0)
            latent_in = scale_model_input(latent_in, sigma)
            latent_in = jnp.concatenate(
                        [latent_in.astype(img_lat.dtype), img_lat], axis=-1)
            noise_pred = model_call(latent_in, image_embeddings,
                                    added_time_ids)
            uncond, cond = jnp.split(noise_pred, 2, axis=0)
        noise_pred = uncond + guidance.astype(cond.dtype) * (cond - uncond)
        new_win, _ = euler_step(noise_pred, win_lat, sigma, sigma_next)
        return new_win

    @functools.partial(jax.jit, static_argnames=("self", "vb", "w_len"))
    def _window_step_batched(self, unet_params, cn_params, lat, image_latents,
                             image_embeddings, added_time_ids, inject_v,
                             guidance, idx_v, w_v, sigma, sigma_next, ts,
                             cond_scale, *, vb: int, w_len: int):
        """One denoise step of `vb` windows stacked on the batch axis, plus
        the value/count scatter — same math as group_fn in the scanned
        batched body, packaged as a small reusable program."""
        bundle = self.bundle
        flat = idx_v.reshape(-1)
        win_lat = jnp.take(lat[0], flat, axis=0).reshape(
            (vb, w_len) + lat.shape[2:])
        img_lat = jnp.take(image_latents, flat, axis=1).reshape(
            (2 * vb, w_len) + image_latents.shape[2:])
        ehs = jnp.repeat(image_embeddings, vb, axis=0)
        ids = jnp.repeat(added_time_ids, vb, axis=0)
        latent_in = jnp.concatenate([win_lat] * 2, axis=0)
        latent_in = scale_model_input(latent_in, sigma)
        latent_in = jnp.concatenate(
                    [latent_in.astype(img_lat.dtype), img_lat], axis=-1)
        down_res, mid_res = bundle.controlnet.apply(
            cn_params, latent_in, ts, ehs, ids,
            conditioning_scale=cond_scale,
            precomputed_features=list(inject_v))
        noise_pred = bundle.unet.apply(
            unet_params, latent_in, ts, ehs, ids,
            down_block_additional_residuals=down_res,
            mid_block_additional_residual=mid_res)
        uncond, cond = jnp.split(noise_pred, 2, axis=0)
        noise_pred = uncond + guidance.astype(cond.dtype) * (cond - uncond)
        new_win, _ = euler_step(noise_pred, win_lat, sigma, sigma_next)
        wv = w_v.reshape(-1)[:, None, None, None]
        upd = new_win.reshape((vb * w_len,) + new_win.shape[2:]) * wv
        value = jnp.zeros_like(lat).at[:, flat].add(upd[None].astype(lat.dtype))
        count = jnp.zeros_like(lat).at[:, flat].add(
            jnp.broadcast_to(wv, upd.shape)[None].astype(lat.dtype))
        return value, count

    def _denoise_small_programs(self, unet_params, cn_params, vae_params,
                                latents, image_latents, image_embeddings,
                                added_time_ids, cond_image, flow_cfg,
                                ldmk_cfg, guidance, sigmas, timesteps, idx,
                                cond_scale, *, num_steps, window_size,
                                decode_chunk_size, return_latent,
                                window_batch: int = 1,
                                cfg_split: bool = False):
        """Host-driven loops over steps/views; each window step is one
        small reused jit program (semantics identical to the scan path).
        window_batch > 1 stacks that many windows per program call;
        cfg_split runs each window step's CFG halves sequentially."""
        del decode_chunk_size, return_latent  # decode happens in __call__
        cd = params_dtype(unet_params)
        image_latents = image_latents.astype(cd)
        image_embeddings = image_embeddings.astype(cd)
        cond_image = cond_image.astype(cd)
        flow_cfg = flow_cfg.astype(cd)
        ldmk_cfg = ldmk_cfg.astype(cd)
        if cfg_split:
            # both CFG halves see the SAME cond image/flow/landmarks (the
            # reference concats identical halves): encode once at B rows
            cond_image = cond_image[:1]
            flow_cfg = flow_cfg[:1]
            ldmk_cfg = ldmk_cfg[:1]
        idx_np = np.asarray(idx)
        n_views = idx_np.shape[0]
        injects = []
        for v in range(n_views):
            iv = jnp.asarray(idx_np[v])
            flow_v = jnp.take(flow_cfg, iv[1:] - 1, axis=1)
            ldmk_v = jnp.take(ldmk_cfg, iv, axis=1)
            injects.append(self._window_inject(cn_params, cond_image,
                                               flow_v, ldmk_v))
        if window_batch > 1:
            return self._small_programs_batched(
                unet_params, cn_params, latents, image_latents,
                image_embeddings, added_time_ids, injects, guidance, sigmas,
                timesteps, idx_np, cond_scale, num_steps, window_size,
                window_batch)
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
                    sigmas[i + 1], timesteps[i], cond_scale,
                    cfg_split=cfg_split)
                w = np.ones((window_size,), np.float32)
                if v != 0:
                    w[0] = 0.0   # anchor counted only for the first view
                wv = jnp.asarray(w)[None, :, None, None, None]
                value = value.at[:, jnp.asarray(iv)].add(new_win * wv)
                count = count.at[:, jnp.asarray(iv)].add(
                    jnp.broadcast_to(wv, new_win.shape))
            lat = jnp.where(count > 0, value / count, value)
        return lat

    def _small_programs_batched(self, unet_params, cn_params, latents,
                                image_latents, image_embeddings,
                                added_time_ids, injects, guidance, sigmas,
                                timesteps, idx_np, cond_scale, num_steps,
                                window_size, window_batch):
        vb, w_len = window_batch, window_size
        n_views = idx_np.shape[0]
        g = -(-n_views // vb)
        pad = g * vb - n_views
        anchor = np.ones((n_views, w_len), np.float32)
        anchor[1:, 0] = 0.0
        if pad:  # zero-weight copies of the last view fill the tail group
            idx_np = np.concatenate([idx_np, np.tile(idx_np[-1:], (pad, 1))])
            anchor = np.concatenate(
                [anchor, np.zeros((pad, w_len), np.float32)])
            injects = injects + [injects[-1]] * pad
        def regroup(f_stack):
            # [Vb, 2W, *tail] -> (cfg, view, frame)-ordered [2*Vb*W, *tail]
            tail = f_stack.shape[2:]
            f_stack = f_stack.reshape((vb, 2, w_len) + tail)
            f_stack = f_stack.transpose(
                (1, 0, 2) + tuple(range(3, f_stack.ndim)))
            return f_stack.reshape((2 * vb * w_len,) + tail)

        groups = []
        for gi in range(g):
            view_feats = injects[gi * vb:(gi + 1) * vb]
            feats = tuple(
                regroup(jnp.stack([f[fi] for f in view_feats]))
                for fi in range(len(injects[0])))
            groups.append((jnp.asarray(idx_np[gi * vb:(gi + 1) * vb]),
                           jnp.asarray(anchor[gi * vb:(gi + 1) * vb]), feats))
        lat = latents
        for i in range(num_steps):
            value = jnp.zeros_like(lat)
            count = jnp.zeros_like(lat)
            for idx_v, w_v, feats in groups:
                dv, dc = self._window_step_batched(
                    unet_params, cn_params, lat, image_latents,
                    image_embeddings, added_time_ids, feats, guidance,
                    idx_v, w_v, sigmas[i], sigmas[i + 1], timesteps[i],
                    cond_scale, vb=vb, w_len=w_len)
                value = value + dv
                count = count + dc
            lat = jnp.where(count > 0, value / count, value)
        return lat
