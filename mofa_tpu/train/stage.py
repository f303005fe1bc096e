"""EDM training step for the MOFA-Adapter (stage 1 / stage 2).

Re-derivation of the Training/train_stage{1,2}.py inner loop
(train_stage1.py:1040-1166) as a single jitted, mesh-shardable function:

- sigmas ~ rand_cosine_interpolated (simple-diffusion interpolated cosine);
- noisy = latents + noise*sigma; model input = noisy / sqrt(sigma^2+1)
  concat per-frame first-frame conditional latent (0.02-noise-augmented,
  un-scaled);
- timesteps = 0.25*log(sigma); added_time_ids = (6, 127, 0.02) fixed;
- InstructPix2Pix-style conditioning dropout (train_stage1.py:1088-1108):
  drop CLIP embedding when p < 2q, drop image latent when q <= p < 3q;
- denoised = pred*c_out + c_skip*noisy, weighted-MSE to clean latents;
- grads flow ONLY through the adapter; VAE/CLIP/UNet frozen via
  lax.stop_gradient + params held out of the differentiated argument.

DP/TP/SP ride the mesh: batch axis "data", params under parallel/sharding
TP rules, frame axis "frames"; gradient psum is inserted by GSPMD.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from mofa_tpu.models.vae import AutoencoderKLTemporalDecoder
from mofa_tpu.ops.edm import rand_cosine_interpolated, edm_scalings
from mofa_tpu.ops.resize import resize_antialias_hw
from mofa_tpu.pipelines.common import ModelBundle, get_add_time_ids

# CLIPImageProcessor normalization (train-time encode_image normalizes,
# unlike the inference pipeline quirk; train_stage1.py:935-954)
CLIP_MEAN = jnp.asarray([0.48145466, 0.4578275, 0.40821073], jnp.float32)
CLIP_STD = jnp.asarray([0.26862954, 0.26130258, 0.27577711], jnp.float32)

TRAIN_NOISE_AUG = 0.02


def encode_clip_train(bundle: ModelBundle, pixel01_first: jnp.ndarray):
    """[B, H, W, 3] in [0,1] -> [B, 1, D], with CLIP normalization."""
    size = bundle.clip.cfg.image_size
    x = pixel01_first * 2.0 - 1.0
    x = jnp.moveaxis(x, -1, 1)
    x = resize_antialias_hw(x, (size, size))
    x = jnp.moveaxis(x, 1, -1)
    x = (x + 1.0) / 2.0
    x = (x - CLIP_MEAN) / CLIP_STD
    return bundle.clip.apply(bundle.clip_params, x)[:, None, :]


def vae_encode_video(bundle: ModelBundle, pixels_pm1: jnp.ndarray,
                     key: jax.Array, chunk: int = 8) -> jnp.ndarray:
    """[B, T, H, W, 3] in [-1,1] -> scaled sampled latents [B, T, h, w, 4]
    (tensor_to_vae_latent, train_stage1.py:319-327).

    Encoded in frame chunks: the full-res encoder activations of a whole
    25-frame clip at 384^2 alone exceed a 16 GB chip; sequential chunks
    bound the peak (the per-frame conv encoder makes this exact)."""
    b, t = pixels_pm1.shape[:2]
    flat = pixels_pm1.reshape((b * t,) + pixels_pm1.shape[2:])
    moments = [bundle.vae.apply(
        bundle.vae_params, flat[i:i + chunk],
        method=AutoencoderKLTemporalDecoder.encode_moments)
        for i in range(0, b * t, chunk)]
    mean = jnp.concatenate([m[0] for m in moments], axis=0)
    logvar = jnp.concatenate([m[1] for m in moments], axis=0)
    z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
        key, mean.shape, mean.dtype)
    z = z.reshape((b, t) + z.shape[1:])
    return z * bundle.vae.cfg.scaling_factor


def edm_loss(cn_params, bundle: ModelBundle, batch: dict, key: jax.Array,
             cond_dropout_prob: Optional[float] = 0.1,
             ldmk: bool = False, mesh=None, remat: bool = False):
    """batch: pixel_values01 [B,T,H,W,3]; flows [B,T-1,H,W,2];
    optional landmarks [B,T,H,W,3] (ldmk adapter). Returns (loss, metrics)."""
    px01 = batch["pixel_values01"].astype(jnp.float32)
    flows = batch["flows"]
    b, t = px01.shape[:2]
    k_vae, k_noise, k_sigma, k_drop = jax.random.split(key, 4)

    pixels_pm1 = px01 * 2.0 - 1.0
    latents = jax.lax.stop_gradient(vae_encode_video(bundle, pixels_pm1, k_vae))
    if mesh is not None:
        # frame-axis SP: GSPMD pads uneven frame counts internally
        from mofa_tpu.parallel.sharding import constrain_frames
        latents = constrain_frames(latents, mesh)
    noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
    sigmas = rand_cosine_interpolated(k_sigma, (b,))
    s = sigmas.reshape((b,) + (1,) * (latents.ndim - 1))

    # first-frame conditional latent: 0.02-noise-augmented, UN-scaled
    cond_lat = (latents + noise * TRAIN_NOISE_AUG)[:, 0] / bundle.vae.cfg.scaling_factor
    noisy = latents + noise * s
    c_out, c_skip, weighting, c_in, timesteps = edm_scalings(s)
    inp = noisy * c_in

    ehs = jax.lax.stop_gradient(encode_clip_train(bundle, px01[:, 0]))
    added_time_ids = get_add_time_ids(6, 127, TRAIN_NOISE_AUG, b, do_cfg=False)

    if cond_dropout_prob:
        q = cond_dropout_prob
        p = jax.random.uniform(k_drop, (b,))
        ehs = jnp.where((p < 2 * q)[:, None, None], jnp.zeros_like(ehs), ehs)
        image_mask = 1.0 - ((p >= q) & (p < 3 * q)).astype(cond_lat.dtype)
        cond_lat = cond_lat * image_mask.reshape((b, 1, 1, 1))

    cond_lat = jnp.repeat(cond_lat[:, None], t, axis=1)
    inp = jnp.concatenate([inp, cond_lat], axis=-1)

    controlnet_image = pixels_pm1[:, 0]
    ts = timesteps.reshape((b,))
    cn_args = dict(controlnet_cond=controlnet_image, controlnet_flow=flows)
    if ldmk:
        cn_args["landmarks"] = batch["landmarks"]

    # gradient checkpointing (the reference's --gradient_checkpointing,
    # train_stage1.sh:18): BLOCK-level nn.remat inside the models — one
    # jax.checkpoint around the whole forward would re-materialize every
    # interior activation at once in backward and OOM at the reference
    # train config on a 16 GB chip
    unet_mod = bundle.unet.clone(remat_blocks=True) if remat else bundle.unet
    cn_mod = (bundle.controlnet.clone(remat_blocks=True) if remat
              else bundle.controlnet)

    def cn_fwd(p, x):
        return cn_mod.apply(p, x, ts, ehs, added_time_ids, **cn_args)

    def unet_fwd(x, down_res, mid_res):
        return unet_mod.apply(
            bundle.unet_params, x, ts, ehs, added_time_ids,
            down_block_additional_residuals=down_res,
            mid_block_additional_residual=mid_res)

    down_res, mid_res = cn_fwd(cn_params, inp)
    pred = unet_fwd(inp, down_res, mid_res)

    denoised = pred * c_out + c_skip * noisy
    err = (denoised.astype(jnp.float32) - latents.astype(jnp.float32)) ** 2
    per_sample = jnp.mean(
        (weighting.astype(jnp.float32) * err).reshape(b, -1), axis=1)
    loss = jnp.mean(per_sample)
    return loss, {"loss": loss, "sigma_mean": jnp.mean(sigmas)}


def frozen_params(bundle: ModelBundle) -> dict:
    """The non-trainable param trees, to be passed as jit ARGUMENTS to a
    train step (a closure would bake GBs of frozen UNet/VAE/CLIP weights
    into the lowered program as constants — doubling HBM and exploding
    lowering time at full scale)."""
    return {"unet": bundle.unet_params, "vae": bundle.vae_params,
            "clip": bundle.clip_params}


def _with_frozen(bundle: ModelBundle, frozen) -> ModelBundle:
    if frozen is None:
        return bundle
    import dataclasses
    return dataclasses.replace(bundle, unet_params=frozen["unet"],
                               vae_params=frozen["vae"],
                               clip_params=frozen["clip"])


def _maybe_sharded(mesh):
    """sharded_execution ctx when compiling for a >1-device mesh (routes
    kernel dispatch away from partitioner-opaque Pallas calls); nullctx
    on a single device so the fused single-chip hot path is untouched.

    (An A/B gating the tmajor temporal path off for training measured
    1.26 s/step classic vs 1.24 s/step tmajor on the stage-1 operating
    point, 2026-08-20 — the recompute-backward is NOT a regression, so
    training traces use the same dispatch as inference; the r03 1.19
    s/step was same-code tunnel-day variance.)"""
    import contextlib
    if mesh is not None and mesh.size > 1:
        from mofa_tpu.parallel.activation import sharded_execution
        return sharded_execution()
    return contextlib.nullcontext()


def make_train_step(bundle: ModelBundle, tx: optax.GradientTransformation,
                    cond_dropout_prob: Optional[float] = 0.1,
                    ldmk: bool = False, ema_decay: float = 0.9999,
                    mesh=None, remat: bool = False):
    """Returns jittable (state, batch, key[, frozen]) -> (state, metrics).

    Pass `frozen=frozen_params(bundle)` at full scale so the frozen
    weights ride as program arguments; omitted, they are captured as
    compile-time constants (fine for tiny test configs only)."""

    def train_step(state, batch, key, frozen=None):
        with _maybe_sharded(mesh):
            grad_fn = jax.value_and_grad(edm_loss, has_aux=True)
            (loss, metrics), grads = grad_fn(
                state.params, _with_frozen(bundle, frozen), batch, key,
                cond_dropout_prob=cond_dropout_prob, ldmk=ldmk, mesh=mesh,
                remat=remat)
            new_state = state.apply_gradients(grads, tx, ema_decay=ema_decay)
            metrics["grad_norm"] = optax.global_norm(grads)
            return new_state, metrics

    return train_step


def make_grad_accum_train_step(bundle: ModelBundle,
                               tx: optax.GradientTransformation,
                               accum_steps: int,
                               cond_dropout_prob: Optional[float] = 0.1,
                               ldmk: bool = False, ema_decay: float = 0.9999,
                               mesh=None):
    """Gradient accumulation over a leading microbatch axis via lax.scan
    (replaces accelerator.accumulate, train_stage1.py:1040)."""

    def train_step(state, batches, key, frozen=None):
        """batches: pytree with leading axis [accum_steps, ...]."""
        keys = jax.random.split(key, accum_steps)
        bnd = _with_frozen(bundle, frozen)

        def micro(carry, inp):
            acc = carry
            mb, k = inp
            (_, metrics), grads = jax.value_and_grad(edm_loss, has_aux=True)(
                state.params, bnd, mb, k,
                cond_dropout_prob=cond_dropout_prob, ldmk=ldmk, mesh=mesh)
            acc = jax.tree_util.tree_map(jnp.add, acc, grads)
            return acc, metrics

        with _maybe_sharded(mesh):
            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            grads, metrics = jax.lax.scan(micro, zero, (batches, keys))
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
            new_state = state.apply_gradients(grads, tx, ema_decay=ema_decay)
            return new_state, jax.tree_util.tree_map(jnp.mean, metrics)

    return train_step
