import jax
import jax.numpy as jnp
import numpy as np

from mofa_tpu.models.svd_unet import TINY_UNET_CONFIG
from mofa_tpu.models.vae import TINY_VAE_CONFIG
from mofa_tpu.models.clip_vision import TINY_CLIP_CONFIG
from mofa_tpu.pipelines.common import ModelBundle
from mofa_tpu.pipelines.traj import TrajPipeline

H = W = 64
T = 3


def _bundle():
    return ModelBundle.init_random(jax.random.PRNGKey(0), TINY_UNET_CONFIG,
                                   TINY_VAE_CONFIG, TINY_CLIP_CONFIG,
                                   image_size=(H, W), num_frames=T)


def test_traj_pipeline_end_to_end():
    bundle = _bundle()
    pipe = TrajPipeline(bundle)
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    flow = jnp.asarray(rng.randn(1, T - 1, H, W, 2).astype(np.float32) * 4)
    frames, out_flow = pipe(image, flow, num_inference_steps=2,
                            decode_chunk_size=4, key=jax.random.PRNGKey(1))
    assert frames.shape == (1, T, H, W, 3)
    f = np.asarray(frames)
    assert np.all(np.isfinite(f)) and f.min() >= 0.0 and f.max() <= 1.0


def test_traj_pipeline_latent_output_deterministic():
    bundle = _bundle()
    pipe = TrajPipeline(bundle)
    rng = np.random.RandomState(1)
    image = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    flow = jnp.asarray(rng.randn(1, T - 1, H, W, 2).astype(np.float32))
    lat1, _ = pipe(image, flow, num_inference_steps=2, output_type="latent",
                   key=jax.random.PRNGKey(7))
    lat2, _ = pipe(image, flow, num_inference_steps=2, output_type="latent",
                   key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(lat1), np.asarray(lat2))
    assert lat1.shape == (1, T, H // 8, W // 8, 4)


def test_decode_latents_jit_matches_inline():
    import numpy as np
    from mofa_tpu.pipelines.common import decode_latents, decode_latents_jit
    bundle = _bundle()
    rng = np.random.RandomState(5)
    lat = jnp.asarray(rng.randn(1, 3, H // 8, W // 8, 4).astype(np.float32))
    a = np.asarray(decode_latents(bundle, lat, decode_chunk_size=2))
    b = np.asarray(decode_latents_jit(bundle, lat, decode_chunk_size=2))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


def test_traj_pipeline_bf16_params_run_model_in_bf16():
    """A bf16 bundle must run the UNet on the bf16 path: the fp32 latent
    scan-carry used to promote every model input to fp32 (silent 2-3x
    slowdown + 2x activation HBM on chip). The carry itself stays fp32."""
    bundle = _bundle()
    cast = lambda tr: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tr)
    bundle.unet_params = cast(bundle.unet_params)
    bundle.controlnet_params = cast(bundle.controlnet_params)
    bundle.vae_params = cast(bundle.vae_params)
    bundle.clip_params = cast(bundle.clip_params)

    pipe = TrajPipeline(bundle)
    seen = {}
    orig = type(bundle.unet).__call__

    def probe(self, sample, *a, **k):
        seen["dtype"] = sample.dtype
        return orig(self, sample, *a, **k)

    type(bundle.unet).__call__ = probe
    try:
        img = jnp.full((1, H, W, 3), 0.5, jnp.bfloat16)
        flow = jnp.zeros((1, T - 1, H, W, 2), jnp.bfloat16)
        frames, _ = pipe(img, flow, num_inference_steps=2,
                         decode_chunk_size=4, key=jax.random.PRNGKey(1))
    finally:
        type(bundle.unet).__call__ = orig
    assert seen["dtype"] == jnp.bfloat16
    assert np.isfinite(np.asarray(frames, np.float32)).all()


def test_traj_pipeline_cfg_split_matches_batched():
    """cfg_split runs the CFG halves sequentially (half peak HBM); with the
    time_context_hw_major_quirk OFF, CFG batch rows are independent through
    the UNet and the split path must reproduce the 2B-batched path. (With
    the default quirk ON the reference's temporal cross-attn context is
    batch-MISALIGNED — uncond rows see cond CLIP tokens — so split and
    batched legitimately differ; cfg_split gives the corrected semantics.)"""
    import dataclasses as dc
    from mofa_tpu.models.svd_unet import TINY_UNET_CONFIG as TU
    cfg = dc.replace(TU, time_context_hw_major_quirk=False)
    bundle = ModelBundle.init_random(jax.random.PRNGKey(0), cfg,
                                     TINY_VAE_CONFIG, TINY_CLIP_CONFIG,
                                     image_size=(H, W), num_frames=T)
    pipe = TrajPipeline(bundle)
    rng = np.random.RandomState(3)
    image = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    flow = jnp.asarray(rng.randn(1, T - 1, H, W, 2).astype(np.float32) * 4)
    lat0 = jnp.asarray(rng.randn(1, T, H // 8, W // 8, 4).astype(np.float32))
    a, _ = pipe(image, flow, num_inference_steps=2, decode_chunk_size=4,
                latents=lat0, output_type="latent")
    b, _ = pipe(image, flow, num_inference_steps=2, decode_chunk_size=4,
                latents=lat0, output_type="latent", cfg_split=True)
    # batch-2 vs batch-1 programs fuse/reduce in different orders; the
    # residual 2e-4 after 2 steps is accumulation noise, not semantics
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=5e-3, atol=1e-3)


def test_traj_pipeline_step_chunked_matches_full():
    """step_chunk re-runs ONE compiled K-step program with the latent carry
    through the host (duration-watchdog workaround); with a ragged tail
    (K=2 over 3 steps -> one masked no-op step) it must match the single
    25-step-scan program."""
    bundle = _bundle()
    pipe = TrajPipeline(bundle)
    rng = np.random.RandomState(5)
    image = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    flow = jnp.asarray(rng.randn(1, T - 1, H, W, 2).astype(np.float32) * 4)
    lat0 = jnp.asarray(rng.randn(1, T, H // 8, W // 8, 4).astype(np.float32))
    a, _ = pipe(image, flow, num_inference_steps=3, decode_chunk_size=4,
                latents=lat0, output_type="latent")
    b, _ = pipe(image, flow, num_inference_steps=3, decode_chunk_size=4,
                latents=lat0, output_type="latent", step_chunk=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
