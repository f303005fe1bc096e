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
