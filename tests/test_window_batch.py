"""Window-batched long-video denoising: stacking sliding windows on the
UNet batch axis must match the window-at-a-time scan exactly (within one
denoise step the reference's windows are independent — value/count overlap
averaging, svdxt_pipeline_ctrlnet_loop.py:502-511)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mofa_tpu.models.svd_unet import MICRO_UNET_CONFIG
from mofa_tpu.models.vae import TINY_VAE_CONFIG
from mofa_tpu.models.clip_vision import TINY_CLIP_CONFIG
from mofa_tpu.pipelines.common import ModelBundle
from mofa_tpu.pipelines.keypoint import KeypointPipeline, window_views

H = W = 64
T, WIN, STRIDE = 8, 4, 2   # views: (1,4),(3,6),(5,8) + anchor-tail (5,8) = 4


def _setup():
    bundle = ModelBundle.init_random(
        jax.random.PRNGKey(0), MICRO_UNET_CONFIG, TINY_VAE_CONFIG,
        TINY_CLIP_CONFIG, ldmk=True, image_size=(H, W), num_frames=WIN)
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    flow = jnp.asarray(rng.randn(1, T - 1, H, W, 2).astype(np.float32) * 2)
    ldmk = jnp.asarray(rng.rand(1, T, H, W, 3).astype(np.float32))
    return bundle, image, flow, ldmk


def _run(pipe, args, wb):
    image, flow, ldmk = args
    lat, _ = pipe(image, flow, ldmk, window_size=WIN, stride=STRIDE,
                  num_inference_steps=2, key=jax.random.PRNGKey(1),
                  output_type="latent", window_batch=wb)
    return np.asarray(lat)


def test_window_batch_matches_scan():
    bundle, *args = _setup()
    n_views = len(window_views(T, WIN, STRIDE))
    assert n_views == 4
    pipe = KeypointPipeline(bundle)
    want = _run(pipe, args, 1)
    got_even = _run(pipe, args, 2)    # 2 groups of 2
    got_pad = _run(pipe, args, 3)     # 2 groups, tail padded w/ zero weight
    got_all = _run(pipe, args, 4)     # single group of all views
    # batching reassociates conv/matmul partial sums (fp32): observed max
    # drift ~5e-4 after 2 steps; an ordering bug (cfg halves / views /
    # inject rows) would diverge at O(1), far outside this tolerance
    np.testing.assert_allclose(got_even, want, atol=2e-3, rtol=5e-3)
    np.testing.assert_allclose(got_pad, want, atol=2e-3, rtol=5e-3)
    np.testing.assert_allclose(got_all, want, atol=2e-3, rtol=5e-3)


def test_window_batch_small_programs_matches():
    bundle, *args = _setup()
    want = _run(KeypointPipeline(bundle), args, 1)
    pipe = KeypointPipeline(bundle, big_program=False)
    got = _run(pipe, args, 3)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=5e-3)


def test_window_batch_frame_parallel_matches():
    """Window-batched denoise sharded over an 8-device frames mesh must
    match the unsharded batched run — the 2*Vb*W flattened batch axis is
    what rides the devices."""
    from mofa_tpu.core.mesh import make_mesh

    bundle, *args = _setup()
    want = _run(KeypointPipeline(bundle), args, 2)
    pipe = KeypointPipeline(bundle, mesh=make_mesh(data=1, frames=8))
    got = _run(pipe, args, 2)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=5e-3)
