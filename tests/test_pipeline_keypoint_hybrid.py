"""Windowed (keypoint) + dual-adapter (hybrid) pipelines on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mofa_tpu.models.svd_unet import MICRO_UNET_CONFIG
from mofa_tpu.models.vae import TINY_VAE_CONFIG
from mofa_tpu.models.clip_vision import TINY_CLIP_CONFIG
from mofa_tpu.pipelines.common import ModelBundle
from mofa_tpu.pipelines.keypoint import (
    KeypointPipeline, window_views, view_index_array)
from mofa_tpu.pipelines.hybrid import HybridPipeline

H = W = 64


def test_window_views_reference_config():
    """125 frames / window 25 / stride 12 — the shipped long-video config
    (mofa_keypoint.py:288, inference_opendomain.py:115)."""
    views = window_views(125, 25, 12)
    assert views[0] == (1, 25)
    assert views[-1] == (101, 125)
    # every non-anchor frame 1..124 covered
    covered = set()
    for s, e in views:
        covered.update(range(s, e))
    assert covered == set(range(1, 125))
    idx = view_index_array(125, 25, 12)
    assert idx.shape == (len(views), 25)
    assert (idx[:, 0] == 0).all()


def test_keypoint_pipeline_end_to_end():
    t, win, stride = 7, 4, 2
    bundle = ModelBundle.init_random(
        jax.random.PRNGKey(0), MICRO_UNET_CONFIG, TINY_VAE_CONFIG,
        TINY_CLIP_CONFIG, ldmk=True, image_size=(H, W), num_frames=win)
    pipe = KeypointPipeline(bundle)
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    flow = jnp.asarray(rng.randn(1, t - 1, H, W, 2).astype(np.float32) * 2)
    ldmk = jnp.asarray(rng.rand(1, t, H, W, 3).astype(np.float32))
    frames, _ = pipe(image, flow, ldmk, window_size=win, stride=stride,
                     num_inference_steps=2, decode_chunk_size=4,
                     key=jax.random.PRNGKey(1))
    f = np.asarray(frames)
    assert f.shape == (1, t, H, W, 3)
    assert np.all(np.isfinite(f)) and f.min() >= 0.0 and f.max() <= 1.0


def test_hybrid_pipeline_end_to_end():
    t = 3
    bundle = ModelBundle.init_random(
        jax.random.PRNGKey(0), MICRO_UNET_CONFIG, TINY_VAE_CONFIG,
        TINY_CLIP_CONFIG, ldmk=True, dual=True, image_size=(H, W),
        num_frames=t)
    pipe = HybridPipeline(bundle)
    rng = np.random.RandomState(1)
    image = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    flow = jnp.asarray(rng.randn(1, t - 1, H, W, 2).astype(np.float32))
    drag = jnp.asarray(rng.randn(1, t - 1, H, W, 2).astype(np.float32))
    ldmk = jnp.asarray(rng.rand(1, t, H, W, 3).astype(np.float32))
    mask = jnp.asarray((rng.rand(1, H, W, 1) > 0.5).astype(np.float32))
    frames, _ = pipe(image, flow, drag, ldmk, mask, num_inference_steps=2,
                     decode_chunk_size=4, key=jax.random.PRNGKey(2))
    f = np.asarray(frames)
    assert f.shape == (1, t, H, W, 3)
    assert np.all(np.isfinite(f)) and f.min() >= 0.0 and f.max() <= 1.0


def test_hybrid_mask_extremes_select_adapter():
    """mask==1 everywhere -> pure face adapter; mask==0 -> pure drag.
    Outputs must differ when the adapters differ."""
    t = 3
    bundle = ModelBundle.init_random(
        jax.random.PRNGKey(3), MICRO_UNET_CONFIG, TINY_VAE_CONFIG,
        TINY_CLIP_CONFIG, ldmk=True, dual=True, image_size=(H, W),
        num_frames=t)
    # zero-convs make fresh adapters emit zero residuals; perturb the drag
    # adapter so face-vs-drag selection is observable
    leaves, treedef = jax.tree_util.tree_flatten(bundle.controlnet2_params)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    bundle.controlnet2_params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])
    pipe = HybridPipeline(bundle)
    rng = np.random.RandomState(2)
    image = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    flow = jnp.asarray(rng.randn(1, t - 1, H, W, 2).astype(np.float32) * 3)
    drag = jnp.asarray(rng.randn(1, t - 1, H, W, 2).astype(np.float32) * 3)
    ldmk = jnp.asarray(rng.rand(1, t, H, W, 3).astype(np.float32))
    kw = dict(num_inference_steps=1, output_type="latent",
              key=jax.random.PRNGKey(5))
    lat_face, _ = pipe(image, flow, drag, ldmk, jnp.ones((1, H, W, 1)), **kw)
    lat_drag, _ = pipe(image, flow, drag, ldmk, jnp.zeros((1, H, W, 1)), **kw)
    assert not np.allclose(np.asarray(lat_face), np.asarray(lat_drag))


def test_keypoint_small_program_matches_big():
    t, win, stride = 7, 4, 2
    bundle = ModelBundle.init_random(
        jax.random.PRNGKey(7), MICRO_UNET_CONFIG, TINY_VAE_CONFIG,
        TINY_CLIP_CONFIG, ldmk=True, image_size=(H, W), num_frames=win)
    rng = np.random.RandomState(9)
    image = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    flow = jnp.asarray(rng.randn(1, t - 1, H, W, 2).astype(np.float32))
    ldmk = jnp.asarray(rng.rand(1, t, H, W, 3).astype(np.float32))
    kw = dict(window_size=win, stride=stride, num_inference_steps=2,
              output_type="latent", key=jax.random.PRNGKey(3))
    big, _ = KeypointPipeline(bundle, big_program=True)(image, flow, ldmk, **kw)
    small, _ = KeypointPipeline(bundle, big_program=False)(image, flow, ldmk, **kw)
    np.testing.assert_allclose(np.asarray(small), np.asarray(big),
                               atol=3e-4, rtol=3e-4)


def test_keypoint_cfg_split_matches_batched():
    """Small-programs cfg_split (sequential CFG halves per window step,
    half peak HBM — the 576x1024 16 GB-fit knob) must reproduce the
    2B-batched window step with time_context_hw_major_quirk OFF (same
    caveat as TrajPipeline: the B=1 halves disable the pairwise hw-major
    context quirk, so with it ON they legitimately differ)."""
    import dataclasses as dc
    t, win, stride = 7, 4, 2
    cfg = dc.replace(MICRO_UNET_CONFIG, time_context_hw_major_quirk=False)
    bundle = ModelBundle.init_random(
        jax.random.PRNGKey(12), cfg, TINY_VAE_CONFIG, TINY_CLIP_CONFIG,
        ldmk=True, image_size=(H, W), num_frames=win)
    rng = np.random.RandomState(13)
    image = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    flow = jnp.asarray(rng.randn(1, t - 1, H, W, 2).astype(np.float32))
    ldmk = jnp.asarray(rng.rand(1, t, H, W, 3).astype(np.float32))
    pipe = KeypointPipeline(bundle, big_program=False)
    kw = dict(window_size=win, stride=stride, num_inference_steps=2,
              output_type="latent", key=jax.random.PRNGKey(14))
    a, _ = pipe(image, flow, ldmk, **kw)
    b, _ = pipe(image, flow, ldmk, cfg_split=True, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=5e-3, atol=1e-3)


def test_keypoint_cfg_split_rejects_big_or_batched():
    bundle = ModelBundle.init_random(
        jax.random.PRNGKey(15), MICRO_UNET_CONFIG, TINY_VAE_CONFIG,
        TINY_CLIP_CONFIG, ldmk=True, image_size=(H, W), num_frames=4)
    rng = np.random.RandomState(16)
    image = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    flow = jnp.asarray(rng.randn(1, 6, H, W, 2).astype(np.float32))
    ldmk = jnp.asarray(rng.rand(1, 7, H, W, 3).astype(np.float32))
    kw = dict(window_size=4, stride=2, num_inference_steps=1,
              output_type="latent", key=jax.random.PRNGKey(17))
    with pytest.raises(ValueError):
        KeypointPipeline(bundle, big_program=True)(
            image, flow, ldmk, cfg_split=True, **kw)
    with pytest.raises(ValueError):
        KeypointPipeline(bundle, big_program=False)(
            image, flow, ldmk, cfg_split=True, window_batch=2, **kw)


def _hybrid_inputs(t, seed=4):
    rng = np.random.RandomState(seed)
    image = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    flow = jnp.asarray(rng.randn(1, t - 1, H, W, 2).astype(np.float32) * 3)
    drag = jnp.asarray(rng.randn(1, t - 1, H, W, 2).astype(np.float32) * 3)
    ldmk = jnp.asarray(rng.rand(1, t, H, W, 3).astype(np.float32))
    mask = jnp.asarray((rng.rand(1, H, W, 1) > 0.5).astype(np.float32))
    lat0 = jnp.asarray(rng.randn(1, t, H // 8, W // 8, 4).astype(np.float32))
    return image, flow, drag, ldmk, mask, lat0


def _perturbed_dual_bundle(cfg, t):
    bundle = ModelBundle.init_random(
        jax.random.PRNGKey(6), cfg, TINY_VAE_CONFIG, TINY_CLIP_CONFIG,
        ldmk=True, dual=True, image_size=(H, W), num_frames=t)
    # zero-convs make fresh adapters emit zero residuals; perturb both so
    # the blend (and thus the split/chunk paths' handling of it) matters
    for attr in ("controlnet_params", "controlnet2_params"):
        leaves, treedef = jax.tree_util.tree_flatten(getattr(bundle, attr))
        keys = jax.random.split(jax.random.PRNGKey(11), len(leaves))
        setattr(bundle, attr, jax.tree_util.tree_unflatten(
            treedef, [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
                      for l, k in zip(leaves, keys)]))
    return bundle


def test_hybrid_cfg_split_matches_batched():
    """Dual-adapter cfg_split (sequential CFG halves, half peak HBM) must
    reproduce the 2B-batched path with time_context_hw_major_quirk OFF
    (same caveat as TrajPipeline: with the quirk ON the B=1 halves disable
    the pairwise hw-major context quirk and legitimately differ)."""
    import dataclasses as dc
    t = 3
    cfg = dc.replace(MICRO_UNET_CONFIG, time_context_hw_major_quirk=False)
    bundle = _perturbed_dual_bundle(cfg, t)
    pipe = HybridPipeline(bundle)
    image, flow, drag, ldmk, mask, lat0 = _hybrid_inputs(t)
    kw = dict(num_inference_steps=2, output_type="latent", latents=lat0,
              key=jax.random.PRNGKey(7))
    a, _ = pipe(image, flow, drag, ldmk, mask, **kw)
    b, _ = pipe(image, flow, drag, ldmk, mask, cfg_split=True, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=5e-3, atol=1e-3)


def test_hybrid_step_chunked_matches_full():
    """step_chunk host-chunked Euler loop (with a ragged masked tail:
    K=2 over 3 steps) must match the single-scan program exactly."""
    t = 3
    bundle = _perturbed_dual_bundle(MICRO_UNET_CONFIG, t)
    pipe = HybridPipeline(bundle)
    image, flow, drag, ldmk, mask, lat0 = _hybrid_inputs(t, seed=5)
    kw = dict(num_inference_steps=3, output_type="latent", latents=lat0,
              key=jax.random.PRNGKey(8))
    a, _ = pipe(image, flow, drag, ldmk, mask, **kw)
    b, _ = pipe(image, flow, drag, ldmk, mask, step_chunk=2, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
