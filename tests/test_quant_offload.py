"""Int8 weight-only storage (core/quant.py) + phase-scoped encoder
residency (ModelBundle.offload_encoders) — the two memory levers that fit
the dual-adapter Hybrid flagship (reference pipeline.py:446-511) at
576x1024/T=25 on one 16 GB v5e chip."""

import jax
import jax.numpy as jnp
import numpy as np

from mofa_tpu.core.quant import (
    quantize_tree, dequantize_tree, maybe_dequantize, has_quantized,
    is_qleaf, QKEY, SKEY)
from mofa_tpu.models.svd_unet import MICRO_UNET_CONFIG
from mofa_tpu.models.vae import TINY_VAE_CONFIG
from mofa_tpu.models.clip_vision import TINY_CLIP_CONFIG
from mofa_tpu.pipelines.common import ModelBundle, params_dtype
from mofa_tpu.pipelines.hybrid import HybridPipeline

H = W = 64


def _tree(key, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "dense": {"kernel": jax.random.normal(k1, (64, 96), dtype) * 0.3,
                  "bias": jax.random.normal(k2, (96,), dtype)},
        "conv": {"kernel": jax.random.normal(k3, (3, 3, 16, 32), dtype)},
        "norm": {"scale": jnp.ones((96,), dtype)},
    }


def test_quantize_roundtrip_error_bound():
    params = _tree(jax.random.PRNGKey(0))
    q = quantize_tree(params, min_size=16)
    assert has_quantized(q)
    deq = dequantize_tree(q, jnp.float32)
    for name in ("dense", "conv"):
        w = params[name]["kernel"]
        r = deq[name]["kernel"]
        # symmetric int8: per-output-channel error <= scale/2 = absmax/254
        axes = tuple(range(w.ndim - 1))
        bound = jnp.max(jnp.abs(w), axis=axes) / 254.0 + 1e-6
        err = jnp.max(jnp.abs(w - r), axis=axes)
        assert bool(jnp.all(err <= bound)), (name, err / bound)


def test_quantize_skips_small_and_1d_leaves():
    params = _tree(jax.random.PRNGKey(1))
    q = quantize_tree(params, min_size=16)
    # biases / norm scales pass through untouched
    assert q["dense"]["bias"] is params["dense"]["bias"]
    assert q["norm"]["scale"] is params["norm"]["scale"]
    assert is_qleaf(q["dense"]["kernel"])
    # default min_size leaves this whole small tree unquantized
    q2 = quantize_tree(params)
    assert not has_quantized(q2)
    assert maybe_dequantize(q2, jnp.float32) is q2


def test_params_dtype_quant_aware():
    params = _tree(jax.random.PRNGKey(2), jnp.bfloat16)
    q = quantize_tree(params, min_size=16)
    # fp32 quantization scales must not masquerade as the compute dtype
    assert q["dense"]["kernel"][SKEY].dtype == jnp.float32
    assert params_dtype(q) == jnp.bfloat16


def test_dequantize_token_pins_inside_scan():
    """Barrier-pinned dequant inside a scan still computes correctly."""
    params = _tree(jax.random.PRNGKey(3))
    q = quantize_tree(params, min_size=16)
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 64))

    @jax.jit
    def scanned(qp, x):
        def body(carry, idx):
            p = dequantize_tree(qp, jnp.float32, token=idx)
            return carry @ p["dense"]["kernel"] @ p["dense"]["kernel"].T, None
        out, _ = jax.lax.scan(body, x, jnp.arange(3))
        return out

    ref_p = dequantize_tree(q, jnp.float32)
    ref = x
    for _ in range(3):
        ref = ref @ ref_p["dense"]["kernel"] @ ref_p["dense"]["kernel"].T
    np.testing.assert_allclose(np.asarray(scanned(q, x)), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def _hybrid_inputs(t=3):
    rng = np.random.RandomState(7)
    return (jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32)),
            jnp.asarray(rng.randn(1, t - 1, H, W, 2).astype(np.float32)),
            jnp.asarray(rng.randn(1, t - 1, H, W, 2).astype(np.float32)),
            jnp.asarray(rng.rand(1, t, H, W, 3).astype(np.float32)),
            jnp.asarray((rng.rand(1, H, W, 1) > 0.5).astype(np.float32)))


def test_hybrid_offload_matches_resident():
    """offload_encoders is bit-identical to the resident path, and the
    VAE params come back for the decode."""
    t = 3
    bundle = ModelBundle.init_random(
        jax.random.PRNGKey(0), MICRO_UNET_CONFIG, TINY_VAE_CONFIG,
        TINY_CLIP_CONFIG, ldmk=True, dual=True, image_size=(H, W),
        num_frames=t)
    pipe = HybridPipeline(bundle)
    args = _hybrid_inputs(t)
    kw = dict(num_inference_steps=2, decode_chunk_size=4,
              key=jax.random.PRNGKey(2))
    ref, _ = pipe(*args, **kw)
    out, _ = pipe(*args, offload_encoders=True, **kw)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    # decode re-uploaded the VAE; CLIP stays offloaded until next encode
    assert bundle.vae_params is not None
    assert bundle.clip_params is None and bundle._clip_host is not None
    # a following call re-uploads CLIP transparently
    out2, _ = pipe(*args, **kw)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out2))


def test_hybrid_quantized_bundle_runs_close():
    """int8 UNet + adapters through the deployment path (cfg_split +
    step_chunk + offload): finite, and close to the fp path — int8
    weight rounding through a 2-step micro pipeline stays small."""
    t = 3
    bundle = ModelBundle.init_random(
        jax.random.PRNGKey(5), MICRO_UNET_CONFIG, TINY_VAE_CONFIG,
        TINY_CLIP_CONFIG, ldmk=True, dual=True, image_size=(H, W),
        num_frames=t)
    args = _hybrid_inputs(t)
    kw = dict(num_inference_steps=2, decode_chunk_size=4,
              key=jax.random.PRNGKey(2), cfg_split=True, step_chunk=1)
    ref, _ = HybridPipeline(bundle)(*args, **kw)

    bundle.unet_params = quantize_tree(bundle.unet_params, min_size=1024)
    bundle.controlnet_params = quantize_tree(bundle.controlnet_params,
                                             min_size=1024)
    bundle.controlnet2_params = quantize_tree(bundle.controlnet2_params,
                                              min_size=1024)
    assert has_quantized(bundle.unet_params)
    out, _ = HybridPipeline(bundle)(*args, offload_encoders=True, **kw)
    f = np.asarray(out)
    assert f.shape == np.asarray(ref).shape
    assert np.all(np.isfinite(f))
    diff = np.abs(f - np.asarray(ref)).mean()
    assert diff < 0.05, diff  # frames live in [0, 1]
