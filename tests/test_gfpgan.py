"""GFPGAN v1 clean golden vs torch transcription + enhancer integration."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from mofa_tpu.models.gfpgan import (GFPGANv1Clean, TINY_GFPGAN_CONFIG,
                                    enhance_aligned)
from mofa_tpu.models.weights import convert_gfpgan_state_dict
from tests.torch_ref.gfpgan_torch import GFPGANv1Clean as GFPGANTorch

CFG = TINY_GFPGAN_CONFIG


def _models():
    torch.manual_seed(0)
    tm = GFPGANTorch(out_size=CFG["out_size"],
                     num_style_feat=CFG["num_style_feat"],
                     channel_multiplier=CFG["channel_multiplier"],
                     num_mlp=CFG["num_mlp"], narrow=CFG["narrow"],
                     input_is_latent=True, different_w=True,
                     sft_half=True).eval()
    m = GFPGANv1Clean(out_size=CFG["out_size"],
                      num_style_feat=CFG["num_style_feat"],
                      channel_multiplier=CFG["channel_multiplier"],
                      num_mlp=CFG["num_mlp"], narrow=CFG["narrow"],
                      input_is_latent=True, different_w=True, sft_half=True)
    return tm, m


def test_gfpgan_golden():
    tm, m = _models()
    rng = np.random.RandomState(1)
    s = CFG["out_size"]
    x = (rng.rand(2, s, s, 3).astype(np.float32) * 2 - 1)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v for k, v in tm.state_dict().items()}
    params = convert_gfpgan_state_dict(params, sd)

    got = np.asarray(m.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    ref = np.moveaxis(ref.numpy(), 1, -1)
    assert got.shape == ref.shape == (2, s, s, 3)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_gfpgan_golden_not_input_is_latent():
    """Exercises the style MLP path (input_is_latent=False)."""
    torch.manual_seed(2)
    tm = GFPGANTorch(out_size=CFG["out_size"],
                     num_style_feat=CFG["num_style_feat"],
                     channel_multiplier=CFG["channel_multiplier"],
                     num_mlp=CFG["num_mlp"], narrow=CFG["narrow"],
                     input_is_latent=False, different_w=False,
                     sft_half=True).eval()
    m = GFPGANv1Clean(out_size=CFG["out_size"],
                      num_style_feat=CFG["num_style_feat"],
                      channel_multiplier=CFG["channel_multiplier"],
                      num_mlp=CFG["num_mlp"], narrow=CFG["narrow"],
                      input_is_latent=False, different_w=False, sft_half=True)
    rng = np.random.RandomState(3)
    s = CFG["out_size"]
    x = (rng.rand(1, s, s, 3).astype(np.float32) * 2 - 1)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_gfpgan_state_dict(params, tm.state_dict())
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    np.testing.assert_allclose(got, np.moveaxis(ref.numpy(), 1, -1),
                               rtol=2e-3, atol=2e-3)


def test_enhance_aligned_shapes():
    _, m = _models()
    s = CFG["out_size"]
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, s, s, 3), jnp.float32))
    frames = np.random.RandomState(4).rand(3, 48, 40, 3).astype(np.float32)
    out = enhance_aligned(m, params, frames, batch=2)
    assert out.shape == frames.shape
    assert np.all(np.isfinite(out)) and out.min() >= 0 and out.max() <= 1
