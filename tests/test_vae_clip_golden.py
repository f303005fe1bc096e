"""Golden tests: Flax SVD VAE (temporal decoder) + CLIP vision vs the torch
transcriptions, through the real weight converters.

Closes the round-3 validation gap: `models/vae.py` and
`models/clip_vision.py` sit on the fidelity-critical decode/embed path of
every pipeline (the reference loads them at
/root/reference/MOFA-Video-Traj/run_gradio.py:98-108) but previously had
no numeric golden. Torch references: tests/torch_ref/vae_torch.py
(diffusers-0.24 AutoencoderKLTemporalDecoder semantics) and
tests/torch_ref/clip_torch.py (transformers CLIPVisionModelWithProjection
semantics); conversion goes through
convert_vae_state_dict / convert_clip_vision_state_dict — the same code
path real checkpoints take.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from mofa_tpu.models.vae import (AutoencoderKLTemporalDecoder, VAEConfig,
                                 TINY_VAE_CONFIG)
from mofa_tpu.models.clip_vision import (CLIPVisionModelWithProjection,
                                         CLIPVisionConfig)
from mofa_tpu.models.weights import (convert_vae_state_dict,
                                     convert_clip_vision_state_dict)
from tests.torch_ref.vae_torch import AutoencoderKLTemporalDecoderTorch
from tests.torch_ref.clip_torch import CLIPVisionModelWithProjectionTorch


def _tiny_vae_pair(seed=0, cfg=TINY_VAE_CONFIG):
    torch.manual_seed(seed)
    tm = AutoencoderKLTemporalDecoderTorch(
        block_out_channels=cfg.block_out_channels,
        layers_per_block=cfg.layers_per_block,
        latent_channels=cfg.latent_channels).eval()
    m = AutoencoderKLTemporalDecoder(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                    num_frames=2)
    sd = tm.state_dict()
    # at num_layers=1 diffusers creates the decoder mid attention but
    # never runs it (zip truncation) — convert_vae_state_dict drops the
    # dead keys itself (gated on the Flax tree lacking the module), so
    # strict conversion of the raw state dict must succeed as-is
    params = convert_vae_state_dict(params, sd)
    return m, params, tm


def test_vae_encoder_moments_golden():
    """Encoder + quant_conv + DiagonalGaussian mean/logvar (incl. clamp),
    the `.latent_dist.mode()` path of pipeline.py:143-163."""
    m, params, tm = _tiny_vae_pair()
    rng = np.random.RandomState(1)
    x = (2.0 * rng.rand(2, 48, 32, 3) - 1.0).astype(np.float32)
    mean, logvar = m.apply(
        params, jnp.asarray(x),
        method=AutoencoderKLTemporalDecoder.encode_moments)
    with torch.no_grad():
        rmean, rlogvar = tm.encode_moments(
            torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    np.testing.assert_allclose(np.asarray(mean),
                               np.moveaxis(rmean.numpy(), 1, -1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar),
                               np.moveaxis(rlogvar.numpy(), 1, -1),
                               rtol=1e-4, atol=1e-4)


def test_vae_temporal_decoder_golden():
    """TemporalDecoder: SpatioTemporalResBlocks (learned alpha blend with
    the spatial/temporal switch), mid attention, nearest upsamples, and
    the final (3,1,1) time_conv_out."""
    m, params, tm = _tiny_vae_pair(seed=2)
    rng = np.random.RandomState(3)
    t = 5
    z = rng.randn(t, 6, 4, TINY_VAE_CONFIG.latent_channels).astype(np.float32)
    got = m.apply(params, jnp.asarray(z), t,
                  method=AutoencoderKLTemporalDecoder.decode)
    with torch.no_grad():
        ref = tm.decode(torch.from_numpy(np.moveaxis(z, -1, 1).copy()), t)
    ref = np.moveaxis(ref.numpy(), 1, -1)
    assert np.asarray(got).shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_vae_temporal_decoder_golden_lpb2():
    """layers_per_block=2 (the REAL checkpoint's mid structure:
    resnet -> single-head attention -> resnet) at small channels."""
    cfg = VAEConfig(block_out_channels=(32, 32), layers_per_block=2)
    m, params, tm = _tiny_vae_pair(seed=11, cfg=cfg)
    rng = np.random.RandomState(12)
    t = 3
    z = rng.randn(t, 5, 4, cfg.latent_channels).astype(np.float32)
    got = m.apply(params, jnp.asarray(z), t,
                  method=AutoencoderKLTemporalDecoder.decode)
    with torch.no_grad():
        ref = tm.decode(torch.from_numpy(np.moveaxis(z, -1, 1).copy()), t)
    ref = np.moveaxis(ref.numpy(), 1, -1)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_vae_chunked_decode_golden():
    """decode_latents' chunk-local temporal-conv semantics match the
    reference decode loop (pipeline.py:194-220): each chunk is its own
    'video' (its own image_only_indicator), incl. a ragged last chunk."""
    from mofa_tpu.pipelines.common import ModelBundle, decode_latents

    m, params, tm = _tiny_vae_pair(seed=4)
    rng = np.random.RandomState(5)
    b, t = 1, 7
    scaling = TINY_VAE_CONFIG.scaling_factor
    lat = rng.randn(b, t, 4, 6, TINY_VAE_CONFIG.latent_channels
                    ).astype(np.float32)
    bundle = ModelBundle(None, None, None, None, m, params, None, None)
    got = np.asarray(decode_latents(bundle, jnp.asarray(lat),
                                    decode_chunk_size=3))

    flat = np.moveaxis(lat.reshape((b * t,) + lat.shape[2:]), -1, 1)
    flat = torch.from_numpy(flat.copy()) / scaling
    refs = []
    with torch.no_grad():
        for i in range(0, b * t, 3):
            chunk = flat[i:i + 3]
            refs.append(tm.decode(chunk, chunk.shape[0]))
    ref = torch.cat(refs, 0).numpy()
    ref = np.moveaxis(ref, 1, -1).reshape(got.shape)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
def test_clip_vision_golden(act):
    cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_layers=2, num_heads=2, patch_size=16,
                           image_size=48, projection_dim=24, hidden_act=act)
    torch.manual_seed(6)
    tm = CLIPVisionModelWithProjectionTorch(
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        patch_size=cfg.patch_size, image_size=cfg.image_size,
        projection_dim=cfg.projection_dim, hidden_act=act).eval()
    m = CLIPVisionModelWithProjection(cfg)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))
    params = convert_clip_vision_state_dict(params, tm.state_dict())

    rng = np.random.RandomState(7)
    x = rng.rand(2, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_encode_clip_image_quirk_golden():
    """The full reference `_encode_image` path (pipeline.py:114-141):
    [0,1] pixels WITHOUT CLIP normalization -> antialiased resize to the
    encoder size -> image_embeds -> zeros-uncond CFG stack."""
    import ast
    from mofa_tpu.pipelines.common import ModelBundle, encode_clip_image

    cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_layers=2, num_heads=2, patch_size=16,
                           image_size=48, projection_dim=24)
    torch.manual_seed(8)
    tm = CLIPVisionModelWithProjectionTorch(
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        patch_size=cfg.patch_size, image_size=cfg.image_size,
        projection_dim=cfg.projection_dim).eval()
    m = CLIPVisionModelWithProjection(cfg)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))
    params = convert_clip_vision_state_dict(params, tm.state_dict())

    pipeline_ref = "/root/reference/MOFA-Video-Traj/pipeline/pipeline.py"
    tree = ast.parse(open(pipeline_ref).read())
    keep = [n for n in tree.body if isinstance(n, ast.FunctionDef)
            and n.name in ("_resize_with_antialiasing", "_compute_padding",
                           "_filter2d", "_gaussian", "_gaussian_blur2d")]
    ns = {"torch": torch}
    exec(compile(ast.Module(body=keep, type_ignores=[]), pipeline_ref,
                 "exec"), ns)

    rng = np.random.RandomState(9)
    image01 = rng.rand(1, 40, 56, 3).astype(np.float32)
    bundle = ModelBundle(None, None, None, None, None, None, m, params)
    got = np.asarray(encode_clip_image(bundle, jnp.asarray(image01),
                                       do_cfg=True))
    with torch.no_grad():
        tin = torch.from_numpy(np.moveaxis(image01, -1, 1).copy())
        tin = ns["_resize_with_antialiasing"](
            tin, (cfg.image_size, cfg.image_size))
        emb = tm(tin).unsqueeze(1)
        ref = torch.cat([torch.zeros_like(emb), emb]).numpy()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
