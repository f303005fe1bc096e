"""Golden parity: Flax PIRenderer vs the reference torch FaceGenerator
(sadtalker_audio2pose/src/facerender/pirender), random weights."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mofa_tpu.models import pirender as pr
from mofa_tpu.models.weights import convert_pirender_state_dict

REF = "/root/reference/MOFA-Video-Hybrid/sadtalker_audio2pose"


@pytest.fixture(scope="module")
def ref_facegen():
    sys.path.insert(0, REF)
    try:
        from src.facerender.pirender.face_model import FaceGenerator  # noqa
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference pirender import failed: {e}")
    finally:
        sys.path.remove(REF)
    return FaceGenerator


def test_facegenerator_golden(ref_facegen):
    torch.manual_seed(0)
    tm = ref_facegen(
        mapping_net=dict(coeff_nc=73, descriptor_nc=256, layer=3),
        warpping_net=dict(encoder_layer=5, decoder_layer=3, base_nc=32),
        editing_net=dict(layer=3, num_res_blocks=2, base_nc=64),
        common=dict(image_nc=3, descriptor_nc=256, max_nc=256,
                    use_spect=False)).eval()

    rng = np.random.RandomState(0)
    img = rng.rand(1, 128, 128, 3).astype(np.float32)
    sem = rng.randn(1, 73, 27).astype(np.float32)

    net = pr.FaceGenerator(pr.PIRenderConfig())
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(img),
                      jnp.asarray(sem))
    params = convert_pirender_state_dict(
        params, {k: v.numpy() for k, v in tm.state_dict().items()})
    ours = net.apply(params, jnp.asarray(img), jnp.asarray(sem))
    with torch.no_grad():
        timg = torch.from_numpy(np.moveaxis(img, -1, 1).copy())
        ref = tm(timg, torch.from_numpy(sem))

    np.testing.assert_allclose(
        np.asarray(ours["flow_field"]),
        np.moveaxis(ref["flow_field"].numpy(), 1, -1), atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(ours["warp_image"]),
        np.moveaxis(ref["warp_image"].numpy(), 1, -1), atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(ours["fake_image"]),
        np.moveaxis(ref["fake_image"].numpy(), 1, -1), atol=2e-3, rtol=2e-3)


def test_pirender_animation_smoke():
    cfg = pr.TINY_PIRENDER_CONFIG
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    sem = jnp.asarray(rng.randn(1, 4, 73, 27).astype(np.float32))
    net = pr.FaceGenerator(cfg)
    params = net.init(jax.random.PRNGKey(0), img, sem[:, 0])
    frames = pr.pirender_animation(img, sem, net, params)
    assert frames.shape == (1, 4, 32, 32, 3)
    assert np.isfinite(np.asarray(frames)).all()
    assert (np.asarray(frames) <= 1.0).all() and (np.asarray(frames) >= -1.0).all()
