"""Golden parity: our Flax CMP / hourglass vs the reference torch modules.

The reference CMP + occlusion modules are torch-only (no cupy/diffusers), so
we import them straight from /root/reference, run them with random weights
in eval mode, convert the state dict, and require near-exact agreement.
"""

import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

REF = "/root/reference/MOFA-Video-Traj"
REF_HYBRID = "/root/reference/MOFA-Video-Hybrid"


def _nchw(x):
    return torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy())


def _nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


@pytest.fixture(scope="module")
def ref_cmp_modules():
    sys.path.insert(0, REF)
    try:
        from models.cmp.models.modules.cmp import CMP  # noqa
        from models.cmp.models.backbone.resnet import resnet50  # noqa
        from models.cmp.models.modules.shallownet import shallownet8x  # noqa
        from models.cmp.models.modules.decoder import MotionDecoderSkipLayer  # noqa
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference cmp import failed: {e}")
    finally:
        sys.path.remove(REF)
    return CMP, resnet50, shallownet8x, MotionDecoderSkipLayer


def test_cmp_full_golden(ref_cmp_modules):
    CMPRef, *_ = ref_cmp_modules
    params_ref = dict(
        image_encoder="resnet50", sparse_encoder="shallownet8x",
        flow_decoder="MotionDecoderSkipLayer", skip_layer=True,
        img_enc_dim=256, sparse_enc_dim=16, output_dim=198,
        decoder_combo=[1, 2, 4], pretrained_image_encoder=False,
        nbins=99, fmax=50,
    )
    torch.manual_seed(0)
    tm = CMPRef(params_ref).eval()
    # randomize BN running stats so the parity test actually exercises them
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)

    from mofa_tpu.models.cmp import CMP, CMPConfig, fuser_convert_flow
    from mofa_tpu.models.weights import convert_cmp_state_dict

    rng = np.random.RandomState(0)
    H = W = 64  # small but exercises every layer
    image = rng.rand(1, H, W, 3).astype(np.float32) * 2 - 1
    sparse = rng.randn(1, H, W, 2).astype(np.float32) * 5
    mask = (rng.rand(1, H, W, 2) > 0.95).astype(np.float32)

    m = CMP(CMPConfig())
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(image), jnp.asarray(sparse),
                    jnp.asarray(mask))
    params = convert_cmp_state_dict(params, tm.state_dict())

    got = np.asarray(m.apply(params, jnp.asarray(image), jnp.asarray(sparse),
                             jnp.asarray(mask)))

    with torch.no_grad():
        logits = tm(_nchw(image), torch.cat([_nchw(sparse), _nchw(mask)], dim=1))
        nbins = 99
        fmax = 50.0
        step = 2 * fmax / nbins
        mesh = (torch.arange(nbins).float() * step - fmax + step / 2).view(1, -1, 1, 1)
        px = torch.softmax(logits[:, :nbins], dim=1)
        py = torch.softmax(logits[:, nbins:], dim=1)
        flow = torch.cat([(px * mesh).sum(1, keepdim=True),
                          (py * mesh).sum(1, keepdim=True)], dim=1)
        flow = torch.nn.functional.interpolate(flow, size=(H, W), mode="bilinear",
                                               align_corners=True)
    ref = _nhwc(flow)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_cmp_alexnet_plain_golden(ref_cmp_modules):
    """rep-learning experiment config family: alexnet_fcn_8x encoder +
    MotionDecoderPlain, no skips (experiments/rep_learning/*/config.yaml)."""
    CMPRef, *_ = ref_cmp_modules
    params_ref = dict(
        image_encoder="alexnet_fcn_8x", sparse_encoder="shallownet8x",
        flow_decoder="MotionDecoderPlain", skip_layer=False,
        img_enc_dim=64, sparse_enc_dim=16, output_dim=38,
        decoder_combo=[1, 2, 4], pretrained_image_encoder=False,
        nbins=19, fmax=47.5,
    )
    torch.manual_seed(2)
    tm = CMPRef(params_ref).eval()
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)

    from mofa_tpu.models.cmp import CMP, CMPConfig
    from mofa_tpu.models.weights import convert_cmp_state_dict

    cfg = CMPConfig(img_enc_dim=64, sparse_enc_dim=16, output_dim=38,
                    nbins=19, fmax=47.5, image_encoder="alexnet_fcn_8x",
                    flow_decoder="MotionDecoderPlain", skip_layer=False,
                    decoder_combo=(1, 2, 4))
    rng = np.random.RandomState(2)
    H = W = 64
    image = rng.rand(1, H, W, 3).astype(np.float32) * 2 - 1
    sparse = rng.randn(1, H, W, 2).astype(np.float32) * 5
    mask = (rng.rand(1, H, W, 2) > 0.95).astype(np.float32)

    m = CMP(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(image),
                    jnp.asarray(sparse), jnp.asarray(mask))
    params = convert_cmp_state_dict(params, tm.state_dict())
    got = np.asarray(m.apply(params, jnp.asarray(image), jnp.asarray(sparse),
                             jnp.asarray(mask), method=CMP.logits))
    with torch.no_grad():
        ref = tm(_nchw(image), torch.cat([_nchw(sparse), _nchw(mask)], dim=1))
    np.testing.assert_allclose(got, _nhwc(ref), rtol=1e-3, atol=2e-3)


def test_flownet_decoder_golden():
    """MotionDecoderFlowNet standalone (decoder.py:218-345): the reference
    CMP wrapper can't route skips to it (skip_layer asserts SkipLayer), so
    it is golden-tested as a module with resnet-shaped skip features."""
    sys.path.insert(0, REF)
    try:
        from models.cmp.models.modules.decoder import MotionDecoderFlowNet as RefFN
    finally:
        sys.path.remove(REF)

    torch.manual_seed(3)
    in_dim, out_dim = 72, 2
    tm = RefFN(input_dim=in_dim, output_dim=out_dim).eval()
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)

    from mofa_tpu.models.cmp import CMPConfig, MotionDecoderFlowNet
    from mofa_tpu.models.weights import convert_cmp_state_dict

    rng = np.random.RandomState(3)
    x = rng.randn(1, 8, 8, in_dim).astype(np.float32)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    conv1 = rng.randn(1, 32, 32, 64).astype(np.float32)
    layer1 = rng.randn(1, 16, 16, 256).astype(np.float32)
    skips = [jnp.asarray(img), jnp.asarray(conv1), jnp.asarray(layer1)]

    m = MotionDecoderFlowNet(CMPConfig(output_dim=out_dim))
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), skips)
    wrapped = {"params": {"flow_decoder": params["params"]}}
    sd = {f"flow_decoder.{k}": v for k, v in tm.state_dict().items()}
    wrapped = convert_cmp_state_dict(wrapped, sd)
    params = {"params": wrapped["params"]["flow_decoder"]}

    flows = m.apply(params, jnp.asarray(x), skips)
    with torch.no_grad():
        ref_flows = tm(_nchw(x), [_nchw(img), _nchw(conv1), _nchw(layer1)])
    assert len(flows) == len(ref_flows) == 4
    for got, ref in zip(flows, ref_flows):
        np.testing.assert_allclose(np.asarray(got), _nhwc(ref),
                                   rtol=1e-3, atol=2e-3)


def test_edge_aware_loss_golden(monkeypatch):
    """EdgeAwareLoss L1 (losses.py:24-64). The reference class hard-binds
    .cuda() in __init__; neutralized for the CPU golden run."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    sys.path.insert(0, REF)
    try:
        from models.cmp.losses import EdgeAwareLoss
    finally:
        sys.path.remove(REF)

    from mofa_tpu.models.cmp.train import edge_aware_loss

    rng = np.random.RandomState(4)
    pred = rng.randn(2, 16, 16, 2).astype(np.float32) * 3
    target = rng.randn(2, 32, 32, 2).astype(np.float32) * 3
    ref = EdgeAwareLoss(nc=2, loss_type="L1")(
        _nchw(pred), _nchw(target)).item()
    got = float(edge_aware_loss(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_hourglass_matting_golden():
    sys.path.insert(0, REF_HYBRID)
    try:
        from models.occlusion.hourglass import ForegroundMatting as RefFM
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference hourglass import failed: {e}")
    finally:
        sys.path.remove(REF_HYBRID)

    from mofa_tpu.models.hourglass import ForegroundMatting
    from mofa_tpu.models.weights import convert_torch_state_dict

    torch.manual_seed(1)
    c = 32
    tm = RefFM(c).eval()
    rng = np.random.RandomState(1)
    ref_feat = rng.randn(2, 8, 8, c).astype(np.float32)
    flow = rng.randn(2, 8, 8, 2).astype(np.float32)
    warped = rng.randn(2, 8, 8, c).astype(np.float32)

    m = ForegroundMatting(c)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(ref_feat), jnp.asarray(flow),
                    jnp.asarray(warped))
    # reference names: hourglass.encoder.down_blocks.N.conv / hourglass.decoder.up_blocks.N.conv
    sd = {k.replace("hourglass.encoder.down_blocks", "hourglass.encoder_down_blocks")
           .replace("hourglass.decoder.up_blocks", "hourglass.decoder_up_blocks"): v
          for k, v in tm.state_dict().items()}
    params = convert_torch_state_dict(params, sd)

    got_out, got_mask = m.apply(params, jnp.asarray(ref_feat), jnp.asarray(flow),
                                jnp.asarray(warped))
    with torch.no_grad():
        ref_out, ref_mask = tm(_nchw(ref_feat), _nchw(flow), _nchw(warped))
    np.testing.assert_allclose(np.asarray(got_out), _nhwc(ref_out), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_mask), _nhwc(ref_mask), rtol=1e-3, atol=1e-4)
