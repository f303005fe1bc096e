"""Golden parity: Flax facerender vs the reference torch modules
(sadtalker_audio2pose/src/facerender), random weights, eval mode."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mofa_tpu.models import facerender as fr
from mofa_tpu.models.weights import convert_facerender_state_dict

REF = "/root/reference/MOFA-Video-Hybrid/sadtalker_audio2pose"


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REF)
    try:
        from src.facerender.modules.keypoint_detector import (  # noqa
            KPDetector, HEEstimator)
        from src.facerender.modules.mapping import MappingNet  # noqa
        from src.facerender.modules.generator import (  # noqa
            OcclusionAwareGenerator, OcclusionAwareSPADEGenerator)
        from src.facerender.modules import make_animation as ma  # noqa
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference facerender import failed: {e}")
    finally:
        sys.path.remove(REF)
    return dict(KPDetector=KPDetector, HEEstimator=HEEstimator,
                MappingNet=MappingNet,
                OcclusionAwareGenerator=OcclusionAwareGenerator,
                OcclusionAwareSPADEGenerator=OcclusionAwareSPADEGenerator,
                ma=ma)


def _randomize_bn(mod):
    with torch.no_grad():
        for m in mod.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)) \
                    or m.__class__.__name__.startswith("SynchronizedBatchNorm"):
                if hasattr(m, "running_mean") and m.running_mean is not None:
                    m.running_mean.normal_(0, 0.1)
                    m.running_var.uniform_(0.8, 1.2)


def _nchw(x):
    return torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy())


CFG = fr.FaceRenderConfig()
COMMON = dict(num_kp=CFG.num_kp, image_channel=3,
              feature_channel=CFG.feature_channel, estimate_jacobian=False)


def test_mapping_golden(ref_modules):
    torch.manual_seed(0)
    tm = ref_modules["MappingNet"](coeff_nc=70, descriptor_nc=CFG.descriptor_nc,
                                   layer=3, num_kp=15, num_bins=66).eval()
    x = np.random.RandomState(0).randn(2, 70, 27).astype(np.float32)

    net = fr.MappingNet(CFG)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_facerender_state_dict(
        params, {k: v.numpy() for k, v in tm.state_dict().items()},
        net="mapping")
    ours = net.apply(params, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    for k in ("yaw", "pitch", "roll", "t", "exp"):
        np.testing.assert_allclose(np.asarray(ours[k]), ref[k].numpy(),
                                   atol=2e-4, rtol=2e-4)


def test_kp_detector_golden(ref_modules):
    torch.manual_seed(1)
    tm = ref_modules["KPDetector"](
        block_expansion=CFG.kp_block_expansion, feature_channel=32,
        num_kp=CFG.num_kp, image_channel=3,
        max_features=CFG.kp_max_features,
        reshape_channel=CFG.kp_reshape_channel,
        reshape_depth=CFG.kp_reshape_depth, num_blocks=CFG.kp_num_blocks,
        temperature=CFG.temperature, estimate_jacobian=False,
        scale_factor=CFG.kp_scale_factor).eval()
    _randomize_bn(tm)
    img = np.random.RandomState(1).rand(1, 128, 128, 3).astype(np.float32)

    net = fr.KPDetector(CFG)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(img))
    params = convert_facerender_state_dict(
        params, {k: v.numpy() for k, v in tm.state_dict().items()},
        net="kp_detector")
    ours = np.asarray(net.apply(params, jnp.asarray(img)))
    with torch.no_grad():
        ref = tm(_nchw(img))["value"].numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=5e-4)


def test_he_estimator_golden(ref_modules):
    torch.manual_seed(2)
    tm = ref_modules["HEEstimator"](
        block_expansion=CFG.he_block_expansion, feature_channel=32,
        num_kp=CFG.num_kp, image_channel=3, max_features=2048,
        num_bins=CFG.num_bins).eval()
    _randomize_bn(tm)
    img = np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32)

    net = fr.HEEstimator(CFG)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(img))
    params = convert_facerender_state_dict(
        params, {k: v.numpy() for k, v in tm.state_dict().items()},
        net="he_estimator")
    ours = net.apply(params, jnp.asarray(img))
    with torch.no_grad():
        ref = tm(_nchw(img))
    # reference returns {'yaw': fc_roll(x), ...} — our dict mirrors that
    for k in ("yaw", "pitch", "roll", "t", "exp"):
        np.testing.assert_allclose(np.asarray(ours[k]), ref[k].numpy(),
                                   atol=5e-4, rtol=5e-4)


def test_spade_generator_golden(ref_modules):
    torch.manual_seed(3)
    dm_params = dict(block_expansion=CFG.dm_block_expansion,
                     max_features=CFG.dm_max_features,
                     num_blocks=CFG.dm_num_blocks,
                     reshape_depth=CFG.reshape_depth,
                     compress=CFG.dm_compress)
    tm = ref_modules["OcclusionAwareSPADEGenerator"](
        image_channel=3, feature_channel=CFG.feature_channel,
        num_kp=CFG.num_kp, block_expansion=CFG.gen_block_expansion,
        max_features=CFG.gen_max_features,
        num_down_blocks=CFG.num_down_blocks,
        reshape_channel=CFG.reshape_channel, reshape_depth=CFG.reshape_depth,
        num_resblocks=CFG.num_resblocks, estimate_occlusion_map=True,
        dense_motion_params=dm_params, estimate_jacobian=False).eval()
    _randomize_bn(tm)

    rng = np.random.RandomState(3)
    img = rng.rand(1, 128, 128, 3).astype(np.float32)
    kp_src = (rng.rand(1, CFG.num_kp, 3).astype(np.float32) - 0.5)
    kp_drv = (rng.rand(1, CFG.num_kp, 3).astype(np.float32) - 0.5)

    net = fr.OcclusionAwareSPADEGenerator(CFG)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(img),
                      jnp.asarray(kp_drv), jnp.asarray(kp_src))
    params = convert_facerender_state_dict(
        params, {k: v.numpy() for k, v in tm.state_dict().items()})
    ours = net.apply(params, jnp.asarray(img), jnp.asarray(kp_drv),
                     jnp.asarray(kp_src))
    with torch.no_grad():
        ref = tm(_nchw(img), kp_driving={"value": torch.from_numpy(kp_drv)},
                 kp_source={"value": torch.from_numpy(kp_src)})
    np.testing.assert_allclose(
        np.asarray(ours["prediction"]),
        np.moveaxis(ref["prediction"].numpy(), 1, -1), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(ours["occlusion_map"])[..., 0],
        ref["occlusion_map"].numpy()[:, 0], atol=1e-3, rtol=1e-3)


def test_keypoint_transformation_golden(ref_modules):
    ma = ref_modules["ma"]
    rng = np.random.RandomState(4)
    kp = rng.randn(2, 15, 3).astype(np.float32)
    he = {k: rng.randn(2, n).astype(np.float32)
          for k, n in (("yaw", 66), ("pitch", 66), ("roll", 66),
                       ("t", 3), ("exp", 45))}
    ours = np.asarray(fr.keypoint_transformation(
        jnp.asarray(kp), {k: jnp.asarray(v) for k, v in he.items()}))
    with torch.no_grad():
        ref = ma.keypoint_transformation(
            {"value": torch.from_numpy(kp)},
            {k: torch.from_numpy(v.copy()) for k, v in he.items()})
    np.testing.assert_allclose(ours, ref["value"].numpy(),
                               atol=1e-5, rtol=1e-5)


def test_make_animation_smoke():
    cfg = fr.TINY_FACERENDER_CONFIG
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    src_sem = jnp.asarray(rng.randn(1, 70, 27).astype(np.float32))
    tgt_sem = jnp.asarray(rng.randn(1, 3, 70, 27).astype(np.float32))

    kp = fr.KPDetector(cfg)
    kpp = kp.init(jax.random.PRNGKey(0), img)
    mp = fr.MappingNet(cfg)
    mpp = mp.init(jax.random.PRNGKey(1), src_sem)
    gen = fr.OcclusionAwareGenerator(cfg)
    gp = gen.init(jax.random.PRNGKey(2), img, jnp.zeros((1, cfg.num_kp, 3)),
                  jnp.zeros((1, cfg.num_kp, 3)))
    frames = fr.make_animation(img, src_sem, tgt_sem, gen, gp, kp, kpp,
                               mp, mpp)
    assert frames.shape == (1, 3, 32, 32, 3)
    assert np.isfinite(np.asarray(frames)).all()


def test_build_semantics_golden():
    import ast
    path = (REF + "/src/generate_facerender_batch.py")
    tree = ast.parse(open(path).read())
    keep = [n for n in tree.body if isinstance(n, ast.FunctionDef)
            and n.name in ("transform_semantic_1", "transform_semantic_target")]
    ns = {"np": np}
    exec(compile(ast.Module(body=keep, type_ignores=[]), path, "exec"), ns)

    rng = np.random.RandomState(6)
    src = rng.randn(1, 70).astype(np.float32)
    gen = rng.randn(9, 70).astype(np.float32)
    ours_src, ours_tgt = fr.build_semantics(src, gen)
    ref_src = ns["transform_semantic_1"](src, 13)
    np.testing.assert_allclose(ours_src[0], ref_src, atol=0)
    for i in range(9):
        ref_t = ns["transform_semantic_target"](gen.copy(), i, 13)
        np.testing.assert_allclose(ours_tgt[0, i], ref_t, atol=0)


def test_facerender_cli_tiny(tmp_path):
    from PIL import Image
    from mofa_tpu.apps.facerender_app import main

    img = str(tmp_path / "src.png")
    Image.fromarray((np.random.RandomState(7).rand(40, 40, 3) * 255)
                    .astype(np.uint8)).save(img)
    rng = np.random.RandomState(8)
    coeff = str(tmp_path / "first.npz")
    np.savez(coeff, full_3dmm=rng.randn(1, 257).astype(np.float32) * 0.1)
    drv = str(tmp_path / "drv.npz")
    np.savez(drv, coeff_3dmm=rng.randn(4, 70).astype(np.float32) * 0.1)
    out = str(tmp_path / "out.mp4")
    main(["--image", img, "--coeff_npz", coeff, "--driving_coeffs_npz", drv,
          "--output", out, "--tiny"])
    assert os.path.getsize(out) > 0
