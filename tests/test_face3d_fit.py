"""Golden parity: 3DMM fit (ReconNet + align math) vs the reference
Deep3DFaceRecon pieces (networks.py ReconNetWrapper, preprocess.py POS /
extract_5p / align_img)."""

import ast
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mofa_tpu.models.audio import face3d_fit as ff
from mofa_tpu.models.weights import convert_face3d_recon_state_dict

REF = "/root/reference/MOFA-Video-Hybrid/sadtalker_audio2pose"
NETWORKS = REF + "/src/face3d/models/networks.py"
PREPROCESS = REF + "/src/face3d/util/preprocess.py"


@pytest.fixture(scope="module")
def ref_reconnet():
    # networks.py imports kornia + arcface at module top; stub them
    stubs = {}
    for name in ("kornia", "kornia.geometry"):
        stubs[name] = sys.modules.get(name)
        mod = types.ModuleType(name)
        if name.endswith("geometry"):
            mod.warp_affine = lambda *a, **k: None
        sys.modules[name] = mod
    arc = REF + "/src/face3d/models"
    sys.path.insert(0, REF)
    try:
        from src.face3d.models.networks import ReconNetWrapper  # noqa
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference networks import failed: {e}")
    finally:
        sys.path.remove(REF)
        for name, old in stubs.items():
            if old is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = old
    return ReconNetWrapper


def test_reconnet_golden(ref_reconnet):
    torch.manual_seed(0)
    tm = ref_reconnet("resnet50", use_last_fc=False).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.8, 1.2)
        # heads are zero-init in the reference; randomize to make the
        # parity test meaningful
        for head in tm.final_layers:
            head.weight.normal_(0, 0.02)
            head.bias.normal_(0, 0.02)

    img = np.random.RandomState(0).rand(1, 112, 112, 3).astype(np.float32)
    net = ff.ReconNet()
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(img))
    params = convert_face3d_recon_state_dict(
        params, {k: v.numpy() for k, v in tm.state_dict().items()})
    ours = np.asarray(net.apply(params, jnp.asarray(img)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.moveaxis(img, -1, 1).copy())).numpy()
    assert ours.shape == ref.shape == (1, 257)
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


def _extract_preprocess_fns():
    tree = ast.parse(open(PREPROCESS).read())
    keep = [n for n in tree.body if isinstance(n, ast.FunctionDef)
            and n.name in ("POS", "extract_5p", "align_img",
                           "resize_n_crop_img")]
    from PIL import Image
    ns = {"np": np, "Image": Image}
    exec(compile(ast.Module(body=keep, type_ignores=[]), PREPROCESS, "exec"),
         ns)
    return ns


def test_align_golden():
    # reference align_img's final np.array([...]) is inhomogeneous and
    # crashes on numpy>=1.24, so compare through its two real pieces
    # (POS + resize_n_crop_img) instead
    from PIL import Image
    ns = _extract_preprocess_fns()
    rng = np.random.RandomState(1)
    img = Image.fromarray((rng.rand(300, 280, 3) * 255).astype(np.uint8))
    lm = (rng.rand(68, 2) * [[260, 280]] + 10).astype(np.float32)
    lm3d = rng.randn(5, 3).astype(np.float32)

    lm5p = ns["extract_5p"](lm)
    ref_t, ref_s = ns["POS"](lm5p.copy().transpose(), lm3d.copy().transpose())
    ref_s = 102.0 / ref_s
    ref_img, ref_lm, _, ref_left, ref_up, _ = ns["resize_n_crop_img"](
        img, lm.copy(), ref_t, ref_s)

    tp, img224, lm_new = ff.align_img(img, lm.copy(), lm3d)
    vals = [float(np.asarray(x).reshape(-1)[0]) for x in tp]
    assert vals[0] == 280 and vals[1] == 300
    np.testing.assert_allclose(vals[2], float(ref_s), rtol=1e-6)
    np.testing.assert_allclose(vals[3], float(ref_t[0]), rtol=1e-6)
    np.testing.assert_allclose(vals[4], float(ref_t[1]), rtol=1e-6)
    assert vals[5] == float(ref_left) and vals[6] == float(ref_up)
    np.testing.assert_array_equal(np.asarray(img224), np.asarray(ref_img))
    np.testing.assert_allclose(lm_new, ref_lm, rtol=1e-5, atol=1e-4)


def test_extract_5p_golden():
    ns = _extract_preprocess_fns()
    lm = np.random.RandomState(2).rand(68, 2).astype(np.float32)
    np.testing.assert_allclose(ff.extract_5p(lm), ns["extract_5p"](lm))


def test_fit_image_contract():
    from PIL import Image
    rng = np.random.RandomState(3)
    img = Image.fromarray((rng.rand(256, 256, 3) * 255).astype(np.uint8))
    lm = (rng.rand(68, 2) * 200 + 20).astype(np.float32)
    lm3d = rng.randn(5, 3).astype(np.float32)
    net = ff.ReconNet(layers=(1, 1, 1, 1), width=8)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    full, coeff, tp = ff.fit_image(net, params, img, lm, lm3d)
    assert full.shape == (1, 257) and coeff.shape == (1, 76)
    assert tp.shape == (8,)
    np.testing.assert_allclose(coeff[0, :64], full[0, 80:144], atol=0)
    np.testing.assert_allclose(coeff[0, 64:67], full[0, 224:227], atol=0)
