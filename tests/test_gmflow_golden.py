"""Golden parity: JAX GMFlow vs reference torch UniMatch (random weights).

feature_channels must stay 128 (the reference hardcodes refine_proj's input,
reg_refine.py / unimatch.py:57), so parity runs at reduced spatial size and
depth instead."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/Training/train_utils/unimatch"

H, W = 64, 96
LAYERS = 2
REFINE = 2


@pytest.fixture(scope="module")
def ref_unimatch():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    try:
        from unimatch.unimatch import UniMatch  # noqa
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference unimatch import failed: {e}")
    finally:
        sys.path.remove(REF)
    torch.manual_seed(0)
    model = UniMatch(feature_channels=128, num_scales=2, upsample_factor=4,
                     num_head=1, ffn_dim_expansion=4,
                     num_transformer_layers=LAYERS, reg_refine=True,
                     task="flow").eval()
    return model


def test_gmflow_matches_reference(ref_unimatch):
    import torch
    from mofa_tpu.models.gmflow.model import GMFlow, GMFlowConfig
    from mofa_tpu.models.weights import convert_gmflow_state_dict

    cfg = GMFlowConfig(num_transformer_layers=LAYERS, num_reg_refine=REFINE)
    model = GMFlow(cfg)

    rng = np.random.RandomState(0)
    img0 = rng.rand(1, H, W, 3).astype(np.float32) * 255.0
    img1 = np.clip(img0 + rng.randn(1, H, W, 3).astype(np.float32) * 8, 0, 255)

    params = jax.jit(lambda k: model.init(k, jnp.asarray(img0),
                                          jnp.asarray(img1)))(jax.random.PRNGKey(0))
    sd = {k: v.detach().numpy() for k, v in ref_unimatch.state_dict().items()}
    params = convert_gmflow_state_dict(params, sd)

    with torch.no_grad():
        out_ref = ref_unimatch(
            torch.from_numpy(np.moveaxis(img0, -1, 1).copy()),
            torch.from_numpy(np.moveaxis(img1, -1, 1).copy()),
            attn_type="swin", attn_splits_list=[2, 8],
            corr_radius_list=[-1, 4], prop_radius_list=[-1, 1],
            num_reg_refine=REFINE, task="flow",
        )["flow_preds"][-1]
    ref = np.moveaxis(out_ref.numpy(), 1, -1)

    got = np.asarray(model.apply(params, jnp.asarray(img0), jnp.asarray(img1)))
    assert got.shape == ref.shape == (1, H, W, 2)
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=1e-3)


def test_get_optical_flows_batched(ref_unimatch):
    """Batched pair driver: shapes + finite + frame0 anchoring."""
    from mofa_tpu.models.gmflow.model import (
        GMFlow, GMFlowConfig, get_optical_flows)
    from mofa_tpu.models.weights import convert_gmflow_state_dict

    cfg = GMFlowConfig(num_transformer_layers=LAYERS, num_reg_refine=REFINE)
    model = GMFlow(cfg)
    rng = np.random.RandomState(1)
    video = rng.rand(1, 3, 48, 64, 3).astype(np.float32)

    params = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3))))(jax.random.PRNGKey(0))
    sd = {k: v.detach().numpy() for k, v in ref_unimatch.state_dict().items()}
    params = convert_gmflow_state_dict(params, sd)

    flows = get_optical_flows(model, params, jnp.asarray(video),
                              inference_size=(H, W))
    f = np.asarray(flows)
    assert f.shape == (1, 2, 48, 64, 2)
    assert np.all(np.isfinite(f))


def test_teacher_bf16_epe_bound(ref_unimatch):
    """bf16-teacher numerics (bench_train --teacher_bf16 / the
    Stage2InputPipeline teacher_dtype lever): end-point error of the
    bf16-weights flow vs the fp32 flow on the SAME converted weights and
    inputs stays well under a pixel — the stage-2 sparse sampling
    quantizes harder than that. Documents the A/B the speed lever rests
    on (VERDICT r04 task 4)."""
    from mofa_tpu.models.gmflow.model import GMFlow, GMFlowConfig
    from mofa_tpu.models.weights import convert_gmflow_state_dict

    cfg = GMFlowConfig(num_transformer_layers=LAYERS, num_reg_refine=REFINE)
    model = GMFlow(cfg)
    rng = np.random.RandomState(2)
    img0 = rng.rand(1, H, W, 3).astype(np.float32) * 255.0
    img1 = np.clip(img0 + rng.randn(1, H, W, 3).astype(np.float32) * 8,
                   0, 255)
    params = jax.jit(lambda k: model.init(k, jnp.asarray(img0),
                                          jnp.asarray(img1)))(
        jax.random.PRNGKey(0))
    sd = {k: v.detach().numpy() for k, v in ref_unimatch.state_dict().items()}
    params = convert_gmflow_state_dict(params, sd)

    f32 = np.asarray(model.apply(params, jnp.asarray(img0),
                                 jnp.asarray(img1)))
    p16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    f16 = np.asarray(model.apply(
        p16, jnp.asarray(img0, jnp.bfloat16),
        jnp.asarray(img1, jnp.bfloat16)).astype(jnp.float32))

    epe = np.sqrt(((f16 - f32) ** 2).sum(-1))
    assert np.isfinite(f16).all()
    assert epe.mean() < 0.5, f"mean EPE {epe.mean():.3f}"
    assert np.percentile(epe, 99) < 2.0, f"p99 EPE {np.percentile(epe, 99):.3f}"
