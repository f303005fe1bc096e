"""Architecture-level goldens for the diffusion core.

Compares the Flax SVD UNet / FlowControlNet / denoise step against an
independent torch transcription (tests/torch_ref/svd_torch.py) with random
weights routed through the REAL weight converters
(models/weights.py::convert_torch_state_dict / convert_flow_controlnet_
state_dict) — the same path actual checkpoints take. diffusers 0.24 is not
installed in this image, so two independent transcriptions agreeing is the
strongest wiring-parity evidence obtainable (VERDICT round-1 item 2).

Covers:
- full UNet forward incl. the in-loop residual re-add quirk
  (unet_spatio_temporal_condition_controlnet.py:451-459), B=2 so the
  diffusers-0.24 HW-major time_context quirk is exercised
- full FlowControlNet forward incl. softsplat warping and the
  trunk-head-count quirk (controlnet heads != unet heads)
- one full CFG denoise step (scale_model_input -> adapter -> UNet -> CFG
  combine -> Euler step), mirroring pipeline.py:446-511
- `_resize_with_antialiasing` AST-extracted from the reference
  (pipeline.py:532-640) vs ops/resize.resize_antialias_hw
"""

import ast

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from mofa_tpu.models.svd_unet import (
    SVDUNetConfig, TINY_UNET_CONFIG, MICRO_UNET_CONFIG,
    UNetSpatioTemporalConditionModel,
)
from mofa_tpu.models.mofa_adapter import FlowControlNet
from mofa_tpu.models.weights import (
    convert_torch_state_dict, convert_flow_controlnet_state_dict,
)
from tests.torch_ref.svd_torch import (
    UNetSpatioTemporalConditionControlNetModelTorch, FlowControlNetTorch,
)

PIPELINE_REF = "/root/reference/MOFA-Video-Traj/pipeline/pipeline.py"


def _to_bthwc(x):
    return np.moveaxis(x.detach().numpy(), 2, -1)


def _residual_shapes(cfg: SVDUNetConfig, h8: int, w8: int):
    """Shapes of the 12 down residuals + mid residual ([BT, h, w, c])."""
    shapes = [(cfg.block_out_channels[0], h8, w8)]
    h, w = h8, w8
    for i, ch in enumerate(cfg.block_out_channels):
        for _ in range(cfg.layers_per_block):
            shapes.append((ch, h, w))
        if i != len(cfg.block_out_channels) - 1:
            h, w = (h + 1) // 2, (w + 1) // 2
            shapes.append((ch, h, w))
    mid = (cfg.block_out_channels[-1], h, w)
    return shapes, mid


def _make_unet_inputs(cfg, b, t, h8, w8, seed=0):
    rng = np.random.RandomState(seed)
    sample = rng.randn(b, t, h8, w8, cfg.in_channels).astype(np.float32)
    ehs = rng.randn(b, 1, cfg.cross_attention_dim).astype(np.float32)
    ids = np.tile(np.asarray([[6.0, 127.0, 0.02]], np.float32), (b, 1))
    shapes, mid_shape = _residual_shapes(cfg, h8, w8)
    res = [0.1 * rng.randn(b * t, hh, ww, c).astype(np.float32)
           for (c, hh, ww) in shapes]
    mid = 0.1 * rng.randn(b * t, mid_shape[1], mid_shape[2],
                          mid_shape[0]).astype(np.float32)
    return sample, ehs, ids, res, mid


@pytest.mark.parametrize("cfg", [TINY_UNET_CONFIG], ids=["tiny"])
def test_unet_full_golden(cfg):
    torch.manual_seed(0)
    b, t, h8, w8 = 2, 3, 8, 8
    sample, ehs, ids, res, mid = _make_unet_inputs(cfg, b, t, h8, w8)

    tm = UNetSpatioTemporalConditionControlNetModelTorch(cfg).eval()
    m = UNetSpatioTemporalConditionModel(cfg)  # residual_readd_quirk default on
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(sample), 1.0,
                    jnp.asarray(ehs), jnp.asarray(ids))
    params = convert_torch_state_dict(params, tm.state_dict())

    timestep = 0.7312
    got = np.asarray(m.apply(
        params, jnp.asarray(sample), timestep, jnp.asarray(ehs),
        jnp.asarray(ids),
        down_block_additional_residuals=[jnp.asarray(r) for r in res],
        mid_block_additional_residual=jnp.asarray(mid)))

    with torch.no_grad():
        ref = tm(torch.from_numpy(np.moveaxis(sample, -1, 2).copy()),
                 timestep, torch.from_numpy(ehs), torch.from_numpy(ids),
                 [torch.from_numpy(np.moveaxis(r, -1, 1).copy()) for r in res],
                 torch.from_numpy(np.moveaxis(mid, -1, 1).copy()))
    ref = _to_bthwc(ref)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=5e-4)


def test_unet_golden_without_residuals():
    """Pure frozen-UNet path (no ControlNet residuals)."""
    cfg = MICRO_UNET_CONFIG
    torch.manual_seed(1)
    b, t, h8, w8 = 2, 2, 8, 8
    sample, ehs, ids, _, _ = _make_unet_inputs(cfg, b, t, h8, w8, seed=3)

    tm = UNetSpatioTemporalConditionControlNetModelTorch(cfg).eval()
    m = UNetSpatioTemporalConditionModel(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(sample), 1.0,
                    jnp.asarray(ehs), jnp.asarray(ids))
    params = convert_torch_state_dict(params, tm.state_dict())
    got = np.asarray(m.apply(params, jnp.asarray(sample), 42.0,
                             jnp.asarray(ehs), jnp.asarray(ids)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.moveaxis(sample, -1, 2).copy()),
                 42.0, torch.from_numpy(ehs), torch.from_numpy(ids))
    np.testing.assert_allclose(got, _to_bthwc(ref), rtol=2e-3, atol=5e-4)


def _make_cn_inputs(cfg, b, t, hpix, seed=7):
    rng = np.random.RandomState(seed)
    h8 = hpix // 8
    sample = rng.randn(b, t, h8, h8, cfg.in_channels).astype(np.float32)
    ehs = rng.randn(b, 1, cfg.cross_attention_dim).astype(np.float32)
    ids = np.tile(np.asarray([[6.0, 127.0, 0.02]], np.float32), (b, 1))
    cond = rng.randn(b, hpix, hpix, 3).astype(np.float32)
    flow = (rng.rand(b, t - 1, hpix, hpix, 2).astype(np.float32) * 6 - 3)
    return sample, ehs, ids, cond, flow


def test_flow_controlnet_full_golden():
    cfg = TINY_UNET_CONFIG
    torch.manual_seed(2)
    b, t, hpix = 2, 3, 64
    sample, ehs, ids, cond, flow = _make_cn_inputs(cfg, b, t, hpix)

    tm = FlowControlNetTorch(cfg).eval()
    m = FlowControlNet(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(sample), 1.0,
                    jnp.asarray(ehs), jnp.asarray(ids),
                    controlnet_cond=jnp.asarray(cond),
                    controlnet_flow=jnp.asarray(flow))
    params = convert_flow_controlnet_state_dict(params, tm.state_dict())

    got_down, got_mid = m.apply(
        params, jnp.asarray(sample), 5.25, jnp.asarray(ehs),
        jnp.asarray(ids), controlnet_cond=jnp.asarray(cond),
        controlnet_flow=jnp.asarray(flow), conditioning_scale=0.8)

    with torch.no_grad():
        ref_down, ref_mid = tm(
            torch.from_numpy(np.moveaxis(sample, -1, 2).copy()), 5.25,
            torch.from_numpy(ehs), torch.from_numpy(ids),
            torch.from_numpy(np.moveaxis(cond, -1, 1).copy()),
            torch.from_numpy(np.moveaxis(flow, -1, 2).copy()),
            conditioning_scale=0.8)

    assert len(got_down) == len(ref_down) == 12
    for g, r in zip(got_down, ref_down):
        np.testing.assert_allclose(
            np.asarray(g), np.moveaxis(r.numpy(), 1, -1),
            rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(got_mid), np.moveaxis(ref_mid.numpy(), 1, -1),
        rtol=2e-3, atol=5e-4)


def test_denoise_step_golden():
    """One full CFG denoise step, both stacks end-to-end
    (pipeline.py:446-511 semantics: scale input, channel-concat image
    latents, adapter residuals, UNet, per-frame linspace CFG, Euler)."""
    from mofa_tpu.ops.euler import (make_euler_schedule, scale_model_input,
                                    euler_step)

    cfg = MICRO_UNET_CONFIG
    torch.manual_seed(3)
    b, t, hpix = 1, 2, 64
    h8 = hpix // 8
    rng = np.random.RandomState(11)
    latents = rng.randn(b, t, h8, h8, 4).astype(np.float32)
    image_latents = rng.randn(2 * b, t, h8, h8, 4).astype(np.float32)
    ehs = rng.randn(2 * b, 1, cfg.cross_attention_dim).astype(np.float32)
    ids = np.tile(np.asarray([[6.0, 127.0, 0.02]], np.float32), (2 * b, 1))
    cond = rng.randn(2 * b, hpix, hpix, 3).astype(np.float32)
    flow = (rng.rand(2 * b, t - 1, hpix, hpix, 2).astype(np.float32) * 4 - 2)
    guidance = np.linspace(1.0, 3.0, t).astype(np.float32)

    tm_cn = FlowControlNetTorch(cfg).eval()
    tm_unet = UNetSpatioTemporalConditionControlNetModelTorch(cfg).eval()
    cn = FlowControlNet(cfg)
    unet = UNetSpatioTemporalConditionModel(cfg)

    sample0 = np.concatenate(
        [np.concatenate([latents] * 2, 0), image_latents], -1)
    cn_params = cn.init(jax.random.PRNGKey(0), jnp.asarray(sample0), 1.0,
                        jnp.asarray(ehs), jnp.asarray(ids),
                        controlnet_cond=jnp.asarray(cond),
                        controlnet_flow=jnp.asarray(flow))
    unet_params = unet.init(jax.random.PRNGKey(1), jnp.asarray(sample0), 1.0,
                            jnp.asarray(ehs), jnp.asarray(ids))
    cn_params = convert_flow_controlnet_state_dict(cn_params,
                                                   tm_cn.state_dict())
    unet_params = convert_torch_state_dict(unet_params, tm_unet.state_dict())

    sched = make_euler_schedule(4)
    sigma, sigma_next = float(sched.sigmas[1]), float(sched.sigmas[2])
    ts = float(sched.timesteps[1])

    # ---- flax step
    lat_in = jnp.concatenate([jnp.asarray(latents)] * 2, axis=0)
    lat_in = scale_model_input(lat_in, sigma)
    lat_in = jnp.concatenate([lat_in, jnp.asarray(image_latents)], axis=-1)
    down, mid = cn.apply(cn_params, lat_in, ts, jnp.asarray(ehs),
                         jnp.asarray(ids), controlnet_cond=jnp.asarray(cond),
                         controlnet_flow=jnp.asarray(flow))
    pred = unet.apply(unet_params, lat_in, ts, jnp.asarray(ehs),
                      jnp.asarray(ids),
                      down_block_additional_residuals=down,
                      mid_block_additional_residual=mid)
    unc, cnd = jnp.split(pred, 2, axis=0)
    g = jnp.asarray(guidance)[None, :, None, None, None]
    pred = unc + g * (cnd - unc)
    new_lat, _ = euler_step(pred, jnp.asarray(latents), sigma, sigma_next)
    got = np.asarray(new_lat)

    # ---- torch step (same euler constants; ops/euler is itself
    # golden-tested vs the reference scheduler in test_euler.py)
    with torch.no_grad():
        tl = torch.from_numpy(np.moveaxis(latents, -1, 2).copy())
        til = torch.from_numpy(np.moveaxis(image_latents, -1, 2).copy())
        t_in = torch.cat([tl] * 2, 0) / float(np.sqrt(sigma ** 2 + 1))
        t_in = torch.cat([t_in, til], dim=2)
        tdown, tmid = tm_cn(t_in, ts, torch.from_numpy(ehs),
                            torch.from_numpy(ids),
                            torch.from_numpy(np.moveaxis(cond, -1, 1).copy()),
                            torch.from_numpy(np.moveaxis(flow, -1, 2).copy()))
        tpred = tm_unet(t_in, ts, torch.from_numpy(ehs),
                        torch.from_numpy(ids), tdown, tmid)
        tunc, tcnd = tpred.chunk(2)
        tg = torch.from_numpy(guidance)[None, :, None, None, None]
        tpred = tunc + tg * (tcnd - tunc)
        # v-prediction Euler (scheduling_euler_discrete_karras_fix.py:418)
        pred_x0 = (tpred * (-sigma / float(np.sqrt(sigma ** 2 + 1)))
                   + tl / (sigma ** 2 + 1))
        ref = tl + (tl - pred_x0) / sigma * (sigma_next - sigma)
    np.testing.assert_allclose(got, _to_bthwc(ref), rtol=2e-3, atol=1e-3)


# ---------------------------------------------------------------- antialias

def _extract_reference_resize():
    tree = ast.parse(open(PIPELINE_REF).read())
    keep = [n for n in tree.body if isinstance(n, ast.FunctionDef)
            and n.name in ("_resize_with_antialiasing", "_compute_padding",
                           "_filter2d", "_gaussian", "_gaussian_blur2d")]
    assert len(keep) == 5
    ns = {"torch": torch}
    exec(compile(ast.Module(body=keep, type_ignores=[]), PIPELINE_REF,
                 "exec"), ns)
    return ns["_resize_with_antialiasing"]


@pytest.mark.parametrize("in_hw,out_hw", [((60, 90), (32, 32)),
                                          ((128, 72), (32, 32))])
def test_resize_antialias_golden(in_hw, out_hw):
    from mofa_tpu.ops.resize import resize_antialias_hw

    ref_fn = _extract_reference_resize()
    rng = np.random.RandomState(5)
    x = rng.rand(2, 3, *in_hw).astype(np.float32)
    with torch.no_grad():
        ref = ref_fn(torch.from_numpy(x), out_hw).numpy()
    got = np.asarray(resize_antialias_hw(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
