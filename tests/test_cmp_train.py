"""CMP training components: loss parity (vs torch CE), warps, LR schedule,
one train step. The reference losses/warp are .cuda()-bound, so parity uses
faithful CPU re-executions of the same math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mofa_tpu.models.cmp.train import (
    discrete_flow_loss, kld_loss, warp_backward, warp_forward_sorted,
    step_lr_schedule, make_cmp_optimizer, make_cmp_train_step)


def test_discrete_loss_matches_torch_ce():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    nbins, fmax = 99, 50.0
    logits = rng.randn(2, 8, 8, 2 * nbins).astype(np.float32)
    target = (rng.randn(2, 8, 8, 2) * 30).astype(np.float32)
    target[0, 0, 0] = 70.0  # exercises the >=99 clamp patch

    got = float(discrete_flow_loss(jnp.asarray(logits), jnp.asarray(target),
                                   nbins, fmax))

    # reference math on CPU (losses.py:77-93 with cuda cast removed)
    step = 2 * fmax / nbins
    t = np.clip(target, -fmax + 1e-3, fmax - 1e-3)
    bins = np.floor((t + fmax) / step).astype(np.int64)
    bins[bins >= 99] = 98
    lg = torch.from_numpy(np.moveaxis(logits, -1, 1))
    tb = torch.from_numpy(np.moveaxis(bins, -1, 1))
    ce = torch.nn.CrossEntropyLoss()
    want = float(ce(lg[:, :nbins], tb[:, 0]) + ce(lg[:, nbins:], tb[:, 1]))
    assert abs(got - want) < 1e-5


def test_kld():
    rng = np.random.RandomState(1)
    m = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    lv = jnp.asarray(rng.randn(4, 8).astype(np.float32) * 0.1)
    got = float(kld_loss(m, lv))
    want = float(np.sum(-0.5 * (1 + np.asarray(lv) - np.asarray(m) ** 2
                                - np.exp(np.asarray(lv)))))
    assert abs(got - want) < 1e-4


def test_warp_backward_matches_torch_grid_sample():
    """Reference builds an align_corners=True grid but samples with
    grid_sample's align_corners=False default (warp.py:10-25) — replicate
    exactly against torch."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    img = rng.rand(1, 9, 11, 3).astype(np.float32)
    flow = rng.randn(1, 9, 11, 2).astype(np.float32) * 2

    out = np.asarray(warp_backward(jnp.asarray(img), jnp.asarray(flow)))

    timg = torch.from_numpy(np.moveaxis(img, -1, 1).copy())
    tflow = torch.from_numpy(np.moveaxis(flow, -1, 1).copy())
    grip = torch.zeros_like(tflow)
    grip[:, 0] = tflow[:, 0] / ((11 - 1.0) / 2.0)
    grip[:, 1] = tflow[:, 1] / ((9 - 1.0) / 2.0)
    gx = torch.linspace(-1, 1, 11).view(1, 1, 1, 11).expand(1, 1, 9, 11)
    gy = torch.linspace(-1, 1, 9).view(1, 1, 9, 1).expand(1, 1, 9, 11)
    grid = (torch.cat([gx, gy], 1) + grip).permute(0, 2, 3, 1)
    ref = torch.nn.functional.grid_sample(timg, grid)
    np.testing.assert_allclose(out, np.moveaxis(ref.numpy(), 1, -1),
                               atol=2e-6)


def test_warp_forward_largest_magnitude_wins():
    """Two sources collide: the one with larger |flow| must win (the
    reference writes ascending-sorted so the largest lands last)."""
    img = np.zeros((1, 4, 4, 3), np.float32)
    img[0, 0, 0] = 1.0   # will move by (1, 0) -> (0, 1): |v|=1
    img[0, 0, 3] = 2.0   # will move by (-2, 0) -> (0, 1): |v|=4  (winner)
    flow = np.zeros((1, 4, 4, 2), np.float32)
    flow[0, 0, 0, 0] = 1.0
    flow[0, 0, 3, 0] = -2.0
    out, mask = warp_forward_sorted(jnp.asarray(img), jnp.asarray(flow),
                                    ret_mask=True)
    out = np.asarray(out)
    mask = np.asarray(mask)
    assert out[0, 0, 1, 0] == 2.0          # larger magnitude won
    assert mask[0, 0, 1, 0] == 0.0
    # vacated source pixels become holes; zero-flow pixels cover themselves
    assert mask[0, 0, 0, 0] == 1.0 and mask[0, 0, 3, 0] == 1.0
    assert mask[0, 2, 2, 0] == 0.0


def test_step_lr_schedule_shipped_config():
    sched = step_lr_schedule(0.04, (24000, 36000), (0.1, 0.1))
    assert float(sched(0)) == pytest.approx(0.04)
    assert float(sched(23999)) == pytest.approx(0.04)
    assert float(sched(24000)) == pytest.approx(0.004)
    assert float(sched(36000)) == pytest.approx(0.0004)


def test_step_lr_schedule_warmup():
    sched = step_lr_schedule(0.1, (100,), (0.1,), warmup_lr=(0.4,),
                             warmup_steps=(10,))
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(5)) == pytest.approx(0.25, abs=1e-6)
    assert float(sched(10)) == pytest.approx(0.4)


def test_cmp_train_step_runs():
    from mofa_tpu.models.cmp.model import CMP
    cmp = CMP()
    size = 64
    params = jax.jit(lambda k: cmp.init(
        k, jnp.zeros((1, size, size, 3)), jnp.zeros((1, size, size, 2)),
        jnp.zeros((1, size, size, 2))))(jax.random.PRNGKey(0))
    tx = make_cmp_optimizer()
    opt_state = tx.init(params)
    step = jax.jit(make_cmp_train_step(cmp, tx))
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(1, size, size, 3).astype(np.float32)),
        "sparse": jnp.asarray(rng.randn(1, size, size, 2).astype(np.float32)),
        "mask": jnp.asarray((rng.rand(1, size, size, 2) > 0.9).astype(np.float32)),
        "target_flow": jnp.asarray(rng.randn(1, size, size, 2).astype(np.float32) * 10),
    }
    new_params, opt_state, metrics = step(params, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    changed = jax.tree_util.tree_map(
        lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
        params, new_params)
    assert any(jax.tree_util.tree_leaves(changed))


def test_train_cmp_cli(tmp_path):
    """Drive apps/train_cmp_app end-to-end on synthetic (image, flow)."""
    from PIL import Image
    from mofa_tpu.apps.train_cmp_app import main
    from mofa_tpu.ops.flow_viz import write_flo

    rng = np.random.RandomState(5)
    data = tmp_path / "data"
    data.mkdir()
    for name in ("a", "b"):
        for tag in ("img1", "img2"):
            Image.fromarray(
                rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
                data / f"{name}_{tag}.png")
        write_flo(rng.randn(64, 64, 2).astype(np.float32) * 4,
                  str(data / f"{name}_flow.flo"))

    out = tmp_path / "out"
    main(["--data_dir", str(data), "--output_dir", str(out), "--tiny",
          "--num_steps", "2", "--batch_size", "2", "--crop_size", "64",
          "--save_every", "2", "--log_every", "1"])
    assert len(list(out.glob("cmp_*.npz"))) == 1
