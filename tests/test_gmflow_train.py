"""GMFlow flow training: sequence loss golden vs reference flow_loss_func,
train step decreases loss, DP-sharded step on the virtual mesh."""

import ast

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mofa_tpu.models.gmflow.model import GMFlow, TINY_GMFLOW_CONFIG
from mofa_tpu.models.gmflow.train import (flow_loss, make_flow_optimizer,
                                          make_flow_train_step)

FLOW_LOSS = ("/root/reference/Training/train_utils/unimatch/loss/"
             "flow_loss.py")


def test_flow_loss_golden():
    tree = ast.parse(open(FLOW_LOSS).read())
    keep = [n for n in tree.body if isinstance(n, ast.FunctionDef)
            and n.name == "flow_loss_func"]
    ns = {"torch": torch}
    exec(compile(ast.Module(body=keep, type_ignores=[]), FLOW_LOSS, "exec"),
         ns)

    rng = np.random.RandomState(0)
    preds = [rng.randn(2, 8, 10, 2).astype(np.float32) for _ in range(3)]
    gt = rng.randn(2, 8, 10, 2).astype(np.float32) * 3
    valid = (rng.rand(2, 8, 10) > 0.3).astype(np.float32)

    loss, metrics = flow_loss([jnp.asarray(p) for p in preds],
                              jnp.asarray(gt), jnp.asarray(valid))
    ref_loss, ref_metrics = ns["flow_loss_func"](
        [torch.from_numpy(np.moveaxis(p, -1, 1).copy()) for p in preds],
        torch.from_numpy(np.moveaxis(gt, -1, 1).copy()),
        torch.from_numpy(valid))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for k in ("epe", "1px", "3px", "5px"):
        np.testing.assert_allclose(float(metrics[k]), ref_metrics[k],
                                   rtol=1e-4, atol=1e-6)


def _tiny_batch(b=2, h=32, w=32, seed=1):
    rng = np.random.RandomState(seed)
    return {
        "img0": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        "img1": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        "flow": jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32)),
        "valid": jnp.ones((b, h, w), jnp.float32),
    }


def test_train_step_decreases_loss():
    model = GMFlow(TINY_GMFLOW_CONFIG)
    batch = _tiny_batch()
    params = model.init(jax.random.PRNGKey(0), batch["img0"], batch["img1"])
    tx = make_flow_optimizer(lr=1e-4)
    opt_state = tx.init(params)
    step = jax.jit(make_flow_train_step(model, tx))

    losses = []
    for _ in range(6):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[1:]) < losses[0]
    # return_preds returned the expected prediction count:
    # num_scales + num_reg_refine intermediates feed the sequence loss
    _, preds = model.apply(params, batch["img0"], batch["img1"],
                           return_preds=True)
    cfg = TINY_GMFLOW_CONFIG
    assert len(preds) == cfg.num_scales + cfg.num_reg_refine
    for p in preds:
        assert p.shape == batch["flow"].shape


def test_train_flow_cli(tmp_path):
    """Drive apps/train_flow_app end-to-end on synthetic triples."""
    from PIL import Image
    from mofa_tpu.apps.train_flow_app import main
    from mofa_tpu.ops.flow_viz import write_flo

    rng = np.random.RandomState(3)
    data = tmp_path / "data"
    data.mkdir()
    for name in ("a", "b"):
        for tag in ("img1", "img2"):
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
                data / f"{name}_{tag}.png")
        write_flo(rng.randn(32, 32, 2).astype(np.float32),
                  str(data / f"{name}_flow.flo"))

    out = tmp_path / "out"
    main(["--data_dir", str(data), "--output_dir", str(out), "--tiny",
          "--num_steps", "2", "--batch_size", "2", "--image_height", "32",
          "--image_width", "32", "--save_every", "2", "--log_every", "1"])
    saved = list(out.glob("gmflow_*.npz"))
    assert len(saved) == 1


def test_train_step_dp_sharded():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mofa_tpu.core.mesh import make_mesh

    if jax.device_count() < 2:
        import pytest
        pytest.skip("needs multi-device mesh")
    mesh = make_mesh(data=jax.device_count())
    model = GMFlow(TINY_GMFLOW_CONFIG)
    batch = _tiny_batch(b=2 * jax.device_count())
    params = model.init(jax.random.PRNGKey(0), batch["img0"][:1],
                        batch["img1"][:1])
    tx = make_flow_optimizer(lr=1e-3, total_steps=100)
    opt_state = tx.init(params)
    batch = {k: jax.device_put(
                 v, NamedSharding(mesh, P("data", *([None] * (v.ndim - 1)))))
             for k, v in batch.items()}
    step = jax.jit(make_flow_train_step(model, tx))
    params, opt_state, metrics = step(params, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
