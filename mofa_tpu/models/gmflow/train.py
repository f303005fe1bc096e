"""GMFlow/UniMatch flow training — the standalone trainer capability.

Reference: `Training/train_utils/unimatch/loss/flow_loss.py:4-37`
(gamma-weighted L1 sequence loss over all intermediate predictions +
EPE/px metrics) and `main_flow.py:188-470` (AdamW, OneCycleLR, DDP).
Here the distribution layer is GSPMD: batch rides the mesh "data" axis
and gradient psums are compiler-inserted, replacing
torch.nn.parallel.DistributedDataParallel (main_flow.py:188-191).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def flow_loss(flow_preds, flow_gt, valid, gamma: float = 0.9,
              max_flow: float = 400.0):
    """flow_loss.py:4-37 — preds/gt [B, H, W, 2] channel-last,
    valid [B, H, W]. Returns (loss, metrics)."""
    mag = jnp.sqrt(jnp.sum(flow_gt.astype(jnp.float32) ** 2, axis=-1))
    valid = (valid >= 0.5) & (mag < max_flow)
    vf = valid.astype(jnp.float32)[..., None]

    n = len(flow_preds)
    loss = 0.0
    for i, pred in enumerate(flow_preds):
        w = gamma ** (n - i - 1)
        loss = loss + w * jnp.mean(vf * jnp.abs(
            pred.astype(jnp.float32) - flow_gt.astype(jnp.float32)))

    epe = jnp.sqrt(jnp.sum(
        (flow_preds[-1].astype(jnp.float32) - flow_gt) ** 2, axis=-1))
    denom = jnp.maximum(vf[..., 0].sum(), 1.0)
    mean_epe = (epe * vf[..., 0]).sum() / denom
    metrics = {
        "epe": mean_epe,
        "1px": ((epe > 1) * vf[..., 0]).sum() / denom,
        "3px": ((epe > 3) * vf[..., 0]).sum() / denom,
        "5px": ((epe > 5) * vf[..., 0]).sum() / denom,
    }
    return loss, metrics


def make_flow_optimizer(lr: float = 4e-4, weight_decay: float = 1e-4,
                        total_steps: Optional[int] = None):
    """main_flow.py:209-210 AdamW (+ OneCycleLR when total_steps given,
    main_flow.py:391-396: 5% warmup, cosine anneal)."""
    if total_steps:
        sched = optax.cosine_onecycle_schedule(
            transition_steps=total_steps, peak_value=lr, pct_start=0.05)
        return optax.adamw(sched, weight_decay=weight_decay)
    return optax.adamw(lr, weight_decay=weight_decay)


def make_flow_train_step(model, tx: optax.GradientTransformation,
                         gamma: float = 0.9):
    """Returns jittable (params, opt_state, batch) -> (params, opt_state,
    metrics). batch: img0/img1 [B, H, W, 3] in [0, 255], flow [B, H, W, 2],
    valid [B, H, W]. Shard the batch over the mesh 'data' axis for DP."""

    def loss_fn(params, batch):
        _, preds = model.apply(params, batch["img0"], batch["img1"],
                               return_preds=True)
        return flow_loss(preds, batch["flow"], batch["valid"], gamma=gamma)

    def step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics, loss=loss)
        return params, opt_state, metrics

    return step
