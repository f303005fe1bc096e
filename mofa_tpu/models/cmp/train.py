"""CMP training components: losses, warps, LR schedule, train step.

Re-derivations of /root/reference/MOFA-Video-Traj/models/cmp/losses.py,
models/modules/warp.py and utils/scheduler.py as pure-jnp functions, plus a
mesh-shardable train step replacing SingleStageModel/DistModule
(models/cmp/single_stage_model.py:10-72; hand-rolled NCCL allreduce in
utils/distributed_utils.py:23-27 becomes GSPMD-inserted gradient psum).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax


# ------------------------------------------------------------------ losses

def discrete_flow_loss(logits: jnp.ndarray, target_flow: jnp.ndarray,
                       nbins: int = 99, fmax: float = 50.0) -> jnp.ndarray:
    """DiscreteLoss (losses.py:69-93): quantize flow into nbins/axis,
    cross-entropy per axis (summed), incl. the `target[target>=99]=98`
    clamp patch. logits [N, h, w, 2*nbins] (resized to target res if needed);
    target_flow [N, H, W, 2]."""
    assert nbins % 2 == 1
    step = 2 * fmax / float(nbins)
    if logits.shape[1:3] != target_flow.shape[1:3]:
        from mofa_tpu.ops.resize import resize_nhwc
        logits = resize_nhwc(logits, target_flow.shape[1:3], "bilinear",
                             align_corners=True)
    t = jnp.clip(target_flow, -fmax + 1e-3, fmax - 1e-3)
    bins = jnp.floor((t + fmax) / step).astype(jnp.int32)
    bins = jnp.where(bins >= nbins, nbins - 1, bins)   # losses.py:92 patch

    def ce(lg, tb):
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        picked = jnp.take_along_axis(logp, tb[..., None], axis=-1)[..., 0]
        return -jnp.mean(picked)

    return ce(logits[..., :nbins], bins[..., 0]) + \
        ce(logits[..., nbins:], bins[..., 1])


def multi_discrete_flow_loss(logits, target_flow, nbins=19, fmax=47.5,
                             xy_weight=(1.0, 1.0),
                             quantize_strategy: str = "linear"):
    """MultiDiscreteLoss (losses.py:95-...): linear or quadratic binning."""
    assert nbins % 2 == 1
    step = 2 * fmax / float(nbins)
    t = jnp.clip(target_flow, -fmax + 1e-3, fmax - 1e-3)
    if quantize_strategy == "linear":
        bins = jnp.floor((t + fmax) / step)
    elif quantize_strategy == "quadratic":
        pos = t > 0
        bins = jnp.where(
            pos, jnp.floor(nbins * jnp.sqrt(jnp.abs(t) / (4 * fmax)) + nbins / 2.0),
            jnp.floor(-nbins * jnp.sqrt(jnp.abs(t) / (4 * fmax)) + nbins / 2.0))
    else:
        raise ValueError(quantize_strategy)
    bins = bins.astype(jnp.int32)

    def ce(lg, tb):
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, tb[..., None], -1)[..., 0])

    wx, wy = xy_weight
    return wx * ce(logits[..., :nbins], bins[..., 0]) + \
        wy * ce(logits[..., nbins:], bins[..., 1])


def kld_loss(mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """KLD (losses.py:66-67)."""
    return -0.5 * jnp.sum(1 + logvar - mean ** 2 - jnp.exp(logvar))


def _sobel_edge_map(x: jnp.ndarray) -> jnp.ndarray:
    """EdgeAwareLoss.get_edge (losses.py:45-52): per-channel Sobel gx/gy
    (depthwise conv, pad 1), magnitude sqrt(gx^2+gy^2+1e-5), mean over
    channels. x [N, H, W, C] -> [N, H, W, 1]."""
    kx = jnp.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], jnp.float32)
    ky = jnp.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], jnp.float32)
    c = x.shape[-1]

    def depthwise(k):
        kern = jnp.broadcast_to(k[:, :, None, None], (3, 3, 1, c))
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kern, window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    mag = jnp.sqrt(depthwise(kx) ** 2 + depthwise(ky) ** 2 + 1e-5)
    return jnp.mean(mag, axis=-1, keepdims=True)


def edge_aware_loss(pred_flow: jnp.ndarray, target_flow: jnp.ndarray) -> jnp.ndarray:
    """EdgeAwareLoss L1 (losses.py:24-64): smooth-L1 between Sobel edge
    magnitudes of prediction (bilinear align_corners resized to target res)
    and target. pred/target [N, H, W, 2]."""
    if pred_flow.shape[1:3] != target_flow.shape[1:3]:
        from mofa_tpu.ops.resize import resize_nhwc
        pred_flow = resize_nhwc(pred_flow, target_flow.shape[1:3], "bilinear",
                                align_corners=True)
    pe = _sobel_edge_map(pred_flow)
    te = _sobel_edge_map(target_flow)
    return jnp.mean(optax.huber_loss(pe, te, delta=1.0))


# ------------------------------------------------------------------ warps

def grid_sample_norm(image: jnp.ndarray, grid: jnp.ndarray,
                     align_corners: bool = False) -> jnp.ndarray:
    """torch.grid_sample on normalized [-1,1] coords, zeros padding, NHWC.

    image [B, H, W, C]; grid [B, H', W', 2] (x, y)."""
    b, h, w, c = image.shape
    if align_corners:
        px = (grid[..., 0] + 1) * (w - 1) / 2
        py = (grid[..., 1] + 1) * (h - 1) / 2
    else:
        px = ((grid[..., 0] + 1) * w - 1) / 2
        py = ((grid[..., 1] + 1) * h - 1) / 2
    from mofa_tpu.models.gmflow.model import bilinear_sample
    return bilinear_sample(image, jnp.stack([px, py], axis=-1))


def warp_backward(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """WarpingLayerBWFlow (warp.py:4-25): align_corners=True grid built,
    sampled with grid_sample's default align_corners=False — preserved."""
    b, h, w, _ = image.shape
    gx = jnp.linspace(-1.0, 1.0, w)
    gy = jnp.linspace(-1.0, 1.0, h)
    base = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)[None]
    norm = jnp.stack([flow[..., 0] / ((w - 1.0) / 2.0),
                      flow[..., 1] / ((h - 1.0) / 2.0)], axis=-1)
    return grid_sample_norm(image, base + norm, align_corners=False)


def warp_forward_sorted(image: jnp.ndarray, flow: jnp.ndarray,
                        ret_mask: bool = False):
    """WarpingLayerFWFlow (warp.py:28-68): forward-scatter where collisions
    are won by the source with the LARGEST flow magnitude. The reference
    sorts ascending and lets later writes win (CUDA scatter order); here the
    winner is selected deterministically with a segment-max over magnitude
    ranks — same semantics, no ordering assumption."""
    b, h, w, c = image.shape
    n = h * w
    xs = jnp.tile(jnp.arange(w), (h,))            # flattened col ids
    ys = jnp.repeat(jnp.arange(h), w)
    fx = flow[..., 0].reshape(b, n).astype(jnp.int32)
    fy = flow[..., 1].reshape(b, n).astype(jnp.int32)
    tx = jnp.clip(xs[None] + fx, 0, w - 1)
    ty = jnp.clip(ys[None] + fy, 0, h - 1)
    tgt = ty * w + tx                              # [B, N]

    v = (flow[..., 0] ** 2 + flow[..., 1] ** 2).reshape(b, n)
    order = jnp.argsort(v, axis=1)                 # ascending
    rank = jnp.zeros((b, n), jnp.int32)
    rank = jnp.take_along_axis(
        jnp.broadcast_to(jnp.arange(n)[None], (b, n)), jnp.argsort(order, 1), 1)

    def per_sample(tgt_i, rank_i, img_i):
        win = jnp.full((n,), -1, jnp.int32).at[tgt_i].max(rank_i)
        keep = rank_i == win[tgt_i]
        out = jnp.zeros((n, c), img_i.dtype)
        src = jnp.where(keep[:, None], img_i.reshape(n, c), 0.0)
        idx = jnp.where(keep, tgt_i, n)            # dump losers out of range
        out = jnp.zeros((n + 1, c), img_i.dtype).at[idx].add(src)[:n]
        hole = jnp.ones((n,), img_i.dtype).at[tgt_i].set(0.0)
        return out.reshape(h, w, c), hole.reshape(h, w, 1)

    warped, holes = jax.vmap(per_sample)(tgt, rank, image)
    if ret_mask:
        return warped, holes
    return warped


# ------------------------------------------------------------------ schedule

def step_lr_schedule(base_lr: float, milestones: Sequence[int],
                     lr_mults: Sequence[float],
                     warmup_lr: Sequence[float] = (),
                     warmup_steps: Sequence[int] = ()):
    """StepLRScheduler (utils/scheduler.py:77-102) as an optax schedule fn:
    piecewise-linear multi-segment warmup, then multiplicative milestones."""
    assert len(milestones) == len(lr_mults)
    cum = [1.0]
    for m in lr_mults:
        cum.append(cum[-1] * m)

    def schedule(step):
        bounds = jnp.asarray(milestones)
        scales = jnp.asarray(cum)
        pos = jnp.searchsorted(bounds, step, side="right")
        scale = scales[pos]
        if warmup_lr:
            scale = warmup_lr[-1] * scale / base_lr
        lr = base_lr * scale

        if warmup_steps:
            xi = jnp.asarray([0] + list(warmup_steps), jnp.float32)
            li = jnp.asarray([base_lr] + list(warmup_lr), jnp.float32)
            warm = jnp.interp(jnp.asarray(step, jnp.float32), xi, li)
            lr = jnp.where(step < warmup_steps[-1], warm, lr)
        return lr

    return schedule


def make_cmp_optimizer(base_lr: float = 0.04, momentum: float = 0.9,
                       weight_decay: float = 1e-4,
                       milestones: Sequence[int] = (24000, 36000),
                       lr_mults: Sequence[float] = (0.1, 0.1)):
    """SGD + StepLR, the shipped CMP config
    (experiments/semiauto_annot/resnet50_vip+mpii_liteflow/config.yaml)."""
    sched = step_lr_schedule(base_lr, milestones, lr_mults)
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=sched, momentum=momentum),
    )


def make_cmp_train_step(cmp_module, tx, nbins: int = 99, fmax: float = 50.0):
    """(params, opt_state, batch, ) -> (params, opt_state, metrics).

    batch: image [N,H,W,3] in (-1,1); sparse/mask [N,H,W,2];
    target_flow [N,H,W,2]. Gradient psum over any mesh is GSPMD-inserted."""

    def loss_fn(params, batch):
        logits = cmp_module.apply(params, batch["image"], batch["sparse"],
                                  batch["mask"],
                                  method=type(cmp_module).logits)
        loss = discrete_flow_loss(logits, batch["target_flow"], nbins, fmax)
        return loss

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss}

    return train_step
