"""Optical-flow (GMFlow/UniMatch) training CLI.

TPU re-derivation of the reference's standalone flow trainer
`Training/train_utils/unimatch/main_flow.py:188-470`: AdamW + OneCycleLR
(main_flow.py:209-210,391-396), gamma-weighted sequence loss
(loss/flow_loss.py:4-37), periodic checkpointing — with GSPMD data
parallelism over the mesh "data" axis instead of
torch.nn.parallel.DistributedDataParallel (main_flow.py:188-191).

Data discovery (shared with apps/eval_flow_app.py) handles this repo's
triples contract plus the reference's FlyingChairs / Sintel / KITTI
directory layouts — see train/flow_datasets.py.
"""

from __future__ import annotations

import argparse
import os
import time


def build_parser():
    p = argparse.ArgumentParser(description="MOFA-TPU flow training")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--layout", default="auto",
                   choices=["auto", "triples", "chairs", "sintel", "kitti"])
    p.add_argument("--output_dir", default="./runs/flow")
    p.add_argument("--resume", default=None, help=".npz params to resume")
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--gamma", type=float, default=0.9)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_steps", type=int, default=100_000)
    p.add_argument("--image_height", type=int, default=384)
    p.add_argument("--image_width", type=int, default=512)
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--seed", type=int, default=326)  # main_flow.py default
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--tiny", action="store_true")
    return p


def _load_pairs(data_dir, layout="auto"):
    from mofa_tpu.train.flow_datasets import (discover_flow_samples,
                                              load_sample)

    out = []
    for s in discover_flow_samples(data_dir, layout):
        img1, img2, flow, valid = load_sample(s)
        if flow is None:  # test-split samples carry no GT
            continue
        out.append((img1, img2, flow, valid))
    assert out, f"no ground-truth samples in {data_dir}"
    return out


def _make_batch(pairs, idx, ih, iw):
    """Resize samples to the train resolution, scaling flow per-axis
    (main_flow.py trains at a fixed crop size; we use resize + scale as
    apps/eval_flow_app.py does on the way back)."""
    import jax.numpy as jnp
    from mofa_tpu.ops.resize import resize_nhwc

    i0, i1, fl, va = [], [], [], []
    for i in idx:
        a, b, f, v = pairs[i]
        h, w = a.shape[:2]
        i0.append(resize_nhwc(jnp.asarray(a)[None], (ih, iw), "bilinear",
                              True)[0])
        i1.append(resize_nhwc(jnp.asarray(b)[None], (ih, iw), "bilinear",
                              True)[0])
        scaled = resize_nhwc(jnp.asarray(f)[None], (ih, iw), "bilinear",
                             True)[0] * jnp.asarray(
            [iw / w, ih / h], jnp.float32)
        fl.append(scaled)
        # nearest for the mask: a half-valid bilinear pixel is not valid
        va.append(resize_nhwc(jnp.asarray(v)[None, ..., None], (ih, iw),
                              "nearest")[0, ..., 0])
    return {
        "img0": jnp.stack(i0), "img1": jnp.stack(i1),
        "flow": jnp.stack(fl), "valid": jnp.stack(va),
    }


def run(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mofa_tpu.models.gmflow.model import (GMFlow, GMFlowConfig,
                                              TINY_GMFLOW_CONFIG)
    from mofa_tpu.models.gmflow.train import (flow_loss, make_flow_optimizer,
                                              make_flow_train_step)
    from mofa_tpu.train.checkpoint import export_adapter, import_adapter
    from mofa_tpu.utils.logging import get_logger

    logger = get_logger("train_flow")
    os.makedirs(args.output_dir, exist_ok=True)
    cfg = TINY_GMFLOW_CONFIG if args.tiny else GMFlowConfig()
    model = GMFlow(cfg)
    ih, iw = args.image_height, args.image_width

    pairs = _load_pairs(args.data_dir, args.layout)
    logger.info(f"{len(pairs)} training pairs from {args.data_dir}")

    params = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, ih, iw, 3)), jnp.zeros((1, ih, iw, 3))))(
        jax.random.PRNGKey(args.seed))
    if args.resume:
        params = import_adapter(params, args.resume)
        logger.info(f"resumed params from {args.resume}")

    tx = make_flow_optimizer(args.lr, args.weight_decay,
                             total_steps=args.num_steps)
    opt_state = tx.init(params)
    step_fn = jax.jit(make_flow_train_step(model, tx, gamma=args.gamma))

    sharding = None
    if args.mesh_data > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from mofa_tpu.core.mesh import make_mesh
        mesh = make_mesh(data=args.mesh_data)
        sharding = lambda v: jax.device_put(  # noqa: E731
            v, NamedSharding(mesh, P("data", *([None] * (v.ndim - 1)))))

    rng = np.random.RandomState(args.seed)
    t0 = time.time()
    for step in range(1, args.num_steps + 1):
        idx = rng.randint(0, len(pairs), size=args.batch_size)
        batch = _make_batch(pairs, idx, ih, iw)
        if sharding is not None:
            batch = {k: sharding(v) for k, v in batch.items()}
        params, opt_state, metrics = step_fn(params, opt_state, batch)
        if step % args.log_every == 0 or step == args.num_steps:
            m = {k: float(v) for k, v in metrics.items()}
            logger.info(f"step {step}: loss {m['loss']:.4f} "
                        f"epe {m['epe']:.3f} ({time.time() - t0:.1f}s)")
        if step % args.save_every == 0 or step == args.num_steps:
            path = os.path.join(args.output_dir, f"gmflow_{step:07d}.npz")
            export_adapter(params, path)
            logger.info(f"saved {path}")
    return params


def main(argv=None):
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
