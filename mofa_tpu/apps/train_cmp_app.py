"""CMP (Conditional Motion Propagation) training CLI.

TPU re-derivation of the reference's CMP rep-learning trainer
(`models/cmp/main.py` + `models/cmp/models/cmp.py:9-64`, launched by the
slurm scripts under `models/cmp/experiments/*/train_slurm.sh`): SGD with
StepLR (lr 0.1, steps [24000, 36000] x0.1 in the shipped
`resnet50_vip+mpii_liteflow/config.yaml:3-7`), DiscreteLoss over
99-bin/axis quantized flow, sparse hints sampled per step with the
grid+watershed strategy (`config.yaml:31-34`). Distribution is GSPMD
data parallelism over the mesh "data" axis, replacing DistModule's
hand-rolled allreduce (`models/cmp/utils/distributed_utils.py:23-32`).

Data: any layout train/flow_datasets.py discovers (triples /
FlyingChairs / Sintel / KITTI) — each sample contributes (img1, flow);
the reference instead reads precomputed LiteFlowNet .jpg flows
(`config.yaml:36`), which reduce to the same (image, dense flow) pairs.
Images are normalized with the reference's RGB mean/div
(`config.yaml:27-28`).
"""

from __future__ import annotations

import argparse
import os
import time

DATA_MEAN = (123.675, 116.28, 103.53)  # config.yaml:27 (RGB, 0-255)
DATA_DIV = (58.395, 57.12, 57.375)     # config.yaml:28


def build_parser():
    p = argparse.ArgumentParser(description="MOFA-TPU CMP training")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--layout", default="auto",
                   choices=["auto", "triples", "chairs", "sintel", "kitti"])
    p.add_argument("--output_dir", default="./runs/cmp")
    p.add_argument("--config", default=None,
                   help="reference CMP config.yaml to import module dims")
    p.add_argument("--resume", default=None, help=".npz params to resume")
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--lr_steps", type=int, nargs="*", default=[24000, 36000])
    p.add_argument("--lr_mults", type=float, nargs="*", default=[0.1, 0.1])
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_steps", type=int, default=42000)
    p.add_argument("--crop_size", type=int, default=384)
    p.add_argument("--bg_ratio", type=float, default=5.74e-5)
    p.add_argument("--nms_ks", type=int, default=41)
    p.add_argument("--save_every", type=int, default=5000)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--tiny", action="store_true")
    return p


def _make_batch(pairs, idx, size, bg_ratio, nms_ks, rng):
    """Resize to the train crop, normalize, sample sparse hints."""
    import numpy as np
    import jax.numpy as jnp
    from mofa_tpu.ops.resize import resize_nhwc
    from mofa_tpu.train.flow_sampler import flow_sampler

    imgs, sparses, masks, flows = [], [], [], []
    mean = np.asarray(DATA_MEAN, np.float32)
    div = np.asarray(DATA_DIV, np.float32)
    for i in idx:
        img, flow = pairs[i]
        h, w = img.shape[:2]
        im = np.asarray(resize_nhwc(jnp.asarray(img)[None], (size, size),
                                    "bilinear", True)[0])
        fl = np.asarray(resize_nhwc(jnp.asarray(flow)[None], (size, size),
                                    "bilinear", True)[0])
        fl = fl * np.asarray([size / w, size / h], np.float32)
        sparse, mask = flow_sampler(fl, ("grid", "watershed"),
                                    bg_ratio=bg_ratio, nms_ks=nms_ks, rng=rng)
        imgs.append((im - mean) / div)
        sparses.append(sparse)
        masks.append(mask.astype(np.float32))
        flows.append(fl)
    return {
        "image": jnp.asarray(np.stack(imgs)),
        "sparse": jnp.asarray(np.stack(sparses)),
        "mask": jnp.asarray(np.stack(masks)),
        "target_flow": jnp.asarray(np.stack(flows)),
    }


def run(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mofa_tpu.models.cmp.model import (CMP, CMPConfig, TINY_CMP_CONFIG,
                                           cmp_config_from_yaml)
    from mofa_tpu.models.cmp.train import (make_cmp_optimizer,
                                           make_cmp_train_step)
    from mofa_tpu.train.checkpoint import export_adapter, import_adapter
    from mofa_tpu.train.flow_datasets import (discover_flow_samples,
                                              load_sample)
    from mofa_tpu.utils.logging import get_logger

    logger = get_logger("train_cmp")
    os.makedirs(args.output_dir, exist_ok=True)
    if args.config:
        cfg = cmp_config_from_yaml(args.config)
    elif args.tiny:
        cfg = TINY_CMP_CONFIG
    else:
        cfg = CMPConfig()
    model = CMP(cfg)
    size = args.crop_size

    pairs = []
    for s in discover_flow_samples(args.data_dir, args.layout):
        img1, _, flow, _ = load_sample(s)
        if flow is not None:
            pairs.append((img1, flow))
    assert pairs, f"no (image, flow) samples in {args.data_dir}"
    logger.info(f"{len(pairs)} training samples from {args.data_dir}")

    zi = jnp.zeros((1, size, size, 3))
    zs = jnp.zeros((1, size, size, 2))
    params = jax.jit(lambda k: model.init(k, zi, zs, zs))(
        jax.random.PRNGKey(args.seed))
    if args.resume:
        params = import_adapter(params, args.resume)
        logger.info(f"resumed params from {args.resume}")

    tx = make_cmp_optimizer(args.lr, args.momentum, args.weight_decay,
                            milestones=tuple(args.lr_steps),
                            lr_mults=tuple(args.lr_mults))
    opt_state = tx.init(params)
    step_fn = jax.jit(make_cmp_train_step(model, tx, nbins=cfg.nbins,
                                          fmax=cfg.fmax))

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
        batch = _make_batch(pairs, idx, size, args.bg_ratio, args.nms_ks, rng)
        if sharding is not None:
            batch = {k: sharding(v) for k, v in batch.items()}
        params, opt_state, metrics = step_fn(params, opt_state, batch)
        if step % args.log_every == 0 or step == args.num_steps:
            logger.info(f"step {step}: loss {float(metrics['loss']):.4f} "
                        f"({time.time() - t0:.1f}s)")
        if step % args.save_every == 0 or step == args.num_steps:
            path = os.path.join(args.output_dir, f"cmp_{step:07d}.npz")
            export_adapter(params, path)
            logger.info(f"saved {path}")
    return params


def main(argv=None):
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
