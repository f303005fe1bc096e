"""Optical-flow evaluation CLI (the unimatch evaluate harness core).

Replacement for Training/train_utils/unimatch/evaluate_flow.py's metric
loop: run the JAX GMFlow teacher on image pairs and score EPE/outlier
rates against ground-truth .flo files.

Data discovery (shared with apps/train_flow_app.py) handles this repo's
triples contract plus the reference's FlyingChairs / Sintel / KITTI
directory layouts — see train/flow_datasets.py.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="MOFA-TPU flow evaluation (EPE)")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--layout", default="auto",
                   choices=["auto", "triples", "chairs", "sintel", "kitti"])
    p.add_argument("--gmflow_ckpt", default=None)
    p.add_argument("--inference_height", type=int, default=384)
    p.add_argument("--inference_width", type=int, default=512)
    p.add_argument("--tiny", action="store_true")
    return p


def run(args):
    import jax
    import jax.numpy as jnp
    from mofa_tpu.models.gmflow.model import GMFlow, GMFlowConfig
    from mofa_tpu.ops.resize import resize_nhwc
    from mofa_tpu.train.flow_datasets import (discover_flow_samples,
                                              load_sample)
    from mofa_tpu.train.sampler import flow_epe
    from mofa_tpu.utils.logging import get_logger

    logger = get_logger("eval_flow")
    cfg = (GMFlowConfig(num_transformer_layers=2, num_reg_refine=2)
           if args.tiny else GMFlowConfig())
    model = GMFlow(cfg)
    ih, iw = args.inference_height, args.inference_width
    params = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, ih, iw, 3)), jnp.zeros((1, ih, iw, 3))))(
        jax.random.PRNGKey(0))
    if args.gmflow_ckpt:
        from mofa_tpu.models.weights import (load_torch_checkpoint,
                                             convert_gmflow_state_dict)
        params = convert_gmflow_state_dict(
            params, load_torch_checkpoint(args.gmflow_ckpt))
    else:
        logger.warning("no --gmflow_ckpt: evaluating random weights")

    fwd = jax.jit(lambda p, a, b: model.apply(p, a, b))
    totals = {"epe": [], "1px": [], "3px": [], "5px": []}
    samples = [s for s in discover_flow_samples(args.data_dir, args.layout)
               if s.flow_path is not None]
    assert samples, f"no ground-truth flow samples in {args.data_dir}"
    for sample in samples:
        img1, img2, gt, valid = load_sample(sample)
        h, w = img1.shape[:2]
        a = resize_nhwc(jnp.asarray(img1)[None], (ih, iw), "bilinear", True)
        b = resize_nhwc(jnp.asarray(img2)[None], (ih, iw), "bilinear", True)
        flow = fwd(params, a, b)
        flow = resize_nhwc(flow, (h, w), "bilinear", True)
        flow = flow * jnp.asarray([w / iw, h / ih], flow.dtype)
        m = flow_epe(np.asarray(flow)[0], gt, valid)
        for k in totals:
            totals[k].append(m[k])
        logger.info(
            f"{os.path.basename(sample.img1_path)}: epe {m['epe']:.3f}")
    means = {k: float(np.mean(v)) for k, v in totals.items()}
    print({"num_pairs": len(samples), **means})
    return means


def main(argv=None):
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
