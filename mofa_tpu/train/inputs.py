"""Stage-2 control-flow synthesis: dense teacher flow -> sparse -> CMP.

Re-derivation of `sample_inputs` / `get_cmp_flow`
(/root/reference/Training/train_stage2.py:78-159), channel-last:
the clip's dense flow is masked by (grid, watershed) samples from its last
frame, rescaled to the 384^2 CMP canvas (component-scaled), completed by
CMP, and returned at the training resolution. The mask sampling is host
numpy (scipy); the whole device side (resize + sparse scale + CMP + final
rescale) runs as ONE jitted program — eagerly dispatching the CMP
resnet's ~hundreds of ops costs seconds over the axon tunnel (~30 ms RTT
per dispatch; same rationale as pipelines/common.encode_clip_image).

`Stage2InputPipeline` adds the deployment-shaped overlap (VERDICT r04
task 4): the reference computes teacher flow + CMP inline per step and
eats the full input-synthesis latency (SURVEY §3.4); here the host mask
sampling of batch N runs WHILE the device computes the teacher flows of
batch N+1, so steady-state wall per step approaches
max(device teacher+cmp+step, host mask) instead of their sum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mofa_tpu.models.cmp.model import cmp_preprocess
from mofa_tpu.ops.resize import resize_nhwc
from mofa_tpu.ops.flow import rescale_flow
from mofa_tpu.train.flow_sampler import clip_sample_mask


def scale_flow_to(flow: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear-free reference semantics: F.interpolate default (nearest)
    + per-component scale (train_stage2.py:133-137 uses interpolate with
    default mode then multiplies components)."""
    return rescale_flow(flow, height, width)


@functools.partial(jax.jit,
                   static_argnames=("cmp", "train_size", "compute_dtype"))
def _stage2_cmp_jit(cmp, cmp_params, px, sparse, mask, *, train_size,
                    compute_dtype=None):
    """Device half of get_cmp_flow as one program: resize to the 384^2 CMP
    canvas (component-scaled flow), complete with CMP, rescale to the
    train size. Module-level jit so the compiled program is cached across
    steps (cmp hashes by config).

    compute_dtype=jnp.bfloat16 runs the CMP completion itself in bf16
    (params + activations cast inside the program; resizes/rescales stay
    fp32, output returned fp32). Numerics bound vs fp32 is asserted in
    tests/test_train_inputs.py::test_cmp_bf16_dense_flow_bound — the
    dense flow is a *training control signal* that the adapter sees only
    through its own bf16 cond embedding, so half-precision completion is
    within the train path's own rounding."""
    b, tm1 = sparse.shape[:2]
    h, w = sparse.shape[2:4]
    if (h, w) != (384, 384):
        px = resize_nhwc(px, (384, 384), method="nearest")
        sparse = rescale_flow(sparse, 384, 384)
        mask = resize_nhwc(mask, (384, 384), method="nearest")
    if compute_dtype is not None:
        cmp_params = jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, cmp_params)
        px = px.astype(compute_dtype)
        sparse = sparse.astype(compute_dtype)
        mask = mask.astype(compute_dtype)
    flat = lambda x: x.reshape((b * tm1,) + x.shape[2:])
    dense = cmp.apply(cmp_params, cmp_preprocess(flat(px)), flat(sparse),
                      flat(mask))
    dense = dense.reshape((b, tm1) + dense.shape[1:]).astype(jnp.float32)
    return rescale_flow(dense, *train_size)


def stage2_control_flow(cmp, cmp_params, pixel_values01: np.ndarray,
                        flows: np.ndarray, train_size: tuple[int, int],
                        rng=None, cmp_dtype=None):
    """pixel_values01 [b,t,h,w,3] (0,1); flows [b,t-1,h,w,2] dense teacher
    flow at (h,w). Returns (controlnet_flow [b,t-1,H,W,2] jnp at train_size,
    mask [b,t-1,h,w,2] np)."""
    tm1 = flows.shape[1]
    mask = clip_sample_mask(flows, rng=rng)                 # [b, t-1, h, w, 2]
    sparse = flows * mask
    dense = _stage2_cmp_jit(cmp, cmp_params,
                            jnp.asarray(pixel_values01[:, :tm1]),
                            jnp.asarray(sparse), jnp.asarray(mask),
                            train_size=tuple(train_size),
                            compute_dtype=cmp_dtype)
    return dense, mask


class Stage2InputPipeline:
    """One-batch-lookahead stage-2 input synthesis.

    Per batch the dependency chain is
        teacher(device) -> fetch -> mask(host scipy) -> CMP+step(device);
    the pipeline keeps the device busy with batch N+1's teacher while the
    host samples batch N's mask:

        dispatch teacher(0)
        for i: fetch flows(i); dispatch teacher(i+1);   # device busy
               mask(i) on host (overlapped);            # host busy
               CMP(i) + caller's step(i)                # device (queued)

    Exact same math/rng-order as the sequential path when batches arrive
    in the same order (one flow_sampler draw per clip, batch order
    preserved). Reference counterpart: the inline per-step synthesis of
    train_stage2.py:1249-1268 (which has no such overlap).
    """

    def __init__(self, gmflow, gmflow_params, cmp, cmp_params,
                 train_size, inference_size=(384, 512),
                 pair_chunk: int | None = 8, teacher_dtype=None, rng=None,
                 cmp_dtype=None, flow_cache=None):
        from mofa_tpu.models.gmflow.model import get_optical_flows
        self._get_flows = get_optical_flows
        self.gmflow, self.cmp = gmflow, cmp
        self.cmp_params = cmp_params
        self.train_size = tuple(train_size)
        self.inference_size = inference_size
        self.pair_chunk = pair_chunk
        self.rng = rng
        self.cmp_dtype = cmp_dtype
        # TeacherFlowCache (train/flow_cache.py): clips that arrive as
        # (key, px) pairs consult it; hits skip the device teacher
        # entirely, misses are computed live and written back
        self.flow_cache = flow_cache
        if teacher_dtype is not None:
            gmflow_params = jax.tree_util.tree_map(
                lambda x: x.astype(teacher_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                gmflow_params)
        self.gmflow_params = gmflow_params
        self._teacher_dtype = teacher_dtype

    def _teacher(self, px_dev):
        x = px_dev
        if self._teacher_dtype is not None:
            x = x.astype(self._teacher_dtype)
        else:
            x = x.astype(jnp.float32)
        f = self._get_flows(self.gmflow, self.gmflow_params, x,
                            inference_size=self.inference_size,
                            pair_chunk=self.pair_chunk)
        return f.astype(jnp.float32)

    def _start(self, item):
        """(keys, px) or bare px -> (keys, px_np, teacher_handle, cached).
        Cache hits never touch the device; misses dispatch the teacher."""
        keys, px_np = item if isinstance(item, tuple) else (None, item)
        cached = None
        if self.flow_cache is not None and keys is not None:
            cached = self.flow_cache.get_batch(keys)
        fl = None if cached is not None else self._teacher(jnp.asarray(px_np))
        return keys, px_np, fl, cached

    def run(self, clips, step_fn):
        """clips: iterable of [b, t, h, w, 3] float01 numpy arrays, or of
        (clip_keys, array) pairs when a flow_cache is attached.
        step_fn(batch_dict) is the caller's train step (it should fence —
        e.g. fetch the loss). Yields step_fn's result per batch."""
        it = iter(clips)
        try:
            cur = self._start(next(it))
        except StopIteration:
            return
        while True:
            keys, cur_px_np, flows_dev, cached = cur
            if cached is not None:
                flows_np, backfill = cached, False
            else:
                try:
                    flows_dev.copy_to_host_async()
                except AttributeError:  # older jax Array types
                    pass
                flows_np = np.asarray(flows_dev)  # waits on teacher(i)
                backfill = self.flow_cache is not None and keys is not None
            try:
                nxt = self._start(next(it))       # device: teacher(i+1)
            except StopIteration:
                nxt = None
            if backfill:
                # npz compression rides the mask-overlap region — doing
                # it BEFORE the teacher(i+1) dispatch serialized host
                # compression with an idle device
                self.flow_cache.put_batch(keys, flows_np)
            # host mask sampling overlaps teacher(i+1) on the device
            dense, _ = stage2_control_flow(
                self.cmp, self.cmp_params, cur_px_np, flows_np,
                self.train_size, rng=self.rng, cmp_dtype=self.cmp_dtype)
            yield step_fn({"pixel_values01": jnp.asarray(cur_px_np),
                           "flows": dense})
            if nxt is None:
                return
            cur = nxt


def make_stage2_batch(cmp, cmp_params, pixel_values01: np.ndarray,
                      flows: np.ndarray, rng=None, cmp_dtype=None) -> dict:
    """Assemble the EDM train-step batch dict for stage 2."""
    h, w = pixel_values01.shape[2:4]
    dense, _ = stage2_control_flow(cmp, cmp_params, pixel_values01, flows,
                                   (h, w), rng=rng, cmp_dtype=cmp_dtype)
    return {"pixel_values01": jnp.asarray(pixel_values01), "flows": dense}


def make_stage1_batch(gmflow, gmflow_params, pixel_values01,
                      inference_size=(384, 512),
                      pair_chunk: int | None = None) -> dict:
    """Stage-1 batch: dense GMFlow teacher flow as the control signal
    (Training/train_stage1.py:113-143, batched over all frame pairs).
    pair_chunk: host-chunk the pair batch — required when the SVD bundle
    is resident (the full 24-pair correlation volume OOMs a 16 GB chip;
    see get_optical_flows)."""
    from mofa_tpu.models.gmflow.model import get_optical_flows
    px = jnp.asarray(pixel_values01)
    flows = get_optical_flows(gmflow, gmflow_params, px,
                              inference_size=inference_size,
                              pair_chunk=pair_chunk)
    return {"pixel_values01": px, "flows": flows}
