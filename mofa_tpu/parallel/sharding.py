"""Named-sharding rules for MOFA-TPU params and activations.

The reference's only distribution is NCCL data-parallel (torch DDP under
HF Accelerate, /root/reference/Training/train_stage1.py:649). Here the
"backend" is GSPMD: we annotate a `jax.sharding.Mesh` with three axes
(core/mesh.py) and let XLA place the collectives:

- "data":   batch DP — gradient psum inserted by XLA at the loss/grad.
- "model":  Megatron-style tensor parallelism of attention + GEGLU-MLP
  kernels (column-parallel qkv/up-proj, row-parallel out-proj/down-proj)
  AND of every resnet conv pair (column-parallel conv1 / row-parallel
  conv2 with one all-reduce per block; the in-between GroupNorm is
  shard-local because contiguous channel shards hold whole groups while
  the model axis divides the 32 groups — see _TP_RULES).
- "frames": sequence parallelism over the video-frame axis of [B, T, ...]
  activations; only the temporal-attention / temporal-resnet mixing layers
  induce cross-frame collectives (all-to-all over frames ↔ tokens).

Annotations are layout hints — GSPMD keeps semantics identical under any
sharding, so every rule here is safe by construction.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mofa_tpu.core.mesh import AXES

# (path-regex, spec) — first match wins; applied to '/'-joined param paths.
# Dense wraps nn.Dense so kernels live at `<name>/Dense_0/kernel`.
_TP_RULES: tuple[tuple[str, P], ...] = (
    # column-parallel: shard output features of qkv and the GEGLU up-proj
    (r"(to_q|to_k|to_v|net_0_proj)/Dense_0/kernel$", P(None, AXES.model)),
    (r"net_0_proj/Dense_0/bias$", P(AXES.model)),
    # row-parallel: shard input features of attention-out and MLP down-proj
    (r"(to_out_0|net_2)/Dense_0/kernel$", P(AXES.model, None)),
    # --- conv TP (round 5): Megatron pairing inside every resnet block.
    # conv1 is column-parallel (HWIO Cout shard), conv2 row-parallel
    # (HWIO Cin shard -> GSPMD inserts ONE all-reduce per block at the
    # conv2 output). The in-between GroupNorm(32) + SiLU + time-emb add
    # stay shard-LOCAL: contiguous channel shards hold 32/n whole groups
    # whenever the model axis n divides 32 (the `fix` divisibility guard
    # below also requires C % n == 0), and time_emb_proj's output is
    # column-sharded to match conv1's. Shortcut/conv_in/conv_out/samplers
    # stay replicated: they have no row-parallel partner, so sharding
    # them would only trade a replicated GEMM for an all-gather.
    # Spatial resnets (ResnetBlock2D -> Conv wrapper, HWIO [3,3,Ci,Co]):
    (r"spatial_res_block/conv1/Conv_0/kernel$",
     P(None, None, None, AXES.model)),
    (r"spatial_res_block/conv1/Conv_0/bias$", P(AXES.model)),
    (r"spatial_res_block/conv2/Conv_0/kernel$",
     P(None, None, AXES.model, None)),
    # Temporal resnets (TemporalConv3 GEMM form, kernel [3,1,1,Ci,Co]):
    (r"temporal_res_block/conv1/kernel$",
     P(None, None, None, None, AXES.model)),
    (r"temporal_res_block/conv1/bias$", P(AXES.model)),
    (r"temporal_res_block/conv2/kernel$",
     P(None, None, None, AXES.model, None)),
    # per-block time-emb projection feeds the column-sharded conv1 output
    (r"res_block/time_emb_proj/Dense_0/kernel$", P(None, AXES.model)),
    (r"res_block/time_emb_proj/Dense_0/bias$", P(AXES.model)),
)


def param_spec(path: str) -> P:
    for pat, spec in _TP_RULES:
        if re.search(pat, path):
            return spec
    return P()  # replicated


def _tree_paths_and_specs(params: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for keypath, leaf in flat:
        path = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        spec = param_spec(path)
        # never shard a dim that doesn't divide evenly — fall back to replicated
        ok = True
        for d, name in enumerate(spec):
            if name is None:
                continue
            if d >= leaf.ndim:
                ok = False
                break
        specs.append(spec if ok else P())
    return treedef.unflatten(specs)


def param_sharding_tree(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for a flax param tree: TP rules + replicate rest."""

    def fix(spec, leaf):
        # drop model-axis sharding when the dimension doesn't divide
        axes = mesh.shape
        out = []
        for d, name in enumerate(spec):
            if name is not None and (d >= leaf.ndim or
                                     leaf.shape[d] % axes[name] != 0):
                name = None
            out.append(name)
        return NamedSharding(mesh, P(*out))

    specs = _tree_paths_and_specs(params)
    return jax.tree_util.tree_map(fix, specs, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """device_put a param tree onto the mesh under the TP rules."""
    return jax.device_put(params, param_sharding_tree(params, mesh))


def frames_spec(ndim: int, frame_axis: int = 1, batch_axis: int | None = 0) -> P:
    """[B, T, ...] activation spec: batch over the joint ("dcn", "data")
    DP axes, frames over "frames" (dcn degenerates on single-slice)."""
    spec: list = [None] * ndim
    if batch_axis is not None:
        spec[batch_axis] = AXES.batch
    spec[frame_axis] = AXES.frames
    return P(*spec)


def constrain_frames(x: jax.Array, mesh: Mesh, frame_axis: int = 1) -> jax.Array:
    """with_sharding_constraint helper for [B, T, ...] tensors (no-op sizes
    that don't divide are left to GSPMD, which handles uneven shards)."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, frames_spec(x.ndim, frame_axis)))
