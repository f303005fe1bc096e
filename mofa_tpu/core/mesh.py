"""Device mesh + named-sharding layer.

The reference's only distribution mechanism is NCCL data-parallel gradient
allreduce (torch DDP under HF Accelerate, /root/reference/Training/train_stage1.py:649
and hand-rolled allreduce in cmp/utils/distributed_utils.py:23). On TPU we
replace that with a named `jax.sharding.Mesh` and compiler-scheduled
collectives:

- axis "data":   batch / data parallelism (gradient psum rides ICI)
- axis "frames": frame parallelism for inference — MOFA's per-frame conv and
  warp work is embarrassingly parallel over the video-frame axis; only the
  temporal attention / temporal resnet layers inside SVD blocks communicate
  across it (all_gather over "frames").
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: str = "data"
    model: str = "model"
    frames: str = "frames"


AXES = MeshAxes()


def make_mesh(
    data: int = 1,
    frames: int = -1,
    model: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a (data, model, frames) mesh. frames=-1 consumes the remainder.

    "data"   — batch / DP axis (gradient psum rides ICI)
    "model"  — Megatron-style tensor parallelism of attention/MLP kernels
    "frames" — sequence parallelism over the video-frame axis (only temporal
               attention/resnets communicate across it)
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if frames == -1:
        assert n % (data * model) == 0, (n, data, model)
        frames = n // (data * model)
    assert data * model * frames == n, f"mesh {data}x{model}x{frames} != {n}"
    arr = np.array(devices).reshape(data, model, frames)
    return Mesh(arr, (AXES.data, AXES.model, AXES.frames))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def frame_sharded(mesh: Mesh, frame_axis: int = 1, ndim: int = 5) -> NamedSharding:
    """Shard a [B, T, ...] array over ("frames",) along its frame axis."""
    spec = [None] * ndim
    spec[0] = AXES.data
    spec[frame_axis] = AXES.frames
    return NamedSharding(mesh, P(*spec))


def data_sharded(mesh: Mesh, ndim: int) -> NamedSharding:
    spec = [None] * ndim
    spec[0] = AXES.data
    return NamedSharding(mesh, P(*spec))
