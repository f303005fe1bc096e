"""Device mesh + named-sharding layer.

The reference's only distribution mechanism is NCCL data-parallel gradient
allreduce (torch DDP under HF Accelerate, /root/reference/Training/train_stage1.py:649
and hand-rolled allreduce in cmp/utils/distributed_utils.py:23). On TPU we
replace that with a named `jax.sharding.Mesh` and compiler-scheduled
collectives:

- axis "dcn":    OUTER data parallelism across pod slices — the TPU mirror
  of the reference's multi-node NCCL allreduce (accelerate multi-GPU,
  /root/reference/Training/train_stage1.sh:3; hand-rolled nccl/mpi/slurm in
  models/cmp/utils/distributed_utils.py:34-67). Batch axes shard over
  ("dcn", "data") jointly, so the gradient psum GSPMD inserts spans both —
  on real multi-slice hardware XLA decomposes it hierarchically
  (intra-slice over ICI, inter-slice over DCN). Size 1 on a single slice.
- axis "data":   batch / data parallelism within a slice (psum rides ICI)
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
    dcn: str = "dcn"
    data: str = "data"
    model: str = "model"
    frames: str = "frames"

    @property
    def batch(self) -> tuple[str, str]:
        """Joint spec entry for batch dims: outer-slice DP x intra-slice
        DP. With dcn=1 this degenerates to plain "data" sharding."""
        return (self.dcn, self.data)


AXES = MeshAxes()


def make_mesh(
    data: int = 1,
    frames: int = -1,
    model: int = 1,
    dcn: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a (dcn, data, model, frames) mesh. frames=-1 takes the rest.

    "dcn"    — multi-slice data parallelism (outermost: slices are far
               apart; only gradient allreduce crosses it)
    "data"   — batch / DP axis within a slice (gradient psum rides ICI)
    "model"  — Megatron-style tensor parallelism of attention/MLP kernels
    "frames" — sequence parallelism over the video-frame axis (only temporal
               attention/resnets communicate across it)

    The dcn axis is OUTERMOST in the device array so that on real
    multi-slice topologies contiguous device blocks map to slices (the
    jax.experimental.mesh_utils convention for hybrid DCN meshes).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if frames == -1:
        assert n % (dcn * data * model) == 0, (n, dcn, data, model)
        frames = n // (dcn * data * model)
    assert dcn * data * model * frames == n, \
        f"mesh {dcn}x{data}x{model}x{frames} != {n}"
    arr = np.array(devices).reshape(dcn, data, model, frames)
    return Mesh(arr, (AXES.dcn, AXES.data, AXES.model, AXES.frames))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def frame_sharded(mesh: Mesh, frame_axis: int = 1, ndim: int = 5) -> NamedSharding:
    """Shard a [B, T, ...] array over ("frames",) along its frame axis."""
    spec = [None] * ndim
    spec[0] = AXES.batch
    spec[frame_axis] = AXES.frames
    return NamedSharding(mesh, P(*spec))


def data_sharded(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-dim sharding over the joint (dcn, data) DP axes."""
    spec = [None] * ndim
    spec[0] = AXES.batch
    return NamedSharding(mesh, P(*spec))
