"""Deterministic iteration-based distributed sampling + flow evaluation.

- `GivenIterationSampler`: re-derivation of CMP's
  DistributedGivenIterationSampler (/root/reference/MOFA-Video-Traj/models/
  cmp/utils/distributed_utils.py:176-229): pre-generates the full index
  sequence for total_iter*batch_size samples (shuffled in whole-dataset
  rounds with a fixed seed), then slices this host's shard — resume is
  just `set_last_iter`.
- `flow_epe`: end-point-error metrics (the unimatch evaluation harness's
  core metric, Training/train_utils/unimatch/evaluate_flow.py).
"""

from __future__ import annotations

import numpy as np


class GivenIterationSampler:
    def __init__(self, dataset_len: int, total_iter: int, batch_size: int,
                 world_size: int = 1, rank: int = 0, last_iter: int = -1,
                 seed: int = 0):
        assert 0 <= rank < world_size
        self.dataset_len = dataset_len
        self.total_iter = total_iter
        self.batch_size = batch_size
        self.world_size = world_size
        self.rank = rank
        self.last_iter = last_iter
        self.total_size = total_iter * batch_size
        self.seed = seed
        self.indices = self._gen_indices()

    def _gen_indices(self) -> np.ndarray:
        np_rng = np.random.RandomState(self.seed)
        all_size = self.total_size * self.world_size
        indices = np.arange(self.dataset_len)
        indices = indices[:all_size]
        num_repeat = (all_size - 1) // indices.shape[0] + 1
        indices = np.tile(indices, num_repeat)[:all_size]
        np_rng.shuffle(indices)
        beg = self.total_size * self.rank
        return indices[beg:beg + self.total_size]

    def set_last_iter(self, last_iter: int):
        self.last_iter = last_iter

    def __iter__(self):
        return iter(self.indices[(self.last_iter + 1) * self.batch_size:])

    def __len__(self):
        return self.total_size - (self.last_iter + 1) * self.batch_size


def flow_epe(pred: np.ndarray, gt: np.ndarray, valid=None) -> dict:
    """End-point error metrics over [..., H, W, 2] flows: mean EPE and
    >1px/>3px/>5px outlier rates."""
    err = np.sqrt(((pred - gt) ** 2).sum(-1))
    if valid is not None:
        err = err[valid > 0.5]
    return {
        "epe": float(err.mean()),
        "1px": float((err > 1).mean()),
        "3px": float((err > 3).mean()),
        "5px": float((err > 5).mean()),
    }
