"""Orbax checkpoint management for training state.

TPU replacement for HF Accelerate's save_state/resume machinery
(Training/train_stage1.py:1177-1208: periodic save with
`checkpoints_total_limit` pruning; resume via `--resume_from_checkpoint
latest`, :1000-1028): an orbax CheckpointManager over the TrainState pytree
(params + opt_state + EMA), sharded-array aware, with the same keep-limit
semantics. `export_adapter` emits the trained adapter as a flat
numpy .npz usable by apps/loaders without torch.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from mofa_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None,
                 save_interval_steps: int = 1):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True),
        )

    def save(self, step: int, state: TrainState, wait: bool = False):
        self._mgr.save(step, args=ocp.args.StandardSave(
            {"step": state.step, "params": state.params,
             "opt_state": state.opt_state, "ema_params": state.ema_params}))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure of `state` (shapes/shardings kept)."""
        step = step if step is not None else self._mgr.latest_step()
        assert step is not None, "no checkpoint to restore"
        template = {"step": state.step, "params": state.params,
                    "opt_state": state.opt_state,
                    "ema_params": state.ema_params}
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template))
        return TrainState(step=restored["step"], params=restored["params"],
                          opt_state=restored["opt_state"],
                          ema_params=restored["ema_params"])

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def export_adapter(params: Any, path: str):
    """Flatten a flax param tree to .npz ('/'-joined keys)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for kp, leaf in flat:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        out[key] = np.asarray(leaf)
    np.savez(path, **out)


def import_adapter(params: Any, path: str) -> Any:
    """Inverse of export_adapter: fill a template tree from .npz."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = []
    for kp, leaf in flat:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        val = data[key]
        assert val.shape == leaf.shape, (key, val.shape, leaf.shape)
        leaves.append(val.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
