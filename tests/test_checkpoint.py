"""Orbax checkpoint manager: save/restore/prune + adapter npz roundtrip."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mofa_tpu.train.checkpoint import (CheckpointManager, export_adapter,
                                       import_adapter)
from mofa_tpu.train.state import TrainState, make_optimizer


def _state():
    params = {"a": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))},
              "b": {"kernel": jnp.full((2, 2), 3.0)}}
    tx = make_optimizer(lr=1e-3)
    return TrainState.create(params, tx, ema=True), tx


def test_save_restore_roundtrip_and_prune():
    state, tx = _state()
    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d, max_to_keep=2, save_interval_steps=1)
        for step in (1, 2, 3):
            grads = jax.tree_util.tree_map(
                lambda x: jnp.full_like(x, 0.1 * step), state.params)
            state = state.apply_gradients(grads, tx)
            mgr.save(step, state, wait=True)
        assert mgr.latest_step() == 3

        blank, _ = _state()
        restored = mgr.restore(blank, 3)
        assert int(restored.step) == int(state.step)
        for got, want in zip(jax.tree_util.tree_leaves(restored.params),
                             jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want))
        for got, want in zip(jax.tree_util.tree_leaves(restored.ema_params),
                             jax.tree_util.tree_leaves(state.ema_params)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want))
        # total-limit pruning: step 1 gone
        assert mgr.restore(blank, 2) is not None
        import pytest
        with pytest.raises(Exception):
            mgr.restore(blank, 1)
        mgr.close()


def test_adapter_npz_roundtrip():
    state, _ = _state()
    import os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "adapter.npz")
        export_adapter(state.params, path)
        blank = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        back = import_adapter(blank, path)
        for got, want in zip(jax.tree_util.tree_leaves(back),
                             jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
