"""EDM train step: loss/update/freeze in one compile, grad-accum, 8-device
DP+TP+SP. Uses the MICRO UNet config — XLA CPU compile time dominates here."""

import dataclasses
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mofa_tpu.core.mesh import make_mesh
from mofa_tpu.models.svd_unet import MICRO_UNET_CONFIG
from mofa_tpu.models.vae import TINY_VAE_CONFIG
from mofa_tpu.models.clip_vision import TINY_CLIP_CONFIG
from mofa_tpu.parallel.sharding import shard_params, param_sharding_tree
from mofa_tpu.pipelines.common import ModelBundle
from mofa_tpu.train.state import (
    TrainState, make_optimizer, freeze_mask, STAGE2_FROZEN)
from mofa_tpu.train.stage import make_train_step, make_grad_accum_train_step

H = W = 64
T = 3
B = 2


@pytest.fixture(scope="module")
def bundle():
    return ModelBundle.init_random(jax.random.PRNGKey(0), MICRO_UNET_CONFIG,
                                   TINY_VAE_CONFIG, TINY_CLIP_CONFIG,
                                   image_size=(H, W), num_frames=T)


def _batch(rng, b=B):
    return {
        "pixel_values01": jnp.asarray(rng.rand(b, T, H, W, 3), jnp.float32),
        "flows": jnp.asarray(rng.randn(b, T - 1, H, W, 2), jnp.float32),
    }


def test_freeze_mask_patterns(bundle):
    mask = freeze_mask(bundle.controlnet_params, STAGE2_FROZEN)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    frozen = ["/".join(str(getattr(k, "key", k)) for k in kp)
              for kp, v in flat if not v]
    trainable = ["/".join(str(getattr(k, "key", k)) for k in kp)
                 for kp, v in flat if v]
    assert any("flow_encoder" in p for p in frozen)
    assert any("controlnet_cond_embedding" in p for p in frozen)
    assert trainable  # most of the adapter still trains


def test_train_step_stage2_updates_and_freezes(bundle):
    """One compiled step checks: finite loss, step++, trainable leaves move,
    stage-2-frozen leaves don't, EMA stays finite."""
    params = bundle.controlnet_params
    tx = make_optimizer(lr=1e-2, frozen_patterns=STAGE2_FROZEN, params=params)
    state = TrainState.create(params, tx, ema=True)
    step = jax.jit(make_train_step(bundle, tx))
    rng = np.random.RandomState(0)
    new_state, metrics = step(state, _batch(rng), jax.random.PRNGKey(1))

    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert int(new_state.step) == 1

    changed = []

    def check(path, old, new):
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        if any(re.search(pat, p) for pat in STAGE2_FROZEN):
            np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
        else:
            changed.append(bool(np.any(np.asarray(old) != np.asarray(new))))

    jax.tree_util.tree_map_with_path(check, state.params, new_state.params)
    assert any(changed)
    for leaf in jax.tree_util.tree_leaves(new_state.ema_params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_grad_accum_step(bundle):
    tx = make_optimizer(lr=1e-3)
    state = TrainState.create(bundle.controlnet_params, tx)
    accum = 2
    step = jax.jit(make_grad_accum_train_step(bundle, tx, accum_steps=accum))
    rng = np.random.RandomState(2)
    batches = {
        "pixel_values01": jnp.asarray(rng.rand(accum, 1, T, H, W, 3), jnp.float32),
        "flows": jnp.asarray(rng.randn(accum, 1, T - 1, H, W, 2), jnp.float32),
    }
    new_state, metrics = step(state, batches, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_sharded_train_step_dp_tp_sp(bundle):
    """Full train step over a 2x2x2 (data, model, frames) CPU mesh."""
    assert jax.device_count() >= 8
    mesh = make_mesh(data=2, model=2, frames=2)

    cn_params = shard_params(bundle.controlnet_params, mesh)
    unet_params = shard_params(bundle.unet_params, mesh)
    sharded = dataclasses.replace(bundle, controlnet_params=cn_params,
                                  unet_params=unet_params)

    # sanity: at least one kernel actually got a model-sharded spec
    tree = param_sharding_tree(cn_params, mesh)
    specs = [s.spec for s in jax.tree_util.tree_leaves(tree)]
    assert any("model" in str(s) for s in specs)

    tx = make_optimizer(lr=1e-3)
    state = TrainState.create(cn_params, tx)
    step = jax.jit(make_train_step(sharded, tx, mesh=mesh))

    rng = np.random.RandomState(3)
    batch = _batch(rng)
    from jax.sharding import NamedSharding, PartitionSpec as P
    # host boundary: data-sharded only; frame SP applied inside via
    # with_sharding_constraint (handles T not divisible by the frames axis)
    batch = {k: jax.device_put(
                 v, NamedSharding(mesh, P("data", *([None] * (v.ndim - 1)))))
             for k, v in batch.items()}
    new_state, metrics = step(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_init_adapter_from_unet(bundle):
    from mofa_tpu.models.weights import init_adapter_from_unet
    import numpy as np

    cn = init_adapter_from_unet(bundle.controlnet_params, bundle.unet_params)
    trunk = cn["params"]["trunk"]
    src = bundle.unet_params["params"]
    # copied modules match the UNet exactly
    for name in ("conv_in", "time_embedding", "mid_block", "down_blocks_0"):
        got = jax.tree_util.tree_leaves(trunk[name])
        want = jax.tree_util.tree_leaves(src[name])
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # add_embedding intentionally NOT copied (reference from_unet set)
    orig = jax.tree_util.tree_leaves(
        bundle.controlnet_params["params"]["trunk"]["add_embedding"])
    kept = jax.tree_util.tree_leaves(trunk["add_embedding"])
    for o, k in zip(orig, kept):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(k))


def test_ldmk_adapter_train_step():
    """EDM step through the landmark adapter (occlusion heads + landmark
    embedding in the grad path)."""
    bundle = ModelBundle.init_random(
        jax.random.PRNGKey(1), MICRO_UNET_CONFIG, TINY_VAE_CONFIG,
        TINY_CLIP_CONFIG, ldmk=True, image_size=(H, W), num_frames=T)
    tx = make_optimizer(lr=1e-3)
    state = TrainState.create(bundle.controlnet_params, tx)
    step = jax.jit(make_train_step(bundle, tx, ldmk=True))
    rng = np.random.RandomState(4)
    batch = _batch(rng)
    batch["landmarks"] = jnp.asarray(rng.rand(B, T, H, W, 3), jnp.float32)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss"]))
    changed = jax.tree_util.tree_map(
        lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
        state.params, new_state.params)
    assert any(jax.tree_util.tree_leaves(changed))


def test_frozen_as_args_matches_closure(bundle):
    """Passing frozen UNet/VAE/CLIP params as jit arguments (the
    full-scale path — closures bake GBs of constants) must reproduce the
    closure-captured step exactly."""
    from mofa_tpu.train.stage import frozen_params

    tx = make_optimizer(lr=1e-3, params=bundle.controlnet_params)
    state = TrainState.create(bundle.controlnet_params, tx)
    rng = np.random.RandomState(7)
    batch = _batch(rng)
    step = jax.jit(make_train_step(bundle, tx))
    want_state, want_m = step(state, batch, jax.random.PRNGKey(9))
    got_state, got_m = step(state, batch, jax.random.PRNGKey(9),
                            frozen_params(bundle))
    # rtol: constant-folded (closure) vs argument-fed programs are both
    # valid fp reassociations, not bit-equal — XLA folds/fuses baked
    # constants differently. Measured drift grew to ~1.6e-5 relative in
    # this image (fails at the r04 commit too, i.e. an XLA-version
    # numerics shift, not a code regression — r05 full-suite run).
    np.testing.assert_allclose(float(got_m["loss"]), float(want_m["loss"]),
                               rtol=1e-4)
    # args vs constants compile to slightly different fusions; near-zero
    # grads can flip an Adam update's sign, so bound params by the
    # update scale (lr=1e-3) rather than exact equality
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=2.5e-3),
        got_state.params, want_state.params)
