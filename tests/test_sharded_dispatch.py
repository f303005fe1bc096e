"""Sharded-execution kernel dispatch: Pallas paths (opaque to the SPMD
partitioner) must be routed around when compiling for a >1-device mesh,
and the frame-parallel layout hints must skip unshardable dims."""

import jax
import jax.numpy as jnp
import numpy as np

from mofa_tpu.core.mesh import make_mesh
from mofa_tpu.parallel.activation import (
    frame_parallel, sharded_execution, is_sharded_execution, constrain_batch)


def test_sharded_execution_context():
    assert not is_sharded_execution()
    with sharded_execution():
        assert is_sharded_execution()
    mesh = make_mesh(data=1, frames=8)
    with frame_parallel(mesh):
        assert is_sharded_execution()  # frame_parallel implies it
    assert not is_sharded_execution()


def test_packed_attention_keeps_batch_dim_under_sharding():
    """nb must collapse to 1 under sharded execution so the batch dim of
    the [B] -> [B/nb, nb*L*H] pack reshape stays mesh-propagatable."""
    from mofa_tpu.kernels.attention import _packed_short_attention
    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(6, 3, 2, 8).astype(np.float32))
               for _ in range(3))
    want = np.asarray(_packed_short_attention(q, k, v))
    with sharded_execution():
        got = np.asarray(_packed_short_attention(q, k, v))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_constrain_batch_skips_unshardable_dim():
    mesh = make_mesh(data=1, frames=8)
    # frames policy (training layout): dim 0 carries the axis
    small = jnp.zeros((2, 3, 4))   # dim0 < frame axis: no constraint
    big = jnp.zeros((16, 3, 4))
    with frame_parallel(mesh, policy="frames"):
        jitted = jax.jit(lambda a, b: (constrain_batch(a), constrain_batch(b)))
        s, b = jitted(small, big)
    assert s.shape == small.shape and b.shape == big.shape
    assert b.sharding.spec[0] == "frames"
    # the small tensor was left to propagation (no explicit frames spec)
    assert not (len(s.sharding.spec) and s.sharding.spec[0] == "frames")

    # tokens policy (deployment default): dim 1 (the token dim) carries it
    tok_small = jnp.zeros((16, 3, 4))    # dim1 < axis: no constraint
    tok_big = jnp.zeros((2, 16, 4))
    with frame_parallel(mesh):
        jitted2 = jax.jit(lambda a, b: (constrain_batch(a),
                                        constrain_batch(b)))
        ts, tb = jitted2(tok_small, tok_big)
    assert len(tb.sharding.spec) > 1 and tb.sharding.spec[1] == "frames"
    assert not any(ax == "frames" for ax in ts.sharding.spec)
