"""Pallas fused GroupNorm: parity vs the jnp formulation + VJP parity.

CPU runs the kernel in interpret mode; the contract under test is the
math (one-pass channel sums, group combine, refactored affine apply) and
the custom_vjp (backward must equal the unfused GroupNorm gradient).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mofa_tpu.kernels.group_norm import (fused_group_norm, _gn_ref,
                                         _pick_block_rows)


@pytest.mark.parametrize("shape,groups", [
    ((3, 16, 16, 64), 32),
    ((2, 5, 8, 8, 64), 32),     # temporal layout [B, T, H, W, C]
    ((2, 96, 320), 32),         # odd row count -> block divisor search
    ((1, 2048, 128), 8),
])
def test_forward_matches_jnp(shape, groups):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.float32) * 3.0 + 1.5
    c = shape[-1]
    scale = jax.random.normal(jax.random.PRNGKey(1), (c,)) * 0.2 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.1
    got = fused_group_norm(x, scale, bias, groups, 1e-5)
    want = _gn_ref(x, scale, bias, groups, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_forward_bf16_matches_jnp():
    x = (jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 64))
         .astype(jnp.bfloat16))
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    got = fused_group_norm(x, scale, bias, 32, 1e-6)
    want = _gn_ref(x, scale, bias, 32, 1e-6)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=0.02)


def test_vjp_matches_unfused():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 64))
    scale = jax.random.normal(jax.random.PRNGKey(4), (64,)) * 0.3 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(5), (64,)) * 0.1
    ct = jax.random.normal(jax.random.PRNGKey(6), x.shape)

    def loss_fused(x, s, b):
        return jnp.sum(fused_group_norm(x, s, b, 32, 1e-5) * ct)

    def loss_ref(x, s, b):
        return jnp.sum(_gn_ref(x, s, b, 32, 1e-5) * ct)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_pick_block_rows_divides():
    for s in [9216, 2304, 64512, 589824, 96, 2048, 2049, 7 * 9216]:
        bs = _pick_block_rows(s)
        assert s % bs == 0 and bs <= 2048 or s <= 2048
