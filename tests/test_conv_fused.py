"""Fused GN-apply+SiLU+conv3x3 kernel: parity vs jnp chain + VJP parity.

CPU runs the kernel in interpret mode. Covers edge strips (top/bottom
zero halo), temb/residual epilogues, emitted channel sums, and gradient
equality with the unfused formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mofa_tpu.kernels.conv_fused import (gn_silu_conv3x3, _ref_chain,
                                         _pick_strip)


def _mk(n=2, h=12, w=16, c=32, o=48, seed=0, temb=False, res=False):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    x = jax.random.normal(ks[0], (n, h, w, c)) * 1.5
    a = jax.random.normal(ks[1], (n, c)) * 0.3 + 1.0
    b = jax.random.normal(ks[2], (n, c)) * 0.2
    wk = jax.random.normal(ks[3], (3, 3, c, o)) * 0.05
    bias = jax.random.normal(ks[4], (o,)) * 0.1
    tb = jax.random.normal(ks[5], (n, o)) * 0.2 if temb else None
    rr = jax.random.normal(ks[6], (n, h, w, o)) if res else None
    return x, a, b, wk, bias, tb, rr


@pytest.mark.parametrize("h,silu", [(12, True), (36, True), (4, False)])
def test_forward_matches_ref(h, silu):
    x, a, b, w, bias, tb, rr = _mk(h=h)
    got = gn_silu_conv3x3(x, a, b, w, bias, None, None, silu, False)
    want = _ref_chain(x, a, b, w, bias, None, None, silu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_epilogues_and_sums():
    x, a, b, w, bias, tb, rr = _mk(temb=True, res=True)
    out, s1, s2 = gn_silu_conv3x3(x, a, b, w, bias, tb, rr, True, True)
    want = _ref_chain(x, a, b, w, bias, tb, rr, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    of = np.asarray(want, np.float32)
    np.testing.assert_allclose(np.asarray(s1), of.sum((1, 2)),
                               rtol=5e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), (of * of).sum((1, 2)),
                               rtol=5e-4, atol=1e-4)


def test_bf16_forward():
    x, a, b, w, bias, tb, rr = _mk()
    xb = x.astype(jnp.bfloat16)
    got = gn_silu_conv3x3(xb, a, b, w, bias, None, None, True, False)
    want = _ref_chain(xb, a, b, w, bias, None, None, True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.15, rtol=0.05)


def test_vjp_matches_unfused():
    x, a, b, w, bias, tb, rr = _mk(h=8, w=8, temb=True)
    ct = jax.random.normal(jax.random.PRNGKey(9), rr.shape if rr is not None
                           else (x.shape[0], 8, 8, w.shape[-1]))

    def loss_fused(x, a, b, w, bias, tb):
        return jnp.sum(gn_silu_conv3x3(x, a, b, w, bias, tb, None,
                                       True, False) * ct)

    def loss_ref(x, a, b, w, bias, tb):
        return jnp.sum(_ref_chain(x, a, b, w, bias, tb, None, True) * ct)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
        x, a, b, w, bias, tb)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        x, a, b, w, bias, tb)
    for u, v in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   atol=2e-4, rtol=2e-4)


def test_pick_strip():
    for h in (72, 36, 18, 12, 8):
        assert h % _pick_strip(h) == 0


def test_temporal_forward_and_sums():
    from mofa_tpu.kernels.conv_fused import gn_silu_tconv3, _tref_chain
    ks = jax.random.split(jax.random.PRNGKey(7), 8)
    n, t, s, c, o = 2, 5, 256, 32, 32
    x = jax.random.normal(ks[0], (n, t, s, c))
    a = jax.random.normal(ks[1], (n, c)) * 0.3 + 1.0
    b = jax.random.normal(ks[2], (n, c)) * 0.2
    w = jax.random.normal(ks[3], (3, c, o)) * 0.1
    bias = jax.random.normal(ks[4], (o,)) * 0.1
    tb = jax.random.normal(ks[5], (n, t, o)) * 0.2
    rr = jax.random.normal(ks[6], (n, t, s, o))
    out, s1, s2 = gn_silu_tconv3(x, a, b, w, bias, tb, rr, True, True)
    want = _tref_chain(x, a, b, w, bias, tb, rr, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    of = np.asarray(want, np.float32)
    np.testing.assert_allclose(np.asarray(s1), of.sum((1, 2)),
                               rtol=5e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), (of * of).sum((1, 2)),
                               rtol=5e-4, atol=1e-4)


def test_temporal_vjp():
    from mofa_tpu.kernels.conv_fused import gn_silu_tconv3, _tref_chain
    ks = jax.random.split(jax.random.PRNGKey(11), 8)
    n, t, s, c, o = 1, 3, 128, 16, 16
    x = jax.random.normal(ks[0], (n, t, s, c))
    a = jnp.ones((n, c))
    b = jnp.zeros((n, c))
    w = jax.random.normal(ks[3], (3, c, o)) * 0.1
    bias = jnp.zeros((o,))
    ct = jax.random.normal(ks[5], (n, t, s, o))

    g1 = jax.grad(lambda x, w: jnp.sum(
        gn_silu_tconv3(x, a, b, w, bias, None, None, True, False) * ct),
        argnums=(0, 1))(x, w)
    g2 = jax.grad(lambda x, w: jnp.sum(
        _tref_chain(x, a, b, w, bias, None, None, True) * ct),
        argnums=(0, 1))(x, w)
    for u, v in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   atol=2e-4, rtol=2e-4)
