"""Unit tests for the short-sequence (temporal) attention Pallas kernel.

Runs in interpret mode on CPU (like the flash kernel tests); on real TPU
the same code compiles through Mosaic. Reference: plain fp32-softmax
attention, the exact math of the packed-XLA path it replaces
(kernels/attention.py::_packed_short_attention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mofa_tpu.kernels.short_attention import (
    _short_attn_ref, short_attention, short_attention_applicable)


def _mk(b, l, h, d, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (b, l, h, d)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


@pytest.mark.parametrize("b,l,h,d", [
    (146, 7, 5, 64),     # SVD temporal /8 shape family (pads: 146 % bn != 0)
    (64, 7, 10, 64),     # /16 heads
    (128, 25, 5, 64),    # keypoint window length
    (73, 7, 5, 64),      # exactly one block
    (80, 3, 2, 32),      # small head_dim, tiny L
])
def test_short_attention_matches_reference(b, l, h, d):
    q, k, v = _mk(b, l, h, d)
    out = short_attention(q, k, v)
    ref = _short_attn_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_short_attention_bf16():
    q, k, v = _mk(100, 7, 5, 64, jnp.bfloat16)
    out = short_attention(q, k, v)
    ref = _short_attn_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("b,l,h,d", [(146, 7, 5, 64), (64, 25, 5, 64)])
def test_short_attention_fixed_max(b, l, h, d):
    """Clamped no-max softmax (the TPU default path) is exact at normal
    logit magnitudes; normalize-after-PV only reorders the division."""
    q, k, v = _mk(b, l, h, d)
    out = short_attention(q, k, v, 0, True)
    ref = _short_attn_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_short_attention_grad_matches_reference():
    q, k, v = _mk(16, 5, 2, 16)

    def loss_kernel(q, k, v):
        return jnp.sum(jnp.square(short_attention(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(_short_attn_ref(q, k, v)))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_applicability_gate():
    # CPU backend -> False (dispatch falls back to the packed-XLA path)
    assert not short_attention_applicable(18432, 7, 7, 5, 64)


def test_dispatch_still_exact_on_cpu():
    """auto dispatch at the temporal shape must equal naive on CPU."""
    from mofa_tpu.kernels.attention import dot_product_attention
    q, k, v = _mk(40, 7, 5, 64)
    out = dot_product_attention(q, k, v)
    ref = _short_attn_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


# ------------------------------------------------- tmajor (spatial-major)

def _mk_tmajor(b, nf, s, h, d, dtype=jnp.float32, seed=3):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (b * nf, s, h * d)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


@pytest.mark.parametrize("b,nf,s,h,d", [
    (2, 7, 64, 5, 64),    # SVD temporal family (CFG pair x 7 frames)
    (1, 25, 30, 5, 64),   # keypoint window length, ragged s (pads)
    (2, 3, 16, 2, 32),    # tiny
])
def test_short_attention_tmajor_matches_reference(b, nf, s, h, d):
    from mofa_tpu.kernels.short_attention import (short_attention_tmajor,
                                                  _tmajor_ref)
    q2, k2, v2 = _mk_tmajor(b, nf, s, h, d)
    got = short_attention_tmajor(q2, k2, v2, nf, h)
    ref = _tmajor_ref(q2, k2, v2, nf, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # fixed-max variant (the on-chip default) stays exact at O(1) logits
    got_fm = short_attention_tmajor(q2, k2, v2, nf, h, 0, True)
    np.testing.assert_allclose(np.asarray(got_fm), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_tmajor_equals_classic_layout():
    """The tmajor kernel on spatial-major rows == the classic kernel on
    the transposed layout (same sequences, different row order)."""
    b, nf, s, h, d = 2, 7, 32, 5, 64
    q2, k2, v2 = _mk_tmajor(b, nf, s, h, d, seed=5)

    def to_classic(x):      # [B*T, S, HD] -> [B*S, T, H, D]
        return (x.reshape(b, nf, s, h, d).transpose(0, 2, 1, 3, 4)
                .reshape(b * s, nf, h, d))

    from mofa_tpu.kernels.short_attention import (short_attention,
                                                  short_attention_tmajor)
    got = short_attention_tmajor(q2, k2, v2, nf, h)
    want = short_attention(to_classic(q2), to_classic(k2), to_classic(v2))
    want = (want.reshape(b, s, nf, h * d).transpose(0, 2, 1, 3)
            .reshape(b * nf, s, h * d))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_tmajor_grad_matches_reference():
    from mofa_tpu.kernels.short_attention import (short_attention_tmajor,
                                                  _tmajor_ref)
    q2, k2, v2 = _mk_tmajor(1, 5, 16, 2, 16, seed=7)

    def loss_kernel(q, k, v):
        return jnp.sum(jnp.square(short_attention_tmajor(q, k, v, 5, 2)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(_tmajor_ref(q, k, v, 5, 2)))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q2, k2, v2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q2, k2, v2)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)
