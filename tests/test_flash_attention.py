"""Flash attention vs naive reference: forward + VJP, padded and exact sizes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mofa_tpu.kernels.flash_attention import flash_attention


def naive(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32)).astype(q.dtype)


@pytest.mark.parametrize("l", [256, 300, 1024])
def test_forward_matches_naive(l):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    b, h, d = 2, 3, 64
    q = jax.random.normal(kq, (b, l, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, l, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, l, h, d), jnp.float32)
    out = flash_attention(q, k, v, 128, 128)
    ref = naive(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_vjp_matches_naive():
    key = jax.random.PRNGKey(1)
    kq, kk, kv, kg = jax.random.split(key, 4)
    b, l, h, d = 1, 260, 2, 64
    q = jax.random.normal(kq, (b, l, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, l, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, l, h, d), jnp.float32)
    g = jax.random.normal(kg, (b, l, h, d), jnp.float32)

    _, vjp_flash = jax.vjp(lambda a, b_, c: flash_attention(a, b_, c, 128, 128),
                           q, k, v)
    _, vjp_naive = jax.vjp(naive, q, k, v)
    for got, want in zip(vjp_flash(g), vjp_naive(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("l", [256, 300])
def test_fixed_max_matches_naive(l):
    """Clamped no-running-max softmax: exact for logits far below the
    clamp (these are), incl. the padded-tail mask and the VJP (the lse
    it emits is the same log-sum-exp, so the backward is shared)."""
    key = jax.random.PRNGKey(3)
    kq, kk, kv, kg = jax.random.split(key, 4)
    b, h, d = 2, 3, 64
    q = jax.random.normal(kq, (b, l, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, l, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, l, h, d), jnp.float32)
    out = flash_attention(q, k, v, 128, 128, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(naive(q, k, v)),
                               atol=2e-5, rtol=2e-5)

    g = jax.random.normal(kg, (b, l, h, d), jnp.float32)
    _, vjp_fixed = jax.vjp(
        lambda a, b_, c: flash_attention(a, b_, c, 128, 128, True), q, k, v)
    _, vjp_naive = jax.vjp(naive, q, k, v)
    for got, want in zip(vjp_fixed(g), vjp_naive(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4, rtol=5e-4)


def test_fixed_max_all_tiny_logits_no_nan():
    """A row whose logits ALL underflow exp2 (base-2 logits < -126) must
    return 0, not 0/0 NaN (ADVICE r2: the no-running-max path's one
    failure mode the online-max softmax cannot hit)."""
    b, l, h, d = 1, 256, 1, 64
    # q rows scaled so every logit is ~ -1e5: exp2 underflows everywhere
    q = jnp.full((b, l, h, d), -50.0, jnp.float32)
    k = jnp.full((b, l, h, d), 50.0, jnp.float32)
    v = jnp.ones((b, l, h, d), jnp.float32)
    out = flash_attention(q, k, v, 128, 128, True)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_forced_flash_short_unaligned_seq():
    """Explicit impl='flash' on a short sequence (temporal L=25): dispatch
    floors block_k at 128 (pad+mask) so Pallas gets sublane-aligned blocks
    (ADVICE r2)."""
    from mofa_tpu.kernels import attention
    b, l, h, d = 2, 25, 5, 64
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(kq, (b, l, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, l, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, l, h, d), jnp.float32)
    attention.set_attention_impl("flash")
    try:
        out = attention.dot_product_attention(q, k, v)
    finally:
        attention.set_attention_impl("auto")
    np.testing.assert_allclose(np.asarray(out), np.asarray(naive(q, k, v)),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("shape", [(12, 7, 5, 64),   # SVD temporal, packs 3
                                   (7, 7, 5, 8),     # padding (7 % 3 != 0)
                                   (6, 25, 5, 16),   # 25-frame clip, nb=1
                                   (5, 3, 2, 4)])
def test_packed_short_attention_matches_naive(shape):
    from mofa_tpu.kernels.attention import (_packed_short_attention,
                                            dot_product_attention)
    b, l, h, d = shape
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(kq, (b, l, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, l, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, l, h, d), jnp.float32)
    np.testing.assert_allclose(np.asarray(_packed_short_attention(q, k, v)),
                               np.asarray(naive(q, k, v)),
                               atol=2e-5, rtol=2e-5)
    # the auto dispatcher routes short self-attention to the packed path
    np.testing.assert_allclose(np.asarray(dot_product_attention(q, k, v)),
                               np.asarray(naive(q, k, v)),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("lk,bk", [(2500, 512), (1024, 256), (37, 16)])
def test_chunked_xla_attention_matches_naive(lk, bk):
    """The sharded-execution spatial path (kernels/attention.py
    _chunked_xla_attention): exact online-softmax over K/V chunks incl.
    the ragged-tail -inf masking — logits never materialize at
    [B, H, Lq, Lk] and the gathered K/V stay in the input dtype."""
    from mofa_tpu.kernels.attention import _chunked_xla_attention

    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    b, lq, h, d = 2, 48, 3, 16
    q = jax.random.normal(ks[0], (b, lq, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, lk, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, lk, h, d), jnp.float32)
    got = np.asarray(_chunked_xla_attention(q, k, v, bk=bk))
    want = np.asarray(naive(q, k, v))
    np.testing.assert_allclose(got, want, atol=5e-6, rtol=5e-6)
