"""Fused GEGLU FFN kernel vs the plain-jnp reference: forward + VJP."""

import jax
import jax.numpy as jnp
import numpy as np

from mofa_tpu.kernels.geglu_ffn import geglu_ffn, _ffn_ref


def _make(r, c, dtype=jnp.float32):
    i = 4 * c
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (r, c), dtype)
    w0 = jax.random.normal(ks[1], (c, 2 * i), dtype) * 0.05
    b0 = jax.random.normal(ks[2], (2 * i,), dtype) * 0.05
    w2 = jax.random.normal(ks[3], (i, c), dtype) * 0.05
    b2 = jax.random.normal(ks[4], (c,), dtype) * 0.05
    return x, w0, b0, w2, b2


def test_forward_matches_reference():
    # 320-channel config at a row count divisible by the 512 block
    x, w0, b0, w2, b2 = _make(1024, 320)
    got = geglu_ffn(x, w0, b0, w2, b2)
    ref = _ffn_ref(x, w0, b0, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_forward_3d_input():
    x, w0, b0, w2, b2 = _make(1024, 320)
    x3 = x.reshape(2, 512, 320)
    got = geglu_ffn(x3, w0, b0, w2, b2)
    ref = _ffn_ref(x3, w0, b0, w2, b2)
    assert got.shape == x3.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_vjp_matches_reference():
    x, w0, b0, w2, b2 = _make(512, 320)
    g = jax.random.normal(jax.random.PRNGKey(7), x.shape, x.dtype)
    _, vjp_fused = jax.vjp(geglu_ffn, x, w0, b0, w2, b2)
    _, vjp_ref = jax.vjp(_ffn_ref, x, w0, b0, w2, b2)
    for got, want in zip(vjp_fused(g), vjp_ref(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, rtol=5e-5)


def test_fp32_params_bf16_input():
    # weights stay fp32 in the param tree; input rides bf16
    x, w0, b0, w2, b2 = _make(512, 320)
    out = geglu_ffn(x.astype(jnp.bfloat16), w0, b0, w2, b2)
    assert out.dtype == jnp.bfloat16
    ref = _ffn_ref(x.astype(jnp.bfloat16), w0, b0, w2, b2)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_ln_ffn_matches_reference():
    from mofa_tpu.kernels.geglu_ffn import ln_geglu_ffn, _ln_ffn_ref
    x, w0, b0, w2, b2 = _make(512, 320)
    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    ls = 1.0 + 0.1 * jax.random.normal(ks[0], (320,))
    lb = 0.1 * jax.random.normal(ks[1], (320,))
    got = ln_geglu_ffn(x, ls, lb, w0, b0, w2, b2)
    ref = _ln_ffn_ref(x, ls, lb, w0, b0, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)
    # VJP
    g = jax.random.normal(jax.random.PRNGKey(9), x.shape, x.dtype)
    _, vjp_fused = jax.vjp(ln_geglu_ffn, x, ls, lb, w0, b0, w2, b2)
    _, vjp_ref = jax.vjp(_ln_ffn_ref, x, ls, lb, w0, b0, w2, b2)
    for a, b in zip(vjp_fused(g), vjp_ref(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_fused_branch_param_tree_and_output(monkeypatch):
    """The fused ln_ff_residual branch must create the SAME param tree as
    the unfused LayerNorm+FeedForward branch and compute the same values
    (checked in interpret mode on CPU by forcing the gate)."""
    import mofa_tpu.kernels.geglu_ffn as gf
    from mofa_tpu.models.transformer_blocks import BasicTransformerBlock

    m = BasicTransformerBlock(2, 16, cross_attention_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 512, 32))
    ehs = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 32))

    shapes_ref = jax.eval_shape(m.init, jax.random.PRNGKey(2), x, ehs)
    params = m.init(jax.random.PRNGKey(2), x, ehs)
    out_ref = m.apply(params, x, ehs)

    monkeypatch.setattr(gf, "fused_ffn_applicable",
                        lambda rows, dim, dim_out: dim_out == dim
                        and rows % 512 == 0)
    monkeypatch.setitem(gf._BLOCK_ROWS, 32, 512)
    shapes_fused = jax.eval_shape(m.init, jax.random.PRNGKey(2), x, ehs)
    assert (jax.tree_util.tree_structure(shapes_ref)
            == jax.tree_util.tree_structure(shapes_fused))
    for a, b in zip(jax.tree_util.tree_leaves(shapes_ref),
                    jax.tree_util.tree_leaves(shapes_fused)):
        assert a.shape == b.shape and a.dtype == b.dtype
    out_fused = m.apply(params, x, ehs)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=5e-5, rtol=5e-5)


def test_tanh_variant_error_bound():
    """variant='tanh' (opt-in A/B: tanh-approx gelu) must stay within the
    documented ~3e-4 absolute error of the exact-erf plain kernel."""
    import numpy as np
    from mofa_tpu.kernels.geglu_ffn import _ln_ffn_fwd, _BLOCK_ROWS

    c = 320
    rows = _BLOCK_ROWS[c] * 2
    i = 4 * c
    ks = jax.random.split(jax.random.PRNGKey(3), 7)
    x = jax.random.normal(ks[0], (rows, c), jnp.float32)
    ls = 1 + 0.1 * jax.random.normal(ks[1], (c,), jnp.float32)
    lb = 0.1 * jax.random.normal(ks[2], (c,), jnp.float32)
    w0 = jax.random.normal(ks[3], (c, 2 * i), jnp.float32) * 0.05
    b0 = jax.random.normal(ks[4], (2 * i,), jnp.float32) * 0.05
    w2 = jax.random.normal(ks[5], (i, c), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[6], (c,), jnp.float32) * 0.05
    plain = np.asarray(_ln_ffn_fwd(x, ls, lb, w0, b0, w2, b2,
                                   variant="plain"))
    tanh = np.asarray(_ln_ffn_fwd(x, ls, lb, w0, b0, w2, b2,
                                  variant="tanh"))
    err = np.max(np.abs(plain - tanh))
    # per-element gelu err ~3e-4 x |w2| row sums ~ stays small after GEMM2
    assert err < 5e-3, err
    assert not np.allclose(plain, tanh)   # actually a different path
