import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mofa_tpu.kernels.softsplat import (
    softsplat, splat_raw, softsplat_oracle_np,
)


def _rand_case(B=2, H=13, W=17, C=5, scale=4.0, seed=0):
    rng = np.random.RandomState(seed)
    inp = rng.randn(B, H, W, C).astype(np.float32)
    flow = (rng.rand(B, H, W, 2).astype(np.float32) * 2 - 1) * scale
    return inp, flow


@pytest.mark.parametrize("backend", ["xla", "matmul"])
def test_splat_raw_matches_oracle(backend):
    inp, flow = _rand_case()
    ref = softsplat_oracle_np(inp, flow)
    got = np.asarray(splat_raw(jnp.asarray(inp), jnp.asarray(flow), backend))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_splat_nonfinite_flow_skipped():
    inp, flow = _rand_case(B=1, H=6, W=6, C=2)
    flow[0, 2, 3, 0] = np.nan
    flow[0, 4, 1, 1] = np.inf
    ref = softsplat_oracle_np(inp, flow)
    got = np.asarray(splat_raw(jnp.asarray(inp), jnp.asarray(flow), "xla"))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_avg_mode_matches_manual_normalization():
    inp, flow = _rand_case(B=1, H=8, W=8, C=3, scale=2.0)
    ones = np.ones((1, 8, 8, 1), np.float32)
    raw = softsplat_oracle_np(np.concatenate([inp, ones], -1), flow)
    ref = raw[..., :-1] / (raw[..., -1:] + 1e-7)
    got = np.asarray(softsplat(jnp.asarray(inp), jnp.asarray(flow), None, "avg"))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_zero_flow_identity_avg():
    inp, _ = _rand_case(B=1, H=8, W=8, C=3)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    got = np.asarray(softsplat(jnp.asarray(inp), jnp.asarray(flow), None, "avg"))
    np.testing.assert_allclose(got, inp, rtol=1e-4, atol=1e-4)


def test_soft_mode_with_metric():
    inp, flow = _rand_case(B=1, H=8, W=8, C=2, scale=1.5)
    rng = np.random.RandomState(3)
    metric = rng.randn(1, 8, 8, 1).astype(np.float32)
    m = np.exp(metric)
    raw = softsplat_oracle_np(np.concatenate([inp * m, m], -1), flow)
    ref = raw[..., :-1] / (raw[..., -1:] + 1e-7)
    got = np.asarray(softsplat(jnp.asarray(inp), jnp.asarray(flow), jnp.asarray(metric), "soft"))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("backend", ["xla", "matmul"])
def test_custom_vjp_matches_autodiff_of_scatter(backend):
    """The hand VJP must equal autodiff of the (differentiable) scatter
    formulation — which itself matches the CUDA ingrad/flowgrad math."""
    inp, flow = _rand_case(B=1, H=7, W=9, C=3, scale=2.0, seed=5)

    def auto_fn(i, f):
        # plain differentiable scatter formulation (no custom_vjp)
        B, H, W, C = i.shape
        cols = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        rows = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        tx = cols + f[..., 0]
        ty = rows + f[..., 1]
        x0 = jnp.floor(tx)
        y0 = jnp.floor(ty)
        out = jnp.zeros((B, H * W, C))
        src = i.reshape(B, H * W, C)
        for xi, yi, w in (
            (x0, y0, (x0 + 1 - tx) * (y0 + 1 - ty)),
            (x0 + 1, y0, (tx - x0) * (y0 + 1 - ty)),
            (x0, y0 + 1, (x0 + 1 - tx) * (ty - y0)),
            (x0 + 1, y0 + 1, (tx - x0) * (ty - y0)),
        ):
            inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            flat = (jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)).astype(jnp.int32)
            flat = jnp.where(inside, flat, H * W).reshape(B, H * W)
            vals = src * (w * inside).reshape(B, H * W)[..., None]
            out = out.at[jnp.arange(B)[:, None], flat].add(vals, mode="drop")
        return out.reshape(B, H, W, C)

    def loss_custom(i, f):
        return jnp.sum(jnp.sin(splat_raw(i, f, backend)))

    def loss_auto(i, f):
        return jnp.sum(jnp.sin(auto_fn(i, f)))

    gi_c, gf_c = jax.grad(loss_custom, argnums=(0, 1))(jnp.asarray(inp), jnp.asarray(flow))
    gi_a, gf_a = jax.grad(loss_auto, argnums=(0, 1))(jnp.asarray(inp), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(gi_c), np.asarray(gi_a), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf_c), np.asarray(gf_a), rtol=1e-4, atol=1e-5)


def test_grad_through_avg_mode_finite():
    inp, flow = _rand_case(B=1, H=8, W=8, C=3)

    def loss(i, f):
        return jnp.sum(softsplat(i, f, None, "avg") ** 2)

    gi, gf = jax.grad(loss, argnums=(0, 1))(jnp.asarray(inp), jnp.asarray(flow))
    assert np.all(np.isfinite(np.asarray(gi)))
    assert np.all(np.isfinite(np.asarray(gf)))


def test_bfloat16_inputs_cast_like_reference():
    inp, flow = _rand_case(B=1, H=8, W=8, C=3)
    out16 = softsplat(jnp.asarray(inp, jnp.bfloat16), jnp.asarray(flow, jnp.bfloat16), None, "avg")
    assert out16.dtype == jnp.bfloat16


def test_pallas_backend_matches_oracle():
    import numpy as np
    import jax.numpy as jnp
    from mofa_tpu.kernels.softsplat import splat_raw, softsplat_oracle_np
    rng = np.random.RandomState(3)
    inp = rng.randn(2, 12, 20, 7).astype(np.float32)
    flow = (rng.randn(2, 12, 20, 2) * 4).astype(np.float32)
    flow[0, 0, 0, 0] = np.nan          # non-finite flow is skipped
    got = np.asarray(splat_raw(jnp.asarray(inp), jnp.asarray(flow), "pallas"))
    want = softsplat_oracle_np(inp, flow)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_pallas_backend_vjp_matches_xla():
    import jax
    import numpy as np
    import jax.numpy as jnp
    from mofa_tpu.kernels.softsplat import splat_raw
    rng = np.random.RandomState(4)
    inp = jnp.asarray(rng.randn(1, 8, 12, 3).astype(np.float32))
    flow = jnp.asarray((rng.randn(1, 8, 12, 2) * 2).astype(np.float32))
    g = jnp.asarray(rng.randn(1, 8, 12, 3).astype(np.float32))
    _, vjp_p = jax.vjp(lambda a, b: splat_raw(a, b, "pallas"), inp, flow)
    _, vjp_x = jax.vjp(lambda a, b: splat_raw(a, b, "xla"), inp, flow)
    for got, want in zip(vjp_p(g), vjp_x(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)
