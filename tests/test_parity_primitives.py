"""Numerics parity of Flax primitives + weight converter vs torch."""

import numpy as np
import torch
import torch.nn as tnn
import jax
import jax.numpy as jnp

from mofa_tpu.models.layers import GroupNorm, LayerNorm, Attention
from mofa_tpu.models.resnet_blocks import ResnetBlock2D, TemporalResnetBlock
from mofa_tpu.models.weights import convert_torch_state_dict


def _nchw(x):
    return torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy())


def _nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


def test_groupnorm_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 7, 32).astype(np.float32)
    m = GroupNorm(8, 1e-5)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tm = tnn.GroupNorm(8, 32, eps=1e-5)
    with torch.no_grad():
        tm.weight.copy_(torch.randn(32))
        tm.bias.copy_(torch.randn(32))
    params["params"]["scale"] = jnp.asarray(tm.weight.detach().numpy())
    params["params"]["bias"] = jnp.asarray(tm.bias.detach().numpy())
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    ref = _nhwc(tm(_nchw(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_layernorm_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(3, 7, 16).astype(np.float32)
    m = LayerNorm()
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    ref = tnn.functional.layer_norm(torch.from_numpy(x), (16,)).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


class _TorchResnetBlock2D(tnn.Module):
    """diffusers-naming spatial resnet block for converter round-trip."""

    def __init__(self, cin, cout, temb=16, eps=1e-6):
        super().__init__()
        self.norm1 = tnn.GroupNorm(32, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb, cout)
        self.norm2 = tnn.GroupNorm(32, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        h = tnn.functional.silu(self.norm1(x))
        h = self.conv1(h)
        h = h + self.time_emb_proj(tnn.functional.silu(temb))[:, :, None, None]
        h = tnn.functional.silu(self.norm2(h))
        h = self.conv2(h)
        sc = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return sc + h


def test_resnet_block_converter_roundtrip():
    torch.manual_seed(0)
    rng = np.random.RandomState(2)
    cin, cout = 32, 64
    x = rng.randn(2, 8, 8, cin).astype(np.float32)
    temb = rng.randn(2, 16).astype(np.float32)

    tm = _TorchResnetBlock2D(cin, cout)
    m = ResnetBlock2D(cout, eps=1e-6)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(temb))
    params = convert_torch_state_dict(params, tm.state_dict())
    got = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(temb)))
    with torch.no_grad():
        ref = _nhwc(tm(_nchw(x), torch.from_numpy(temb)))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


class _TorchAttention(tnn.Module):
    def __init__(self, dim, heads, ctx_dim=None):
        super().__init__()
        ctx = ctx_dim or dim
        self.to_q = tnn.Linear(dim, dim, bias=False)
        self.to_k = tnn.Linear(ctx, dim, bias=False)
        self.to_v = tnn.Linear(ctx, dim, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(dim, dim)])
        self.heads = heads

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, l, d = x.shape
        hd = d // self.heads
        q = self.to_q(x).view(b, l, self.heads, hd).transpose(1, 2)
        k = self.to_k(ctx).view(b, -1, self.heads, hd).transpose(1, 2)
        v = self.to_v(ctx).view(b, -1, self.heads, hd).transpose(1, 2)
        o = tnn.functional.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, l, d)
        return self.to_out[0](o)


def test_attention_converter_roundtrip():
    torch.manual_seed(1)
    rng = np.random.RandomState(3)
    dim, heads, ctx_dim = 32, 4, 24
    x = rng.randn(2, 10, dim).astype(np.float32)
    ctx = rng.randn(2, 5, ctx_dim).astype(np.float32)

    tm = _TorchAttention(dim, heads, ctx_dim)
    m = Attention(heads, dim // heads, cross_attention_dim=ctx_dim)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ctx))
    params = convert_torch_state_dict(params, tm.state_dict())
    got = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(ctx)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(ctx)).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


class _TorchTemporalResnet(tnn.Module):
    def __init__(self, c, temb=16, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(32, c, eps=eps)
        self.conv1 = tnn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))
        self.time_emb_proj = tnn.Linear(temb, c)
        self.norm2 = tnn.GroupNorm(32, c, eps=eps)
        self.conv2 = tnn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, x, temb):
        # x [B, C, T, H, W]; temb [B, T, temb]
        h = tnn.functional.silu(self.norm1(x))
        h = self.conv1(h)
        t = self.time_emb_proj(tnn.functional.silu(temb))[:, :, :, None, None]
        h = h + t.permute(0, 2, 1, 3, 4)
        h = tnn.functional.silu(self.norm2(h))
        h = self.conv2(h)
        return x + h


def test_temporal_resnet_converter_roundtrip():
    torch.manual_seed(2)
    rng = np.random.RandomState(4)
    c, B, T = 32, 1, 4
    x = rng.randn(B, T, 5, 6, c).astype(np.float32)
    temb = rng.randn(B, T, 16).astype(np.float32)

    tm = _TorchTemporalResnet(c)
    m = TemporalResnetBlock(c, eps=1e-5)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(temb))
    params = convert_torch_state_dict(params, tm.state_dict())
    got = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(temb)))
    with torch.no_grad():
        tx = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)).copy())
        ref = tm(tx, torch.from_numpy(temb)).numpy()
    ref = np.transpose(ref, (0, 2, 3, 4, 1))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)
