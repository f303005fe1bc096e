"""Primitive layers for the SVD UNet family (Flax, NHWC, bf16-ready).

Numerics match torch/diffusers 0.24 primitives so that converted
checkpoints reproduce reference activations:
- sinusoidal timestep embedding (flip_sin_to_cos=True, downscale_freq_shift=0)
- GroupNorm over channel-last layout, fp32 statistics
- Attention: qkv bias-free, out-proj bias, scale 1/sqrt(head_dim)
- GEGLU feed-forward
Module/parameter names mirror diffusers so the torch->jax converter is a
name map plus kernel transposes (OIHW -> HWIO).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def get_timestep_embedding(timesteps: jnp.ndarray, embedding_dim: int,
                           flip_sin_to_cos: bool = True,
                           downscale_freq_shift: float = 0.0,
                           max_period: float = 10000.0) -> jnp.ndarray:
    """diffusers get_timestep_embedding; timesteps [N] -> [N, embedding_dim], fp32."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GroupNorm(nn.Module):
    """GroupNorm over NHWC (or N...C) with fp32 statistics."""

    num_groups: int = 32
    eps: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pool_leading: int = 1):
        """pool_leading=K: stats are pooled over groups of K consecutive
        leading-dim samples (rows r*K..r*K+K-1 share mean/var). This is
        how the temporal resnets express torch's 5-D GroupNorm (stats
        over C/G x T x H x W per video) WITHOUT reshaping the activation
        to [B, T, HW, C]: the 4-D cross-frame reduce made XLA relayout
        the fp32 intermediate HW-minor (~0.5 ms per site at the /8 bench
        shape, device trace 2026-08-20); per-row partials on the natural
        [B*T, HW, C] rows reduce over lanes-friendly axes only."""
        c = x.shape[-1]
        g = self.num_groups
        assert c % g == 0, (c, g)
        dt = x.dtype
        scale_p = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias_p = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        # NOTE: a one-pass Pallas stats kernel (kernels/group_norm.py) was
        # measured against this formulation on-chip: 1.53 vs 1.42 ms at
        # [14,72,128,320] (copy floor 1.22 ms) and a 0.406 -> 0.386
        # frames/s e2e regression from lost XLA fusion — this jnp path IS
        # the fast one; the kernel stays as a documented experiment.
        xf = x.astype(jnp.float32)
        # Keep C in the lane dimension for the big reduces: reshaping the
        # activation to [N, HW, G, C/G] makes C/G (e.g. 10) the lane dim,
        # which pads every 128-lane tile ~92% empty and forces full-tensor
        # relayout copies (measured ~30 ms/step at the bench shape).
        # Instead reduce over the spatial axes to per-channel partials
        # [N, C] and combine channels into groups on that tiny tensor.
        axes = tuple(range(1, xf.ndim - 1))
        import os
        if os.environ.get("MOFA_GN_ONEPASS", "") == "1":
            # MEASURED NEGATIVE, kept opt-in for the record (2026-08-21):
            # the T=25 cfg_split trace showed the stats as 449 separate
            # convert+reduce fusions/step (467 ms = 22%), suggesting the
            # two jnp.sum calls were two full-activation HBM passes. A
            # single variadic lax.reduce over (x, x^2) was tried and is
            # WORSE on-chip: denoise 52.64 -> 53.62 s (+1.9%) and the
            # chunked VAE decode program RESOURCE_EXHAUSTs (the variadic
            # reduce raises XLA:TPU's temp requirement and blocks the
            # fusions the independent reduces get). The two-reduce form
            # below stays the default.
            s1, s2 = jax.lax.reduce(
                (xf, jnp.square(xf)),
                (jnp.float32(0), jnp.float32(0)),
                lambda a, v: (a[0] + v[0], a[1] + v[1]), axes)  # [N, C] x2
        else:
            s1 = jnp.sum(xf, axis=axes)                   # [N, C]
            s2 = jnp.sum(jnp.square(xf), axis=axes)
        k = pool_leading
        if k > 1:
            # pool the per-row partials over each K-row block (tiny
            # [N, C] tensors — no big-activation relayout)
            s1 = s1.reshape(-1, k, c).sum(1)
            s2 = s2.reshape(-1, k, c).sum(1)
        n = (xf.size // xf.shape[0] // c) * (c // g) * k  # elems per group
        gs1 = s1.reshape(-1, g, c // g).sum(-1)
        gs2 = s2.reshape(-1, g, c // g).sum(-1)
        mean = gs1 / n
        var = jnp.maximum(gs2 / n - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.eps)
        if k > 1:
            mean = jnp.repeat(mean, k, axis=0)
            inv = jnp.repeat(inv, k, axis=0)
        bshape = (xf.shape[0],) + (1,) * (xf.ndim - 2) + (c,)
        mean_c = jnp.repeat(mean, c // g, axis=-1).reshape(bshape)
        inv_c = jnp.repeat(inv, c // g, axis=-1).reshape(bshape)
        return ((xf - mean_c) * (inv_c * scale_p) + bias_p).astype(dt)


class Conv(nn.Module):
    """3x3/1x1 conv wrapper, NHWC, optional zero-init (ControlNet zero convs)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    zero_init: bool = False
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        bias_init = nn.initializers.zeros
        k = self.kernel_size
        return nn.Conv(
            self.features, (k, k), strides=(self.stride, self.stride),
            padding=[(k // 2, k // 2)] * 2, use_bias=self.use_bias,
            kernel_init=init, bias_init=bias_init,
            param_dtype=self.param_dtype, dtype=x.dtype,
        )(x)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    zero_init: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        return nn.Dense(self.features, use_bias=self.use_bias, kernel_init=init,
                        param_dtype=self.param_dtype, dtype=x.dtype)(x)


class TimestepEmbedding(nn.Module):
    """linear_1 -> silu -> linear_2 (diffusers TimestepEmbedding)."""

    time_embed_dim: int
    out_dim: Optional[int] = None

    @nn.compact
    def __call__(self, sample):
        sample = Dense(self.time_embed_dim, name="linear_1")(sample)
        sample = nn.silu(sample)
        sample = Dense(self.out_dim or self.time_embed_dim, name="linear_2")(sample)
        return sample


class LayerNorm(nn.Module):
    eps: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        dt = x.dtype
        xf = x.astype(jnp.float32)
        # E[x^2] - mean^2 so both reduces read x independently and XLA
        # fuses them (jnp.var needs the mean first, serializing two
        # passes). A variadic one-pass lax.reduce variant is a MEASURED
        # NEGATIVE (see GroupNorm above) — opt-in via MOFA_GN_ONEPASS=1.
        import os
        if os.environ.get("MOFA_GN_ONEPASS", "") == "1":
            s1, s2 = jax.lax.reduce(
                (xf, jnp.square(xf)),
                (jnp.float32(0), jnp.float32(0)),
                lambda a, v: (a[0] + v[0], a[1] + v[1]), (xf.ndim - 1,))
            mean = s1[..., None] / c
            meansq = s2[..., None] / c
        else:
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            meansq = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        xf = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (xf * scale + bias).astype(dt)


class Attention(nn.Module):
    """diffusers Attention: to_q/to_k/to_v (no bias) + to_out (bias).

    tmajor_frames: when set to the frame count T, `hidden_states` arrives
    in the NATURAL spatial-major layout [B*T, S, C] (instead of the
    classic frames-adjacent [B*S, T, C]) and attention runs over the
    frame axis per spatial token via
    kernels/attention.py::temporal_attention_tmajor — eliminating the
    two physical transposes per temporal site. Cross-attention in this
    mode expects a PER-SPATIAL-TOKEN single-token context [B, S, 1, D].
    Param tree and math are identical to the classic layout (rowwise
    projections are row-order invariant; golden/parity tested)."""

    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None  # None => self-attention dims
    tmajor_frames: Optional[int] = None

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states=None):
        inner = self.heads * self.dim_head
        if self.tmajor_frames is not None:
            return self._tmajor(hidden_states, encoder_hidden_states, inner)
        ctx = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        if encoder_hidden_states is not None and ctx.shape[1] == 1:
            # Single context token (SVD cross-attends to one CLIP image
            # embedding): softmax over one key is exactly 1, so the
            # attention output equals V independent of Q — to_q/to_k and
            # the QK^T/PV matmuls are dead. Apply them to one token so
            # the param tree stays identical for weight converters; XLA
            # dead-code-eliminates the unused results.
            Dense(inner, use_bias=False, name="to_q")(hidden_states[:, :1])
            Dense(inner, use_bias=False, name="to_k")(ctx)
            v = Dense(inner, use_bias=False, name="to_v")(ctx)
            out = Dense(hidden_states.shape[-1], name="to_out_0")(v)
            return jnp.broadcast_to(
                out, hidden_states.shape[:2] + (out.shape[-1],))
        q = Dense(inner, use_bias=False, name="to_q")(hidden_states)
        k = Dense(inner, use_bias=False, name="to_k")(ctx)
        v = Dense(inner, use_bias=False, name="to_v")(ctx)
        b, lq, _ = q.shape
        lk = k.shape[1]
        q = q.reshape(b, lq, self.heads, self.dim_head)
        k = k.reshape(b, lk, self.heads, self.dim_head)
        v = v.reshape(b, lk, self.heads, self.dim_head)
        from mofa_tpu.kernels.attention import dot_product_attention
        out = dot_product_attention(q, k, v)
        out = out.reshape(b, lq, inner)
        return Dense(hidden_states.shape[-1], name="to_out_0")(out)

    def _tmajor(self, hidden_states, encoder_hidden_states, inner):
        """Spatial-major temporal attention (see class docstring)."""
        nf = self.tmajor_frames
        bt, s, ch = hidden_states.shape
        b = bt // nf
        if encoder_hidden_states is not None:
            # per-spatial-token single-token context [B, S, 1, D]:
            # softmax over one key == 1, so out == projected V per
            # (batch, spatial token), broadcast over frames. to_q/to_k
            # touch one token for param-tree parity (dead code, DCE'd).
            ctx = encoder_hidden_states
            assert ctx.ndim == 4 and ctx.shape[2] == 1, ctx.shape
            Dense(inner, use_bias=False, name="to_q")(hidden_states[:, :1])
            Dense(inner, use_bias=False, name="to_k")(ctx[:, :1, 0])
            v = Dense(inner, use_bias=False, name="to_v")(ctx[:, :, 0])
            out = Dense(ch, name="to_out_0")(v)          # [B, S, C]
            out = jnp.broadcast_to(out[:, None], (b, nf, s, ch))
            return out.reshape(bt, s, ch)
        from mofa_tpu.kernels.attention import temporal_attention_tmajor
        q = Dense(inner, use_bias=False, name="to_q")(hidden_states)
        k = Dense(inner, use_bias=False, name="to_k")(hidden_states)
        v = Dense(inner, use_bias=False, name="to_v")(hidden_states)
        out = temporal_attention_tmajor(q, k, v, nf, self.heads)
        return Dense(ch, name="to_out_0")(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward: proj (dim -> 8*dim), geglu, proj out (4*dim -> dim)."""

    dim_out: Optional[int] = None
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = dim * self.mult
        h = Dense(inner * 2, name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return Dense(self.dim_out or dim, name="net_2")(h)


class _KernelBias(nn.Module):
    """kernel/bias params with nn.Dense's names+inits (raw-array access)."""

    in_features: int
    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_features, self.features), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
        return k, b


class DenseParams(nn.Module):
    """Same param tree as the Dense wrapper (<name>/Dense_0/{kernel,bias})
    but returns the raw arrays instead of applying the matmul."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return _KernelBias(self.in_features, self.features, name="Dense_0")()


class LayerNormParams(nn.Module):
    """Same param tree as LayerNorm; returns (scale, bias)."""

    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,),
                       self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
        return s, b


class FeedForwardParams(nn.Module):
    """Same param tree as FeedForward; returns (w0, b0, w2, b2)."""

    dim: int
    dim_out: Optional[int] = None
    mult: int = 4

    @nn.compact
    def __call__(self):
        inner = self.dim * self.mult
        w0, b0 = DenseParams(self.dim, inner * 2, name="net_0_proj")()
        w2, b2 = DenseParams(inner, self.dim_out or self.dim, name="net_2")()
        return w0, b0, w2, b2


def ln_ff_residual(parent: nn.Module, x, ln_name: str, ff_name: str):
    """x + FeedForward(LayerNorm(x)) with params named <ln_name>/<ff_name>.

    All three FF sites in the SVD transformer blocks have this exact shape;
    on TPU at fusable shapes it runs as one Pallas kernel (VMEM-resident
    weights + GEGLU intermediate — kernels/geglu_ffn.py), saving ~2 HBM
    round trips of the full activation per site. The param tree is
    identical in both branches, so converted checkpoints load unchanged.
    """
    from mofa_tpu.kernels.geglu_ffn import fused_ffn_applicable, ln_geglu_ffn
    dim = x.shape[-1]
    rows = x.size // dim
    if fused_ffn_applicable(rows, dim, dim):
        ls, lb = LayerNormParams(dim, name=ln_name, parent=parent)()
        w0, b0, w2, b2 = FeedForwardParams(dim, name=ff_name, parent=parent)()
        return ln_geglu_ffn(x, ls, lb, w0, b0, w2, b2)
    h = LayerNorm(name=ln_name, parent=parent)(x)
    return FeedForward(name=ff_name, parent=parent)(h) + x


class AlphaBlender(nn.Module):
    """Learned spatial/temporal mixing (diffusers AlphaBlender).

    merge_strategy: "learned" (sigmoid(mix_factor) everywhere) or
    "learned_with_images" (alpha=1 where image_only_indicator else sigmoid).
    """

    merge_strategy: str = "learned_with_images"
    switch_spatial_to_temporal_mix: bool = False

    @nn.compact
    def __call__(self, x_spatial, x_temporal, image_only_indicator=None):
        mix = self.param("mix_factor", nn.initializers.constant(0.5), (1,), jnp.float32)
        if self.merge_strategy == "learned":
            alpha = jax.nn.sigmoid(mix)[0]
        elif self.merge_strategy == "learned_with_images":
            assert image_only_indicator is not None
            # image_only_indicator: [B, T]
            alpha = jnp.where(image_only_indicator.astype(bool),
                              jnp.ones((), jnp.float32), jax.nn.sigmoid(mix)[0])
            bsz, t = image_only_indicator.shape
            if x_spatial.shape[0] == bsz * t:       # [B*T, ...] layout
                alpha = alpha.reshape((bsz * t,) + (1,) * (x_spatial.ndim - 1))
            else:                                    # [B, T, ...] layout
                alpha = alpha.reshape((bsz, t) + (1,) * (x_spatial.ndim - 2))
        else:
            raise ValueError(self.merge_strategy)
        alpha = alpha.astype(x_spatial.dtype)
        if self.switch_spatial_to_temporal_mix:
            alpha = 1.0 - alpha
        return alpha * x_spatial + (1.0 - alpha) * x_temporal
