"""CLIP vision encoder with projection (ViT-H/14 by default), Flax NHWC.

Replaces `CLIPVisionModelWithProjection` loaded at
/root/reference/MOFA-Video-Traj/run_gradio.py:98 (laion CLIP-ViT-H-14 as
shipped inside SVD-XT). Returns `image_embeds` = visual_projection of the
post-layernormed CLS token.

Note the reference pipeline feeds the encoder [0,1]-range antialias-resized
pixels WITHOUT CLIP mean/std normalization (pipeline.py:114-133 drops the
feature-extractor step) — callers here do the same for parity.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from mofa_tpu.models.layers import LayerNorm, Dense
from mofa_tpu.kernels.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_layers: int = 32
    num_heads: int = 16
    patch_size: int = 14
    image_size: int = 224
    projection_dim: int = 1024
    hidden_act: str = "gelu"


TINY_CLIP_CONFIG = CLIPVisionConfig(
    hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2,
    patch_size=32, image_size=64, projection_dim=32)


class CLIPAttention(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        b, l, d = x.shape
        hd = c.hidden_size // c.num_heads
        q = Dense(c.hidden_size, name="q_proj")(x).reshape(b, l, c.num_heads, hd)
        k = Dense(c.hidden_size, name="k_proj")(x).reshape(b, l, c.num_heads, hd)
        v = Dense(c.hidden_size, name="v_proj")(x).reshape(b, l, c.num_heads, hd)
        out = dot_product_attention(q, k, v)
        return Dense(c.hidden_size, name="out_proj")(out.reshape(b, l, d))


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = CLIPAttention(c, name="self_attn")(LayerNorm(name="layer_norm1")(x)) + x
        h = LayerNorm(name="layer_norm2")(x)
        h = Dense(c.intermediate_size, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False) if c.hidden_act == "gelu" else h * nn.sigmoid(1.702 * h)
        return Dense(c.hidden_size, name="mlp_fc2")(h) + x


class CLIPVisionModelWithProjection(nn.Module):
    cfg: CLIPVisionConfig = CLIPVisionConfig()

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values [B, H, W, 3] -> image_embeds [B, projection_dim]."""
        c = self.cfg
        b = pixel_values.shape[0]
        patches = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                          strides=(c.patch_size, c.patch_size), use_bias=False,
                          dtype=pixel_values.dtype, name="patch_embedding")(pixel_values)
        patches = patches.reshape(b, -1, c.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.hidden_size,), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(patches.dtype), (b, 1, c.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        npos = (c.image_size // c.patch_size) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (npos, c.hidden_size), jnp.float32)
        x = x + pos.astype(x.dtype)[None]
        x = LayerNorm(name="pre_layrnorm")(x)
        for i in range(c.num_layers):
            x = CLIPEncoderLayer(c, name=f"layers_{i}")(x)
        pooled = LayerNorm(name="post_layernorm")(x[:, 0])
        return Dense(c.projection_dim, use_bias=False, name="visual_projection")(pooled)
