"""wav2vec 2.0 audio encoder in flax (base / post-norm variant).

The reference audio pipelines wrap HF's torch Wav2Vec2Model with a
frame-rate linear interpolation of the conv features
(/root/reference/MOFA-Video-Hybrid/aniportrait/src/audio_models/wav2vec2.py:
30-33); transformers' own Flax port implements only the stable-layer-norm
(large) variant, so the base (post-norm, grouped-feature-norm) encoder used
by AniPortrait (wav2vec2-base-960h, configs/inference_audio.yaml) is
implemented here natively.

Structure (HF modeling_wav2vec2.py semantics):
  feature_extractor: 7 convs (512ch; kernels 10,3,3,3,3,2,2; strides
    5,2,2,2,2,2,2; bias-free; GroupNorm(512) after conv0 only; GELU)
  -> linear interpolation (align_corners=True) to the VIDEO frame count
  -> feature_projection: LayerNorm + Dense(768)
  -> encoder: weight-normed grouped positional conv (k=128, groups=16,
     remove-one pad, GELU) + LayerNorm, then 12 post-norm blocks
     (MHA(12 heads, biased qkv/out) -> +res -> LN -> FFN(3072, GELU)
      -> +res -> LN).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: int = 512
    conv_kernels: tuple = (10, 3, 3, 3, 3, 2, 2)
    conv_strides: tuple = (5, 2, 2, 2, 2, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5


TINY_W2V_CONFIG = Wav2Vec2Config(hidden_size=32, num_layers=2, num_heads=4,
                                 intermediate_size=64, conv_dim=16)


def interpolate_linear_to(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """[B, T, C] -> [B, out_len, C], torch F.interpolate(mode='linear',
    align_corners=True) semantics."""
    from mofa_tpu.ops.resize import interp_matrix
    m = jnp.asarray(interp_matrix(x.shape[1], out_len, "bilinear",
                                  align_corners=True))
    return jnp.einsum("ot,btc->boc", m, x.astype(jnp.float32)).astype(x.dtype)


class FeatureExtractor(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        """[B, samples] -> [B, frames, conv_dim]."""
        x = audio[:, :, None]
        for i, (k, s) in enumerate(zip(self.cfg.conv_kernels,
                                       self.cfg.conv_strides)):
            x = nn.Conv(self.cfg.conv_dim, (k,), strides=(s,), padding="VALID",
                        use_bias=False, dtype=x.dtype,
                        name=f"conv_layers_{i}_conv")(x)
            if i == 0:
                x = nn.GroupNorm(num_groups=self.cfg.conv_dim,
                                 epsilon=self.cfg.layer_norm_eps,
                                 name="conv_layers_0_layer_norm")(x)
            x = nn.gelu(x, approximate=False)
        return x


class EncoderLayer(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = x
        d = c.hidden_size
        q = nn.Dense(d, dtype=x.dtype, name="attention_q_proj")(h)
        k = nn.Dense(d, dtype=x.dtype, name="attention_k_proj")(h)
        v = nn.Dense(d, dtype=x.dtype, name="attention_v_proj")(h)
        b, t, _ = q.shape
        hd = d // c.num_heads
        scale = hd ** -0.5
        qh = q.reshape(b, t, c.num_heads, hd)
        kh = k.reshape(b, t, c.num_heads, hd)
        vh = v.reshape(b, t, c.num_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(b, t, d)
        attn = nn.Dense(d, dtype=x.dtype, name="attention_out_proj")(attn)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(x + attn)
        ff = nn.Dense(c.intermediate_size, dtype=x.dtype,
                      name="feed_forward_intermediate_dense")(x)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dense(d, dtype=x.dtype, name="feed_forward_output_dense")(ff)
        return nn.LayerNorm(epsilon=c.layer_norm_eps,
                            name="final_layer_norm")(x + ff)


class Wav2Vec2Encoder(nn.Module):
    """Full encoder with the reference's frame-rate interpolation hook."""

    cfg: Wav2Vec2Config = Wav2Vec2Config()

    @nn.compact
    def __call__(self, audio: jnp.ndarray, seq_len: int) -> jnp.ndarray:
        """audio [B, samples] (feature-extractor-normalized) ->
        hidden states [B, seq_len, hidden]."""
        c = self.cfg
        feats = FeatureExtractor(c, name="feature_extractor")(audio)
        feats = interpolate_linear_to(feats, seq_len)

        x = nn.LayerNorm(epsilon=c.layer_norm_eps,
                         name="feature_projection_layer_norm")(feats)
        x = nn.Dense(c.hidden_size, dtype=x.dtype,
                     name="feature_projection_projection")(x)

        # positional conv embedding (weight norm merged at conversion time)
        k = c.num_conv_pos_embeddings
        pos = nn.Conv(c.hidden_size, (k,), padding=[(k // 2, k // 2)],
                      feature_group_count=c.num_conv_pos_embedding_groups,
                      dtype=x.dtype, name="pos_conv_embed_conv")(x)
        if k % 2 == 0:
            pos = pos[:, :-1]
        x = x + nn.gelu(pos, approximate=False)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="encoder_layer_norm")(x)

        for i in range(c.num_layers):
            x = EncoderLayer(c, name=f"layers_{i}")(x)
        return x


def normalize_audio(samples: np.ndarray) -> np.ndarray:
    """Wav2Vec2FeatureExtractor zero-mean unit-variance normalization."""
    samples = np.asarray(samples, np.float32)
    return (samples - samples.mean()) / np.sqrt(samples.var() + 1e-7)
