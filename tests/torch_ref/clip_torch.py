"""Independent torch transcription of CLIPVisionModelWithProjection.

The reference loads the SVD image encoder (laion CLIP-ViT-H-14 as shipped
inside stable-video-diffusion-img2vid-xt-1-1) via transformers at
/root/reference/MOFA-Video-Traj/run_gradio.py:98. transformers is present
in this image but its CLIP module pulls a processor/config machinery that
would dominate the test; this is a minimal from-scratch transcription of
exactly the forward semantics `CLIPVisionModelWithProjection` runs:

- CLIPVisionEmbeddings: bias-free patch conv (stride=patch), row-major
  (h, w) patch flatten, learned class token prepended, learned absolute
  position embedding added
- pre_layrnorm (typo preserved in the state-dict key)
- encoder layers: pre-LN MHA (biased q/k/v/out, scale applied to q) and
  pre-LN MLP (fc1 -> ACT2FN[hidden_act] -> fc2); hidden_act is "gelu"
  (exact erf) for ViT-H, "quick_gelu" (x*sigmoid(1.702x)) for OpenAI ViTs
- post_layernorm of the CLS token, then bias-free visual_projection

State-dict names follow transformers conventions
(`vision_model.encoder.layers.N...`, `visual_projection.weight`) so
`mofa_tpu.models.weights.convert_clip_vision_state_dict` exercises the
same key layout a real checkpoint has.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class _CLIPAttentionTorch(nn.Module):
    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.heads = heads
        self.head_dim = dim // heads
        self.scale = self.head_dim ** -0.5
        self.q_proj = nn.Linear(dim, dim)
        self.k_proj = nn.Linear(dim, dim)
        self.v_proj = nn.Linear(dim, dim)
        self.out_proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, l, d = x.shape
        q = self.q_proj(x) * self.scale
        k = self.k_proj(x)
        v = self.v_proj(x)
        q = q.view(b, l, self.heads, self.head_dim).transpose(1, 2)
        k = k.view(b, l, self.heads, self.head_dim).transpose(1, 2)
        v = v.view(b, l, self.heads, self.head_dim).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2), dim=-1)
        o = (attn @ v).transpose(1, 2).reshape(b, l, d)
        return self.out_proj(o)


class _CLIPLayerTorch(nn.Module):
    def __init__(self, dim: int, heads: int, mlp_dim: int, hidden_act: str):
        super().__init__()
        self.layer_norm1 = nn.LayerNorm(dim)
        self.self_attn = _CLIPAttentionTorch(dim, heads)
        self.layer_norm2 = nn.LayerNorm(dim)
        mlp = nn.Module()
        mlp.fc1 = nn.Linear(dim, mlp_dim)
        mlp.fc2 = nn.Linear(mlp_dim, dim)
        self.mlp = mlp
        self.hidden_act = hidden_act

    def forward(self, x):
        x = x + self.self_attn(self.layer_norm1(x))
        h = self.mlp.fc1(self.layer_norm2(x))
        if self.hidden_act == "gelu":
            h = F.gelu(h)
        elif self.hidden_act == "quick_gelu":
            h = h * torch.sigmoid(1.702 * h)
        else:
            raise ValueError(self.hidden_act)
        return x + self.mlp.fc2(h)


class CLIPVisionModelWithProjectionTorch(nn.Module):
    def __init__(self, hidden_size: int = 1280, intermediate_size: int = 5120,
                 num_layers: int = 32, num_heads: int = 16,
                 patch_size: int = 14, image_size: int = 224,
                 projection_dim: int = 1024, hidden_act: str = "gelu"):
        super().__init__()
        num_positions = (image_size // patch_size) ** 2 + 1
        vm = nn.Module()
        emb = nn.Module()
        emb.class_embedding = nn.Parameter(torch.randn(hidden_size))
        emb.patch_embedding = nn.Conv2d(3, hidden_size, patch_size,
                                        stride=patch_size, bias=False)
        emb.position_embedding = nn.Embedding(num_positions, hidden_size)
        vm.embeddings = emb
        vm.pre_layrnorm = nn.LayerNorm(hidden_size)
        enc = nn.Module()
        enc.layers = nn.ModuleList(
            [_CLIPLayerTorch(hidden_size, num_heads, intermediate_size,
                             hidden_act) for _ in range(num_layers)])
        vm.encoder = enc
        vm.post_layernorm = nn.LayerNorm(hidden_size)
        self.vision_model = vm
        self.visual_projection = nn.Linear(hidden_size, projection_dim,
                                           bias=False)

    def forward(self, pixel_values):
        """pixel_values [B, 3, H, W] -> image_embeds [B, projection_dim]."""
        vm = self.vision_model
        b = pixel_values.shape[0]
        patches = vm.embeddings.patch_embedding(pixel_values)  # [B, C, h, w]
        patches = patches.flatten(2).transpose(1, 2)           # [B, hw, C]
        cls = vm.embeddings.class_embedding.expand(b, 1, -1)
        x = torch.cat([cls, patches], dim=1)
        x = x + vm.embeddings.position_embedding.weight[None]
        x = vm.pre_layrnorm(x)
        for layer in vm.encoder.layers:
            x = layer(x)
        pooled = vm.post_layernorm(x[:, 0])
        return self.visual_projection(pooled)
