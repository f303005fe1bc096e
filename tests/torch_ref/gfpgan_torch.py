"""Independent torch transcription of GFPGAN v1 'clean' architecture
(TencentARC gfpgan `gfpganv1_clean_arch.py` + basicsr
`stylegan2_clean_arch.py`) — the model the reference's face enhancer loads
(face_enhancer.py:51-56, GFPGANv1.4). gfpgan/basicsr are not installed in
this image; this transcription + random weights drives the Flax model and
`convert_gfpgan_state_dict` (tests/test_gfpgan.py)."""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def clean_channels(narrow, cm):
    return {4: int(512 * narrow), 8: int(512 * narrow), 16: int(512 * narrow),
            32: int(512 * narrow), 64: int(256 * cm * narrow),
            128: int(128 * cm * narrow), 256: int(64 * cm * narrow),
            512: int(32 * cm * narrow), 1024: int(16 * cm * narrow)}


class NormStyleCode(nn.Module):
    def forward(self, x):
        return x * torch.rsqrt(torch.mean(x ** 2, dim=1, keepdim=True) + 1e-8)


class ModulatedConv2d(nn.Module):
    def __init__(self, cin, cout, k, num_style_feat, demodulate=True,
                 sample_mode=None, eps=1e-8):
        super().__init__()
        self.cout, self.k = cout, k
        self.demodulate, self.sample_mode, self.eps = demodulate, sample_mode, eps
        self.modulation = nn.Linear(num_style_feat, cin, bias=True)
        self.weight = nn.Parameter(
            torch.randn(1, cout, cin, k, k) / math.sqrt(cin * k * k))

    def forward(self, x, style):
        b, c, h, w = x.shape
        style = self.modulation(style).view(b, 1, c, 1, 1)
        weight = self.weight * style
        if self.demodulate:
            demod = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + self.eps)
            weight = weight * demod.view(b, self.cout, 1, 1, 1)
        weight = weight.view(b * self.cout, c, self.k, self.k)
        if self.sample_mode == "upsample":
            x = F.interpolate(x, scale_factor=2, mode="bilinear",
                              align_corners=False)
        elif self.sample_mode == "downsample":
            x = F.interpolate(x, scale_factor=0.5, mode="bilinear",
                              align_corners=False)
        b, c, h, w = x.shape
        out = F.conv2d(x.view(1, b * c, h, w), weight, padding=self.k // 2,
                       groups=b)
        return out.view(b, self.cout, *out.shape[2:4])


class StyleConv(nn.Module):
    def __init__(self, cin, cout, k, num_style_feat, sample_mode=None):
        super().__init__()
        self.modulated_conv = ModulatedConv2d(cin, cout, k, num_style_feat,
                                              demodulate=True,
                                              sample_mode=sample_mode)
        self.weight = nn.Parameter(torch.zeros(1))       # noise strength
        self.bias = nn.Parameter(torch.zeros(1, cout, 1, 1))

    def forward(self, x, style, noise):
        out = self.modulated_conv(x, style) * 2 ** 0.5
        out = out + self.weight * noise + self.bias
        return F.leaky_relu(out, 0.2)


class ToRGB(nn.Module):
    def __init__(self, cin, num_style_feat, upsample=True):
        super().__init__()
        self.upsample = upsample
        self.modulated_conv = ModulatedConv2d(cin, 3, 1, num_style_feat,
                                              demodulate=False)
        self.bias = nn.Parameter(torch.zeros(1, 3, 1, 1))

    def forward(self, x, style, skip=None):
        out = self.modulated_conv(x, style) + self.bias
        if skip is not None:
            if self.upsample:
                skip = F.interpolate(skip, scale_factor=2, mode="bilinear",
                                     align_corners=False)
            out = out + skip
        return out


class ConstantInput(nn.Module):
    def __init__(self, ch, size=4):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(1, ch, size, size))

    def forward(self, b):
        return self.weight.repeat(b, 1, 1, 1)


class StyleGAN2GeneratorCSFT(nn.Module):
    def __init__(self, out_size, num_style_feat, num_mlp, channel_multiplier,
                 narrow, sft_half):
        super().__init__()
        self.num_style_feat, self.sft_half = num_style_feat, sft_half
        ch = clean_channels(narrow, channel_multiplier)
        layers = [NormStyleCode()]
        for _ in range(num_mlp):
            layers += [nn.Linear(num_style_feat, num_style_feat),
                       nn.LeakyReLU(0.2, True)]
        self.style_mlp = nn.Sequential(*layers)
        self.constant_input = ConstantInput(ch[4])
        self.style_conv1 = StyleConv(ch[4], ch[4], 3, num_style_feat)
        self.to_rgb1 = ToRGB(ch[4], num_style_feat, upsample=False)
        self.log_size = int(math.log2(out_size))
        self.num_layers = (self.log_size - 2) * 2 + 1
        self.num_latent = self.log_size * 2 - 2
        self.style_convs = nn.ModuleList()
        self.to_rgbs = nn.ModuleList()
        self.noises = nn.Module()
        cin = ch[4]
        for li in range(self.num_layers):
            r = 2 ** ((li + 5) // 2)
            self.noises.register_buffer(f"noise{li}", torch.randn(1, 1, r, r))
        for i in range(3, self.log_size + 1):
            cout = ch[2 ** i]
            self.style_convs.append(StyleConv(cin, cout, 3, num_style_feat,
                                              sample_mode="upsample"))
            self.style_convs.append(StyleConv(cout, cout, 3, num_style_feat))
            self.to_rgbs.append(ToRGB(cout, num_style_feat))
            cin = cout

    def forward(self, styles, conditions, input_is_latent=True):
        if not input_is_latent:
            styles = [self.style_mlp(s) for s in styles]
        noise = [getattr(self.noises, f"noise{i}")
                 for i in range(self.num_layers)]
        latent = styles[0]
        if latent.ndim < 3:
            latent = latent.unsqueeze(1).repeat(1, self.num_latent, 1)
        out = self.constant_input(latent.shape[0])
        out = self.style_conv1(out, latent[:, 0], noise[0])
        skip = self.to_rgb1(out, latent[:, 1])
        i = 1
        for conv1, conv2, n1, n2, to_rgb in zip(
                self.style_convs[::2], self.style_convs[1::2],
                noise[1::2], noise[2::2], self.to_rgbs):
            out = conv1(out, latent[:, i], n1)
            if i < len(conditions):
                if self.sft_half:
                    same, sft = torch.split(out, out.size(1) // 2, dim=1)
                    sft = sft * conditions[i - 1] + conditions[i]
                    out = torch.cat([same, sft], dim=1)
                else:
                    out = out * conditions[i - 1] + conditions[i]
            out = conv2(out, latent[:, i + 1], n2)
            skip = to_rgb(out, latent[:, i + 2], skip)
            i += 2
        return skip


class ResBlock(nn.Module):
    def __init__(self, cin, cout, mode):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cin, 3, 1, 1)
        self.conv2 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.skip = nn.Conv2d(cin, cout, 1, bias=False)
        self.scale_factor = 0.5 if mode == "down" else 2

    def forward(self, x):
        out = F.leaky_relu(self.conv1(x), 0.2)
        out = F.interpolate(out, scale_factor=self.scale_factor,
                            mode="bilinear", align_corners=False)
        out = F.leaky_relu(self.conv2(out), 0.2)
        x = F.interpolate(x, scale_factor=self.scale_factor, mode="bilinear",
                          align_corners=False)
        return out + self.skip(x)


class GFPGANv1Clean(nn.Module):
    def __init__(self, out_size=512, num_style_feat=512,
                 channel_multiplier=2, num_mlp=8, input_is_latent=True,
                 different_w=True, narrow=1, sft_half=True):
        super().__init__()
        self.input_is_latent, self.different_w = input_is_latent, different_w
        self.num_style_feat = num_style_feat
        ch = clean_channels(narrow * 0.5, channel_multiplier)
        self.log_size = int(math.log2(out_size))
        self.conv_body_first = nn.Conv2d(3, ch[out_size], 1)
        cin = ch[out_size]
        self.conv_body_down = nn.ModuleList()
        for i in range(self.log_size, 2, -1):
            cout = ch[2 ** (i - 1)]
            self.conv_body_down.append(ResBlock(cin, cout, "down"))
            cin = cout
        self.final_conv = nn.Conv2d(cin, ch[4], 3, 1, 1)
        cin = ch[4]
        self.conv_body_up = nn.ModuleList()
        self.toRGB = nn.ModuleList()
        self.condition_scale = nn.ModuleList()
        self.condition_shift = nn.ModuleList()
        for i in range(3, self.log_size + 1):
            cout = ch[2 ** i]
            self.conv_body_up.append(ResBlock(cin, cout, "up"))
            self.toRGB.append(nn.Conv2d(cout, 3, 1))
            sft_out = cout if sft_half else cout * 2
            self.condition_scale.append(nn.Sequential(
                nn.Conv2d(cout, cout, 3, 1, 1), nn.LeakyReLU(0.2, True),
                nn.Conv2d(cout, sft_out, 3, 1, 1)))
            self.condition_shift.append(nn.Sequential(
                nn.Conv2d(cout, cout, 3, 1, 1), nn.LeakyReLU(0.2, True),
                nn.Conv2d(cout, sft_out, 3, 1, 1)))
            cin = cout
        lin_out = ((self.log_size * 2 - 2) * num_style_feat if different_w
                   else num_style_feat)
        self.final_linear = nn.Linear(ch[4] * 4 * 4, lin_out)
        self.stylegan_decoder = StyleGAN2GeneratorCSFT(
            out_size, num_style_feat, num_mlp, channel_multiplier, narrow,
            sft_half)

    def forward(self, x):
        conditions, skips = [], []
        feat = F.leaky_relu(self.conv_body_first(x), 0.2)
        for i in range(self.log_size - 2):
            feat = self.conv_body_down[i](feat)
            skips.insert(0, feat)
        feat = F.leaky_relu(self.final_conv(feat), 0.2)
        style_code = self.final_linear(feat.reshape(feat.size(0), -1))
        if self.different_w:
            style_code = style_code.view(style_code.size(0), -1,
                                         self.num_style_feat)
        for i in range(self.log_size - 2):
            feat = feat + skips[i]
            feat = self.conv_body_up[i](feat)
            conditions.append(self.condition_scale[i](feat).clone())
            conditions.append(self.condition_shift[i](feat).clone())
            self.toRGB[i](feat)
        return self.stylegan_decoder([style_code], conditions,
                                     input_is_latent=self.input_is_latent)
