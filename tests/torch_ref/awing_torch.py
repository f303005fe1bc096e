"""Independent torch transcription of facexlib's AWing FAN
(`facexlib/alignment/awing_arch.py`, loaded by the reference at
extract_kp_videos_safe.py:18-31). facexlib is not installed in this image;
this transcription + random weights exercises the Flax model and
`convert_fan_state_dict` end to end (tests/test_face_alignment.py)."""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def conv3x3(cin, cout):
    return nn.Conv2d(cin, cout, 3, padding=1, bias=False)


class ConvBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(cin)
        self.conv1 = conv3x3(cin, cout // 2)
        self.bn2 = nn.BatchNorm2d(cout // 2)
        self.conv2 = conv3x3(cout // 2, cout // 4)
        self.bn3 = nn.BatchNorm2d(cout // 4)
        self.conv3 = conv3x3(cout // 4, cout // 4)
        if cin != cout:
            self.downsample = nn.Sequential(
                nn.BatchNorm2d(cin), nn.ReLU(True),
                nn.Conv2d(cin, cout, 1, bias=False))
        else:
            self.downsample = None

    def forward(self, x):
        out1 = self.conv1(F.relu(self.bn1(x)))
        out2 = self.conv2(F.relu(self.bn2(out1)))
        out3 = self.conv3(F.relu(self.bn3(out2)))
        out = torch.cat([out1, out2, out3], dim=1)
        res = x if self.downsample is None else self.downsample(x)
        return out + res


def add_coords(x, with_r, boundary=None):
    b, _, h, w = x.shape
    xx = (torch.arange(h, dtype=torch.float32) / (h - 1) * 2 - 1)
    xx = xx.view(1, 1, h, 1).expand(b, 1, h, w)
    yy = (torch.arange(w, dtype=torch.float32) / (w - 1) * 2 - 1)
    yy = yy.view(1, 1, 1, w).expand(b, 1, h, w)
    parts = [x, xx, yy]
    if with_r:
        rr = torch.sqrt(xx ** 2 + yy ** 2)
        parts.append(rr / rr.max())
    if boundary is not None:
        bnd = torch.clamp(boundary, 0.0, 1.0)
        keep = bnd > 0.05
        parts.append(torch.where(keep, xx, torch.zeros_like(xx)))
        parts.append(torch.where(keep, yy, torch.zeros_like(yy)))
    return torch.cat(parts, dim=1)


class CoordConvTh(nn.Module):
    def __init__(self, cin, cout, k, stride=1, with_r=True,
                 with_boundary=False, first_one=False):
        super().__init__()
        self.with_r, self.with_boundary = with_r, with_boundary
        in_size = cin + 2 + (1 if with_r else 0)
        if with_boundary and not first_one:
            in_size += 2
        self.conv = nn.Conv2d(in_size, cout, k, stride=stride, padding=k // 2)

    def forward(self, x, heatmap=None):
        boundary = None
        if self.with_boundary and heatmap is not None:
            boundary = heatmap[:, -1:]
        ret = add_coords(x, self.with_r, boundary)
        last_channel = ret[:, -2:]
        return self.conv(ret), last_channel


class HourGlass(nn.Module):
    def __init__(self, depth=4, features=256, first_one=False):
        super().__init__()
        self.depth = depth
        self.coordconv = CoordConvTh(features, features, 1, with_r=True,
                                     with_boundary=True, first_one=first_one)
        for level in range(depth, 0, -1):
            self.add_module(f"b1_{level}", ConvBlock(features, features))
            self.add_module(f"b2_{level}", ConvBlock(features, features))
            if level == 1:
                self.add_module(f"b2_plus_{level}", ConvBlock(features, features))
            self.add_module(f"b3_{level}", ConvBlock(features, features))

    def _recurse(self, level, inp):
        up1 = self._modules[f"b1_{level}"](inp)
        low1 = F.avg_pool2d(inp, 2, stride=2)
        low1 = self._modules[f"b2_{level}"](low1)
        if level > 1:
            low2 = self._recurse(level - 1, low1)
        else:
            low2 = self._modules[f"b2_plus_{level}"](low1)
        low3 = self._modules[f"b3_{level}"](low2)
        up2 = F.interpolate(low3, scale_factor=2, mode="nearest")
        return up1 + up2

    def forward(self, x, heatmap=None):
        x, last_channel = self.coordconv(x, heatmap)
        return self._recurse(self.depth, x), last_channel


class FAN(nn.Module):
    def __init__(self, num_modules=4, num_landmarks=98):
        super().__init__()
        self.num_modules = num_modules
        self.conv1 = CoordConvTh(3, 64, 7, stride=2, with_r=True,
                                 with_boundary=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = ConvBlock(64, 128)
        self.conv3 = ConvBlock(128, 128)
        self.conv4 = ConvBlock(128, 256)
        for i in range(num_modules):
            self.add_module(f"m{i}", HourGlass(4, 256, first_one=(i == 0)))
            self.add_module(f"top_m_{i}", ConvBlock(256, 256))
            self.add_module(f"conv_last{i}", nn.Conv2d(256, 256, 1))
            self.add_module(f"bn_end{i}", nn.BatchNorm2d(256))
            self.add_module(f"l{i}", nn.Conv2d(256, num_landmarks + 1, 1))
            if i < num_modules - 1:
                self.add_module(f"bl{i}", nn.Conv2d(256, 256, 1))
                self.add_module(f"al{i}", nn.Conv2d(num_landmarks + 1, 256, 1))

    def forward(self, x):
        x, _ = self.conv1(x)
        x = F.relu(self.bn1(x), True)
        x = F.avg_pool2d(self.conv2(x), 2, stride=2)
        x = self.conv3(x)
        x = self.conv4(x)

        previous, tmp_out = x, None
        outputs = []
        for i in range(self.num_modules):
            hg, _ = self._modules[f"m{i}"](previous, tmp_out)
            ll = self._modules[f"top_m_{i}"](hg)
            ll = F.relu(self._modules[f"bn_end{i}"](
                self._modules[f"conv_last{i}"](ll)), True)
            tmp_out = self._modules[f"l{i}"](ll)
            outputs.append(tmp_out)
            if i < self.num_modules - 1:
                previous = (previous + self._modules[f"bl{i}"](ll)
                            + self._modules[f"al{i}"](tmp_out))
        return outputs
