import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mofa_tpu.ops.resize import resize_hw, resize_nhwc, resize_antialias_hw, gaussian_blur_hw


@pytest.mark.parametrize("mode,align", [
    ("bilinear", True), ("bilinear", False), ("bicubic", True), ("nearest", None),
])
@pytest.mark.parametrize("in_size,out_size", [
    ((17, 23), (48, 64)), ((48, 64), (17, 23)), ((384, 384), (48, 48)), ((10, 10), (10, 10)),
])
def test_resize_matches_torch(mode, align, in_size, out_size):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, *in_size).astype(np.float32)
    tx = torch.from_numpy(x)
    kwargs = {} if align is None else {"align_corners": align}
    ref = F.interpolate(tx, out_size, mode=mode, **kwargs).numpy()
    got = np.asarray(resize_hw(x, out_size, method=mode, align_corners=bool(align)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_resize_nhwc_matches_nchw():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 9, 11, 3).astype(np.float32)
    a = np.asarray(resize_nhwc(x, (18, 22), method="bilinear", align_corners=True))
    b = np.asarray(resize_hw(np.moveaxis(x, -1, 1), (18, 22), "bilinear", True))
    np.testing.assert_allclose(a, np.moveaxis(b, 1, -1), rtol=1e-5, atol=1e-5)


def _ref_antialias(x, size):
    # reference implementation transcribed from pipeline.py:532-640 (torch)
    import math

    inp = torch.from_numpy(x)
    h, w = inp.shape[-2:]
    factors = (h / size[0], w / size[1])
    sigmas = (max((factors[0] - 1.0) / 2.0, 0.001), max((factors[1] - 1.0) / 2.0, 0.001))
    ks = int(max(2.0 * 2 * sigmas[0], 3)), int(max(2.0 * 2 * sigmas[1], 3))
    if ks[0] % 2 == 0:
        ks = ks[0] + 1, ks[1]
    if ks[1] % 2 == 0:
        ks = ks[0], ks[1] + 1

    def gauss(window, sigma):
        xs = torch.arange(window, dtype=torch.float64) - window // 2
        if window % 2 == 0:
            xs = xs + 0.5
        g = torch.exp(-xs.pow(2.0) / (2 * sigma**2))
        return (g / g.sum()).float()

    kx, ky = gauss(ks[1], sigmas[1]), gauss(ks[0], sigmas[0])

    def filt(img, kernel_x, kernel_y):
        b, c, hh, ww = img.shape
        pad_w = ((ks[1] - 1) // 2, ks[1] - 1 - (ks[1] - 1) // 2)
        pad_h = ((ks[0] - 1) // 2, ks[0] - 1 - (ks[0] - 1) // 2)
        img = F.pad(img, (pad_w[0], pad_w[1], 0, 0), mode="reflect")
        img = F.conv2d(img.reshape(b * c, 1, hh, -1), kernel_x.view(1, 1, 1, -1)).reshape(b, c, hh, ww)
        img = F.pad(img, (0, 0, pad_h[0], pad_h[1]), mode="reflect")
        img = F.conv2d(img.reshape(b * c, 1, -1, ww), kernel_y.view(1, 1, -1, 1)).reshape(b, c, hh, ww)
        return img

    out = filt(inp, kx, ky)
    return F.interpolate(out, size, mode="bicubic", align_corners=True).numpy()


def test_antialias_resize_matches_reference():
    rng = np.random.RandomState(2)
    x = rng.rand(1, 3, 96, 128).astype(np.float32)
    ref = _ref_antialias(x, (24, 24))
    got = np.asarray(resize_antialias_hw(x, (24, 24)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_gaussian_blur_preserves_mean():
    rng = np.random.RandomState(3)
    x = rng.rand(1, 1, 32, 32).astype(np.float32)
    y = np.asarray(gaussian_blur_hw(x, (5, 5), (1.0, 1.0)))
    assert abs(y.mean() - x.mean()) < 1e-3
