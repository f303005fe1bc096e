"""Resampling ops with exact torch `F.interpolate` semantics, as matmuls.

TPU-first design: instead of per-pixel gathers (VPU-hostile, defeats XLA
tiling), every fixed-size resize is expressed as two small dense
interpolation matrices contracted against the spatial axes — the MXU eats
these. The matrices are built in numpy at trace time (shapes are static
under jit), so the device program is two matmuls.

Parity targets (all verified against torch in tests/test_resize.py):
- bilinear align_corners=True/False   (torch upsample_bilinear2d)
- bicubic  align_corners=True         (torch upsample_bicubic2d, A=-0.75)
- nearest                             (torch legacy 'nearest': floor(dst*in/out))
- `_resize_with_antialiasing` (gaussian blur + bicubic, reflect pad) from
  /root/reference/MOFA-Video-Traj/pipeline/pipeline.py:532-640
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def interp_matrix(in_size: int, out_size: int, method: str = "bilinear",
                  align_corners: bool = False) -> np.ndarray:
    """[out_size, in_size] matrix M with (M @ signal) == torch interpolate."""
    if method == "nearest":
        m = np.zeros((out_size, in_size), dtype=np.float32)
        scale = in_size / out_size
        src = np.minimum((np.arange(out_size) * scale).astype(np.int64), in_size - 1)
        m[np.arange(out_size), src] = 1.0
        return m

    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        src = np.arange(out_size, dtype=np.float64) * scale
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5

    m = np.zeros((out_size, in_size), dtype=np.float64)
    if method == "bilinear":
        if not align_corners:
            src = np.maximum(src, 0.0)  # torch clamps source index before weights
        i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
        i1 = np.minimum(i0 + 1, in_size - 1)
        frac = src - np.floor(src)
        frac = np.where(i0 == i1, 0.0, frac)
        np.add.at(m, (np.arange(out_size), i0), 1.0 - frac)
        np.add.at(m, (np.arange(out_size), i1), frac)
    elif method == "bicubic":
        # torch cubic convolution, A = -0.75; border taps clamped.
        A = -0.75

        def cc2(x):  # cubic kernel for |x| in [1, 2)
            return ((A * x - 5 * A) * x + 8 * A) * x - 4 * A

        def cc1(x):  # cubic kernel for |x| in [0, 1)
            return ((A + 2) * x - (A + 3)) * x * x + 1

        i1 = np.floor(src).astype(np.int64)
        t = src - i1
        weights = [cc2(t + 1.0), cc1(t), cc1(1.0 - t), cc2(2.0 - t)]
        for tap, w in enumerate(weights):
            idx = np.clip(i1 - 1 + tap, 0, in_size - 1)
            np.add.at(m, (np.arange(out_size), idx), w)
    else:
        raise ValueError(method)
    return m.astype(np.float32)


def resize_hw(x: jnp.ndarray, size: tuple[int, int], method: str = "bilinear",
              align_corners: bool = False) -> jnp.ndarray:
    """Resize trailing (H, W) axes of x to `size`."""
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = size
    if (h, w) == (oh, ow) and method != "nearest":
        return x
    mh = jnp.asarray(interp_matrix(h, oh, method, align_corners))
    mw = jnp.asarray(interp_matrix(w, ow, method, align_corners))
    dt = x.dtype
    y = jnp.einsum("Hh,...hw,Ww->...HW", mh, x.astype(jnp.float32), mw)
    return y.astype(dt)


def resize_nhwc(x: jnp.ndarray, size: tuple[int, int], method: str = "bilinear",
                align_corners: bool = False) -> jnp.ndarray:
    """Resize (..., H, W, C) to (..., *size, C)."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = size
    if (h, w) == (oh, ow):
        return x
    mh = jnp.asarray(interp_matrix(h, oh, method, align_corners))
    mw = jnp.asarray(interp_matrix(w, ow, method, align_corners))
    dt = x.dtype
    y = jnp.einsum("Hh,...hwc,Ww->...HWc", mh, x.astype(jnp.float32), mw)
    return y.astype(dt)


def _gaussian_kernel1d(ks: int, sigma: float) -> np.ndarray:
    # matches `_gaussian` in the reference pipeline (half-sample shift for even ks)
    x = np.arange(ks, dtype=np.float64) - ks // 2
    if ks % 2 == 0:
        x = x + 0.5
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _blur_matrix(size: int, ks: int, sigma: float) -> np.ndarray:
    """[size, size] matrix implementing reflect-padded 1-D gaussian filtering.

    Reference `_filter2d` pads with mode="reflect" then runs a valid conv with
    asymmetric padding split pad_front = (ks-1)//2.
    """
    g = _gaussian_kernel1d(ks, sigma)
    pad_front = (ks - 1) // 2
    pad_rear = (ks - 1) - pad_front
    # index map of reflect padding: positions -pad_front .. size-1+pad_rear
    idx = np.arange(-pad_front, size + pad_rear)
    idx = np.abs(idx)  # reflect at 0 (torch 'reflect': no edge duplication)
    idx = np.where(idx >= size, 2 * (size - 1) - idx, idx)
    m = np.zeros((size, size), dtype=np.float64)
    for o in range(size):
        for tap in range(ks):
            m[o, idx[o + tap]] += g[tap]
    return m.astype(np.float32)


def gaussian_blur_hw(x: jnp.ndarray, ks: tuple[int, int], sigma: tuple[float, float]) -> jnp.ndarray:
    """Separable reflect-padded gaussian blur over trailing (H, W)."""
    h, w = x.shape[-2], x.shape[-1]
    mh = jnp.asarray(_blur_matrix(h, int(ks[0]), float(sigma[0])))
    mw = jnp.asarray(_blur_matrix(w, int(ks[1]), float(sigma[1])))
    dt = x.dtype
    # reference blurs x then y; order is immaterial for separable linear filters
    y = jnp.einsum("Hh,...hw,Ww->...HW", mh, x.astype(jnp.float32), mw)
    return y.astype(dt)


def resize_antialias_hw(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """CLIP-preprocessing resize: gaussian blur + bicubic(align_corners=True).

    Mirrors `_resize_with_antialiasing` (pipeline.py:532): sigma from skimage
    heuristic, kernel size = max(4*sigma, 3) forced odd.
    """
    h, w = x.shape[-2], x.shape[-1]
    factors = (h / size[0], w / size[1])
    sigmas = (max((factors[0] - 1.0) / 2.0, 0.001), max((factors[1] - 1.0) / 2.0, 0.001))
    ks = int(max(2.0 * 2 * sigmas[0], 3)), int(max(2.0 * 2 * sigmas[1], 3))
    if ks[0] % 2 == 0:
        ks = ks[0] + 1, ks[1]
    if ks[1] % 2 == 0:
        ks = ks[0], ks[1] + 1
    x = gaussian_blur_hw(x, ks, sigmas)
    return resize_hw(x, size, method="bicubic", align_corners=True)
