"""FiLM interpolation: warp op units, net shapes, and driver parity vs the
reference batch_images_interpolation_tool (AST-extracted, cuda stubbed)."""

import ast

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mofa_tpu.models.film import (
    FilmNet, TINY_FILM_CONFIG, interpolate_frames, warp)

FI_PY = ("/root/reference/MOFA-Video-Hybrid/aniportrait/src/utils/"
         "frame_interpolation.py")


def test_warp_identity_and_shift():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 6, 8, 3).astype(np.float32))
    out = warp(img, jnp.zeros((1, 6, 8, 2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    # flow (dx=1, dy=0): out[y, x] = img[y, x+1] (edge clamped)
    flow = jnp.zeros((1, 6, 8, 2)).at[..., 0].set(1.0)
    out = np.asarray(warp(img, flow))
    np.testing.assert_allclose(out[:, :, :-1], np.asarray(img)[:, :, 1:],
                               atol=1e-6)
    np.testing.assert_allclose(out[:, :, -1], np.asarray(img)[:, :, -1],
                               atol=1e-6)


def test_filmnet_shapes():
    net = FilmNet(TINY_FILM_CONFIG)
    x0 = jnp.zeros((1, 16, 16, 3))
    x1 = jnp.ones((1, 16, 16, 3))
    params = net.init(jax.random.PRNGKey(0), x0, x1, 0.5)
    out = net.apply(params, x0, x1, 0.5)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    # dt enters the flow scaling: different dt -> different output
    out2 = net.apply(params, x0, x1, 0.25)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def _reference_tool():
    tree = ast.parse(open(FI_PY).read())
    keep = [n for n in tree.body if isinstance(n, ast.FunctionDef)
            and n.name == "batch_images_interpolation_tool"]
    ns = {"torch": torch, "np": np, "bisect": __import__("bisect"),
          "tqdm": lambda x, *a, **k: x}
    exec(compile(ast.Module(body=keep, type_ignores=[]), FI_PY, "exec"), ns)
    return ns["batch_images_interpolation_tool"]


class _MockModel:
    def __call__(self, x0, x1, dt):
        return x0 * (1 - dt.reshape(-1, 1, 1, 1)) + x1 * dt.reshape(-1, 1, 1, 1)


def test_driver_parity_vs_reference(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(torch.Tensor, "half", lambda self: self)
    tool = _reference_tool()

    rng = np.random.RandomState(1)
    frames = rng.rand(4, 8, 8, 3).astype(np.float32)
    inter = 3

    # reference layout: [bs, ch, frames, h, w]
    inp = torch.tensor(frames.transpose(3, 0, 1, 2)[None])
    ref = tool(inp, _MockModel(), inter_frames=inter)
    ref = ref.numpy()[0].transpose(1, 2, 3, 0)       # [T', H, W, 3]

    def predict(x0, x1, dt):
        return x0 * (1 - dt) + x1 * dt

    got = interpolate_frames(frames, inter, predict)
    assert got.shape == ref.shape == (4 + 3 * inter, 8, 8, 3)
    np.testing.assert_allclose(got, ref, atol=1e-6)
