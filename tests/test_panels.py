"""Diagnostic panel composition (reference 5-/7-panel videos)."""

import numpy as np

from mofa_tpu.apps.panels import (compose_panels, flow_video, hybrid_panel,
                                  keypoint_panel, overlay_landmarks)

T, H, W = 5, 32, 48


def test_flow_video_prepends_white():
    flow = np.random.RandomState(0).randn(T - 1, H, W, 2).astype(np.float32)
    v = flow_video(flow)
    assert v.shape == (T, H, W, 3)
    assert (v[0] == 1.0).all()          # white first frame
    assert v.min() >= 0 and v.max() <= 1


def test_overlay_landmarks_draws_red_dots():
    frames = np.zeros((T, H, W, 3), np.float32)
    lm = np.tile(np.array([[10.0, 16.0]]), (T, 1, 1))  # (x, y)
    out = overlay_landmarks(frames, lm)
    assert out.shape == frames.shape
    assert out[0, 16, 10, 0] == 1.0 and out[0, 16, 10, 1] == 0.0
    assert out[0, 0, 0].sum() == 0.0    # untouched pixel


def test_keypoint_panel_shapes():
    """Same array shapes the keypoint CLI passes (keypoint_app.run)."""
    rng = np.random.RandomState(1)
    first = rng.rand(H, W, 3).astype(np.float32)
    flow = rng.randn(T - 1, H, W, 2).astype(np.float32)
    ldmk = rng.rand(T, H, W, 3).astype(np.float32)
    frames = rng.rand(T, H, W, 3).astype(np.float32)
    lm = rng.rand(T, 68, 2).astype(np.float32) * [W - 1, H - 1]
    panel = keypoint_panel(first, flow, ldmk, frames, lm)
    assert panel.shape == (T, H, 5 * W, 3)
    np.testing.assert_array_equal(panel[2, :, :W], first)      # col 1 tiled
    np.testing.assert_array_equal(panel[:, :, -W:], frames)    # last col


def test_hybrid_panel_shapes():
    rng = np.random.RandomState(2)
    first = rng.rand(H, W, 3).astype(np.float32)
    drag = rng.randn(T - 1, H, W, 2).astype(np.float32)
    face = rng.randn(T - 1, H, W, 2).astype(np.float32)
    ldmk = rng.rand(T, H, W, 3).astype(np.float32)
    frames = rng.rand(T, H, W, 3).astype(np.float32)
    lm = rng.rand(T, 68, 2).astype(np.float32) * [W - 1, H - 1]
    assert hybrid_panel(first, drag, face, ldmk, frames,
                        lm).shape == (T, H, 6 * W, 3)
    hint = rng.rand(H, W, 3).astype(np.float32)
    assert hybrid_panel(first, drag, face, ldmk, frames, lm,
                        hint01=hint).shape == (T, H, 7 * W, 3)


def test_compose_panels_tiles_stills():
    still = np.ones((H, W, 3), np.float32)
    vid = np.zeros((3, H, W, 3), np.float32)
    out = compose_panels([still, vid])
    assert out.shape == (3, H, 2 * W, 3)
    assert (out[:, :, :W] == 1).all() and (out[:, :, W:] == 0).all()
