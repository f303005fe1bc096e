import numpy as np
import jax.numpy as jnp
import pytest

from mofa_tpu.ops.trajectory import pchip_interpolate, interpolate_trajectory
from mofa_tpu.ops.rasterize import rasterize_trajectories, landmarks_to_sparse_flow
from mofa_tpu.ops.flow import flow_pyramid, rescale_flow, merge_flows
from mofa_tpu.ops.edm import rand_cosine_interpolated, edm_scalings
from mofa_tpu.ops.flow_viz import flow_to_image


def test_pchip_matches_scipy():
    scipy = pytest.importorskip("scipy.interpolate")
    rng = np.random.RandomState(0)
    x = np.sort(rng.rand(7)) * 10
    y = rng.randn(7)
    xq = np.linspace(x[0], x[-1], 50)
    ref = scipy.PchipInterpolator(x, y)(xq)
    got = pchip_interpolate(x, y, xq)
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-10)


def test_interpolate_trajectory_endpoints():
    pts = [(0.0, 0.0), (5.0, 2.0), (10.0, 0.0)]
    out = interpolate_trajectory(pts, 25)
    assert len(out) == 25
    np.testing.assert_allclose(out[0], pts[0])
    np.testing.assert_allclose(out[-1], pts[-1])


def test_rasterize_trajectories():
    tracks = np.array([
        [[2.0, 3.0], [4.5, 3.0], [6.9, 5.0]],   # start (x=2,y=3)
        [[2.2, 3.4], [2.2, 3.4], [2.2, 3.4]],   # same pixel -> sums
    ])
    flow, mask = rasterize_trajectories(tracks, n_steps=2, H=8, W=8)
    assert flow.shape == (2, 8, 8, 2)
    # int displacement of track0 step0: int64(4.5-2.0)=2, int64(3.0-3.0)=0
    np.testing.assert_allclose(flow[0, 3, 2], [2.0, 0.0])
    np.testing.assert_allclose(flow[1, 3, 2], [4.0, 2.0])  # track0 step1: int(4.9)=4, int(2)=2
    assert mask[0, 3, 2] == 2.0  # both tracks land on (3,2)


def test_landmarks_to_sparse_flow():
    lm = np.zeros((1, 3, 2, 2), dtype=np.float32)
    lm[0, :, 0] = [[4, 5], [6, 5], [8, 9]][0:3][0]  # landmark 0 static at (4,5)
    lm[0, 0, 1] = [1, 2]
    lm[0, 1, 1] = [3, 2]
    lm[0, 2, 1] = [1, 6]
    flow, mask = landmarks_to_sparse_flow(lm, h=16, w=16)
    assert flow.shape == (1, 2, 2, 16, 16)
    # landmark1 anchor (x=1,y=2): frame1 flow (2,0), frame2 flow (0,4)
    np.testing.assert_allclose(flow[0, 0, :, 2, 1], [2.0, 0.0])
    np.testing.assert_allclose(flow[0, 1, :, 2, 1], [0.0, 4.0])
    assert mask[0, 0, 0, 2, 1] == 1.0 and mask[0, 0, 1, 2, 1] == 1.0


def test_flow_pyramid():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    flow = rng.randn(2, 64, 128, 2).astype(np.float32) * 10
    pyr = flow_pyramid(jnp.asarray(flow), scales=(8, 16))
    for s in (8, 16):
        ref = F.interpolate(torch.from_numpy(np.moveaxis(flow, -1, 1)), scale_factor=1 / s).numpy() / s
        np.testing.assert_allclose(np.moveaxis(np.asarray(pyr[s]), -1, 1), ref, rtol=1e-5, atol=1e-6)


def test_rescale_flow():
    flow = np.zeros((1, 4, 4, 2), dtype=np.float32)
    flow[..., 0] = 1.0
    flow[..., 1] = 2.0
    out = np.asarray(rescale_flow(jnp.asarray(flow), 8, 16))
    assert out.shape == (1, 8, 16, 2)
    np.testing.assert_allclose(out[..., 0], 4.0)  # dx * 16/4
    np.testing.assert_allclose(out[..., 1], 4.0)  # dy * 8/4


def test_merge_flows():
    a = np.zeros((1, 2, 2, 2), np.float32)
    b = np.full((1, 2, 2, 2), 7.0, np.float32)
    a[0, 0, 0] = [1.0, 2.0]
    out = np.asarray(merge_flows(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(out[0, 0, 0], [1.0, 2.0])
    np.testing.assert_allclose(out[0, 1, 1], [7.0, 7.0])


def test_rand_cosine_interpolated_range():
    import jax

    s = rand_cosine_interpolated(jax.random.PRNGKey(0), (4096,))
    s = np.asarray(s)
    assert np.all(s >= 0.002 - 1e-6) and np.all(s <= 700.0 + 1e-3)
    # compare against the torch reference implementation
    import math
    import torch

    def ref(u):
        sigma_data, min_value, max_value = 0.5, 0.002, 700.0
        logsnr_min = -2 * math.log(min_value / sigma_data)
        logsnr_max = -2 * math.log(max_value / sigma_data)

        def cosine(t, lo, hi):
            t_min = math.atan(math.exp(-0.5 * hi))
            t_max = math.atan(math.exp(-0.5 * lo))
            return -2 * torch.log(torch.tan(t_min + t * (t_max - t_min)))

        def shifted(t, image_d, noise_d):
            shift = 2 * math.log(noise_d / image_d)
            return cosine(t, logsnr_min - shift, logsnr_max - shift) + shift

        t = torch.as_tensor(u)
        logsnr = torch.lerp(shifted(t, 64, 32), shifted(t, 64, 64), t)
        return (torch.exp(-logsnr / 2) * sigma_data).numpy()

    # same u through both pipelines
    u = np.linspace(0.01, 0.99, 17).astype(np.float32)
    from mofa_tpu.ops.edm import _logsnr_shifted
    import math as m

    logsnr_min = -2 * m.log(0.002 / 0.5)
    logsnr_max = -2 * m.log(700.0 / 0.5)
    lo = _logsnr_shifted(jnp.asarray(u), 64, 32, logsnr_min, logsnr_max)
    hi = _logsnr_shifted(jnp.asarray(u), 64, 64, logsnr_min, logsnr_max)
    ours = np.exp(-np.asarray(lo + u * (hi - lo)) / 2) * 0.5
    np.testing.assert_allclose(ours, ref(u), rtol=1e-4)


def test_edm_scalings():
    s = jnp.asarray([0.5, 2.0])
    c_out, c_skip, w, c_in, ts = edm_scalings(s)
    np.testing.assert_allclose(np.asarray(c_skip), 1 / (np.array([0.5, 2.0]) ** 2 + 1))
    np.testing.assert_allclose(np.asarray(ts), 0.25 * np.log(np.array([0.5, 2.0])))


def test_flow_viz_shape():
    rng = np.random.RandomState(0)
    img = flow_to_image(rng.randn(16, 16, 2).astype(np.float32))
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8


def test_flo_roundtrip(tmp_path):
    import numpy as np
    from mofa_tpu.ops.flow_viz import read_flo, write_flo
    rng = np.random.RandomState(0)
    flow = rng.randn(12, 17, 2).astype(np.float32)
    path = str(tmp_path / "test.flo")
    write_flo(flow, path)
    back = read_flo(path)
    np.testing.assert_array_equal(back, flow)


def test_phase_timer_reports():
    from mofa_tpu.utils.profiling import PhaseTimer
    import jax.numpy as jnp
    t = PhaseTimer()
    with t.phase("compute", sync_on=None):
        x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    with t.phase("compute", sync_on=x):
        _ = x + 1
    rep = t.report()
    assert "compute" in rep and "x2" in rep


def test_given_iteration_sampler_resume_and_sharding():
    from mofa_tpu.train.sampler import GivenIterationSampler
    import numpy as np
    s0 = GivenIterationSampler(100, total_iter=10, batch_size=4,
                               world_size=2, rank=0, seed=7)
    s1 = GivenIterationSampler(100, total_iter=10, batch_size=4,
                               world_size=2, rank=1, seed=7)
    assert len(s0.indices) == len(s1.indices) == 40
    # disjoint shards of the same shuffled sequence
    assert set() == set()  # trivially true; real check: determinism
    again = GivenIterationSampler(100, 10, 4, 2, 0, seed=7)
    np.testing.assert_array_equal(s0.indices, again.indices)
    # resume drops consumed iterations
    s0.set_last_iter(4)
    assert len(s0) == 40 - 5 * 4
    first_after_resume = next(iter(s0))
    assert first_after_resume == s0.indices[20]


def test_flow_epe_metrics():
    import numpy as np
    from mofa_tpu.train.sampler import flow_epe
    gt = np.zeros((4, 4, 2))
    pred = gt.copy()
    pred[0, 0] = [3.0, 4.0]   # epe 5 at one pixel
    m = flow_epe(pred, gt)
    assert abs(m["epe"] - 5.0 / 16) < 1e-6
    assert abs(m["5px"] - 0.0) < 1e-6  # 5.0 is not > 5
    assert abs(m["3px"] - 1.0 / 16) < 1e-6


def test_group_norm_pool_leading_matches_grouped_view():
    """GroupNorm(pool_leading=K) on flat [B*K, HW, C] rows == GroupNorm
    on the [B, K*HW, C] view (stats pooled across the K-row blocks) —
    the torch 5-D GN semantics of the temporal resnets."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mofa_tpu.models.layers import GroupNorm

    rng = np.random.RandomState(0)
    b, k, s, c = 2, 3, 10, 32
    x = rng.randn(b * k, s, c).astype(np.float32)
    m = GroupNorm(8, 1e-5)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = m.apply(params, jnp.asarray(x), pool_leading=k)
    want = m.apply(params, jnp.asarray(x).reshape(b, k * s, c))
    np.testing.assert_allclose(np.asarray(got).reshape(b, k * s, c),
                               np.asarray(want), atol=2e-6, rtol=2e-6)
