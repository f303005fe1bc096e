"""Native C++ host kernels vs the numpy oracles (exact agreement)."""

import numpy as np
import pytest

from mofa_tpu import native


requires_native = pytest.mark.skipif(not native.available(),
                                     reason="no C++ toolchain")


@requires_native
def test_rasterize_tracks_matches_numpy():
    from mofa_tpu.ops.rasterize import rasterize_trajectories
    rng = np.random.RandomState(0)
    tracks = rng.rand(5, 8, 2) * 60
    got_f, got_m = native.rasterize_tracks(tracks, 7, 64, 64)
    want_f, want_m = rasterize_trajectories(tracks, 7, 64, 64)
    np.testing.assert_array_equal(got_f, want_f)
    np.testing.assert_array_equal(got_m, want_m)


@requires_native
def test_square_nms_matches_numpy():
    from mofa_tpu.train.flow_sampler import square_nms as np_nms
    rng = np.random.RandomState(1)
    score = rng.rand(48, 40).astype(np.float32)
    np.testing.assert_array_equal(native.square_nms(score, 15),
                                  np_nms(score, 15))


@requires_native
def test_neighbor_elim_matches_python():
    rng = np.random.RandomState(2)
    rows = rng.randint(0, 50, 40).astype(np.int64)
    cols = rng.randint(0, 50, 40).astype(np.int64)
    coins = rng.rand(40 * 40).astype(np.float32)

    got_r, got_c = native.neighbor_elim(rows, cols, 7.0, coins)

    import mofa_tpu.native as nat
    lib = nat._LIB
    nat._LIB = None          # force the python fallback with SAME coins
    try:
        want_r, want_c = native.neighbor_elim(rows, cols, 7.0, coins)
    finally:
        nat._LIB = lib
    np.testing.assert_array_equal(got_r, want_r)
    np.testing.assert_array_equal(got_c, want_c)


@requires_native
def test_pchip_derivatives_match_numpy():
    from mofa_tpu.ops.trajectory import _pchip_derivatives
    x = np.array([0.0, 1.0, 2.5, 4.0, 7.0])
    y = np.array([0.0, 2.0, 1.0, 5.0, 4.0])
    np.testing.assert_allclose(native.pchip_derivatives(x, y),
                               _pchip_derivatives(x, y), atol=1e-12)
