"""flow_sampler golden vs reference + dataset decode + stage2 input synth."""

import ast
import os
import tempfile

import numpy as np
import pytest

from mofa_tpu.train.flow_sampler import flow_sampler, clip_sample_mask

REF_SAMPLER = "/root/reference/Training/train_utils/sample_flow_utils.py"


def _ref_sampler_ns():
    """Exec the reference flow_sampler without its module-level cv2 import
    side effects (we supply the deps)."""
    import cv2
    import scipy.ndimage as ndimage
    from scipy.ndimage import maximum_filter
    from scipy import signal
    import random
    from PIL import Image, ImageOps
    src = open(REF_SAMPLER).read()
    tree = ast.parse(src)
    keep = [n for n in tree.body if isinstance(n, ast.FunctionDef)]
    ns = dict(np=np, cv2=cv2, ndimage=ndimage, maximum_filter=maximum_filter,
              signal=signal, random=random, Image=Image, ImageOps=ImageOps)
    # reference uses np.int (removed in numpy 2); only the 'full' branch hits it
    ns["np"] = np
    exec(compile(ast.Module(body=keep, type_ignores=[]), REF_SAMPLER, "exec"), ns)
    return ns


def _dense_flow(h=96, w=128, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    fx = 5 * np.sin(yy / 17.0) + (xx > w // 2) * 8
    fy = 3 * np.cos(xx / 23.0)
    return np.stack([fx, fy], -1) + rng.randn(h, w, 2).astype(np.float32) * 0.1


def test_grid_strategy_matches_reference():
    ns = _ref_sampler_ns()
    flow = _dense_flow()
    ref_sparse, ref_mask = ns["flow_sampler"](flow, ["grid"])
    got_sparse, got_mask = flow_sampler(flow, ("grid",))
    np.testing.assert_array_equal(got_mask, ref_mask)
    np.testing.assert_allclose(got_sparse, ref_sparse)


def test_watershed_strategy_point_set_matches_reference():
    """watershed involves RNG in neighbor elimination; compare candidate
    peak sets BEFORE elimination by running both with elimination disabled
    via monkeypatched rand -> 0 (keeps j, drops i deterministically)."""
    ns = _ref_sampler_ns()
    flow = _dense_flow(seed=1)

    class FixedRand:
        def rand(self, *a):
            return 0.0 if not a else np.zeros(a)

        def randint(self, *a, **k):
            return np.random.RandomState(0).randint(*a, **k)

        def permutation(self, n):
            return np.arange(n)

    # reference path with fixed randomness
    old_rand = ns["np"].random.rand
    np.random.rand = lambda *a: 0.0 if not a else np.zeros(a)
    try:
        ref_sparse, ref_mask = ns["flow_sampler"](flow, ["watershed"])
    finally:
        np.random.rand = old_rand

    rng = FixedRand()
    got_sparse, got_mask = flow_sampler(flow, ("watershed",), rng=rng)
    np.testing.assert_array_equal(got_mask, ref_mask)
    np.testing.assert_allclose(got_sparse, ref_sparse)


def test_clip_sample_mask_shape_and_broadcast():
    rng = np.random.RandomState(0)
    flows = rng.randn(2, 4, 64, 96, 2).astype(np.float32)
    mask = clip_sample_mask(flows)
    assert mask.shape == flows.shape
    # identical across t (sampled once from last frame)
    np.testing.assert_array_equal(mask[:, 0], mask[:, -1])
    assert mask.sum() > 0


def test_video_dataset_roundtrip():
    cv2 = pytest.importorskip("cv2")
    from mofa_tpu.train.data import WebVidDataset, read_video_clip

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "vids", "0001.mp4")
        os.makedirs(os.path.dirname(path))
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
        rng = np.random.RandomState(0)
        for i in range(20):
            vw.write((rng.rand(48, 64, 3) * 255).astype(np.uint8))
        vw.release()

        clip = read_video_clip(path, 2, 4, 3, (32, 32))
        assert clip.shape == (4, 32, 32, 3)
        assert 0.0 <= clip.min() and clip.max() <= 1.0

        csv_path = os.path.join(d, "meta.csv")
        with open(csv_path, "w") as f:
            f.write("videoid,page_dir,name\n0001,vids,test\n")
        ds = WebVidDataset(csv_path, d, sample_size=32, sample_stride=2,
                           sample_n_frames=5)
        batch = next(ds.batches(batch_size=1))
        assert batch["pixel_values01"].shape == (1, 5, 32, 32, 3)


def test_stage2_control_flow_synthesis():
    import jax
    import jax.numpy as jnp
    from mofa_tpu.models.cmp.model import CMP, CMPConfig
    from mofa_tpu.train.inputs import make_stage2_batch

    # tiny CMP (fewer layers) to keep CPU compile sane
    cfg = CMPConfig()
    cmp = CMP(cfg)
    size = 384
    params = jax.jit(lambda k: cmp.init(
        k, jnp.zeros((1, size, size, 3)), jnp.zeros((1, size, size, 2)),
        jnp.zeros((1, size, size, 2))))(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    px = rng.rand(1, 3, 64, 64, 3).astype(np.float32)
    flows = rng.randn(1, 2, 64, 64, 2).astype(np.float32) * 4
    batch = make_stage2_batch(cmp, params, px, flows,
                              rng=np.random.RandomState(1))
    assert batch["flows"].shape == (1, 2, 64, 64, 2)
    assert np.all(np.isfinite(np.asarray(batch["flows"])))


def test_stage2_input_pipeline_matches_sequential():
    """Stage2InputPipeline (host-pipelined lookahead) produces the SAME
    batches/steps as the sequential teacher->mask->CMP path when fed the
    same clips and rng — the overlap is scheduling, not math."""
    import jax
    import jax.numpy as jnp
    from mofa_tpu.models.cmp.model import CMP, CMPConfig
    from mofa_tpu.models.gmflow.model import (GMFlow, GMFlowConfig,
                                              get_optical_flows)
    from mofa_tpu.train.inputs import (Stage2InputPipeline,
                                       stage2_control_flow)

    gcfg = GMFlowConfig(num_transformer_layers=1, num_reg_refine=1)
    gmflow = GMFlow(gcfg)
    isize = (64, 96)
    gp = jax.jit(lambda k: gmflow.init(
        k, jnp.zeros((1,) + isize + (3,)),
        jnp.zeros((1,) + isize + (3,))))(jax.random.PRNGKey(0))
    cmp = CMP(CMPConfig())
    cp = jax.jit(lambda k: cmp.init(
        k, jnp.zeros((1, 384, 384, 3)), jnp.zeros((1, 384, 384, 2)),
        jnp.zeros((1, 384, 384, 2))))(jax.random.PRNGKey(1))

    rng = np.random.RandomState(3)
    clips = [rng.rand(1, 3, 64, 64, 3).astype(np.float32) for _ in range(2)]

    # sequential reference path
    seq = []
    rng_seq = np.random.RandomState(7)
    for px in clips:
        flows = np.asarray(get_optical_flows(
            gmflow, gp, jnp.asarray(px), inference_size=isize))
        dense, _ = stage2_control_flow(cmp, cp, px, flows, (64, 64),
                                       rng=rng_seq)
        seq.append(np.asarray(dense))

    pipe = Stage2InputPipeline(gmflow, gp, cmp, cp, (64, 64),
                               inference_size=isize, pair_chunk=None,
                               rng=np.random.RandomState(7))
    got = list(pipe.run(iter(clips),
                        lambda b: np.asarray(b["flows"])))
    assert len(got) == 2
    for a, b in zip(seq, got):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_dataset_clip_key_and_prefetcher_string_passthrough():
    """Batches carry the clip identity key (videoid:start:stridexn:size)
    that --flow_cache uses; DevicePrefetcher must pass string arrays
    through without trying to device_put them."""
    cv2 = pytest.importorskip("cv2")
    from mofa_tpu.train.data import WebVidDataset, DevicePrefetcher

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "vids", "0001.mp4")
        os.makedirs(os.path.dirname(path))
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
        rng = np.random.RandomState(0)
        for _ in range(20):
            vw.write((rng.rand(48, 64, 3) * 255).astype(np.uint8))
        vw.release()
        csv_path = os.path.join(d, "meta.csv")
        with open(csv_path, "w") as f:
            f.write("videoid,page_dir,name\n0001,vids,test\n")
        ds = WebVidDataset(csv_path, d, sample_size=32, sample_stride=2,
                           sample_n_frames=5, seed=11)
        loader = DevicePrefetcher(ds.batches(batch_size=1), depth=1)
        batch = next(loader)
        loader.close()
        key = str(np.atleast_1d(batch["clip_key"])[0])
        vid, start, cfgpart, size = key.split(":")
        assert vid == "0001" and cfgpart == "2x5" and size == "32"
        assert 0 <= int(start) <= 20 - (5 - 1) * 2 - 1 + 1
        # pixel tensor went to device, key stayed host
        assert batch["pixel_values01"].shape == (1, 5, 32, 32, 3)


def test_flow_cache_roundtrip(tmp_path):
    from mofa_tpu.train.flow_cache import TeacherFlowCache, clip_key

    cache = TeacherFlowCache(str(tmp_path / "fc"))
    k = clip_key("0007", 3, 4, 25, 384)
    assert cache.get(k) is None
    rng = np.random.RandomState(0)
    flows = (rng.randn(4, 16, 16, 2) * 8).astype(np.float32)
    cache.put(k, flows)
    got = cache.get(k)
    assert got is not None and got.dtype == np.float32
    # fp16 storage: relative rounding only
    np.testing.assert_allclose(got, flows, rtol=1e-3, atol=1e-2)
    assert len(cache) == 1


def test_cmp_bf16_dense_flow_bound():
    """bf16 CMP completion (--cmp_bf16) stays within half-precision
    rounding of the fp32 dense flow — the control signal the adapter
    consumes is itself bf16 downstream."""
    import jax
    import jax.numpy as jnp
    from mofa_tpu.models.cmp.model import CMP, CMPConfig
    from mofa_tpu.train.inputs import _stage2_cmp_jit

    cmp = CMP(CMPConfig())
    size = 384
    params = jax.jit(lambda k: cmp.init(
        k, jnp.zeros((1, size, size, 3)), jnp.zeros((1, size, size, 2)),
        jnp.zeros((1, size, size, 2))))(jax.random.PRNGKey(0))
    rng = np.random.RandomState(5)
    px = jnp.asarray(rng.rand(1, 2, 64, 64, 3).astype(np.float32))
    sparse = jnp.asarray(rng.randn(1, 2, 64, 64, 2).astype(np.float32) * 4)
    mask = jnp.asarray((rng.rand(1, 2, 64, 64, 2) > 0.9).astype(np.float32))

    f32 = np.asarray(_stage2_cmp_jit(cmp, params, px, sparse * mask, mask,
                                     train_size=(64, 64)))
    bf16 = np.asarray(_stage2_cmp_jit(cmp, params, px, sparse * mask, mask,
                                      train_size=(64, 64),
                                      compute_dtype=jnp.bfloat16))
    assert np.all(np.isfinite(bf16))
    scale = np.abs(f32).max() + 1e-3
    assert np.abs(bf16 - f32).max() <= 0.05 * scale, (
        np.abs(bf16 - f32).max(), scale)


def test_pipeline_cached_teacher_skips_device(tmp_path):
    """All-hit flow cache: Stage2InputPipeline never invokes the GMFlow
    teacher and reproduces the live-teacher batches up to the cache's
    fp16 storage rounding."""
    import jax
    import jax.numpy as jnp
    from mofa_tpu.models.cmp.model import CMP, CMPConfig
    from mofa_tpu.models.gmflow.model import GMFlow, GMFlowConfig
    from mofa_tpu.train.flow_cache import TeacherFlowCache
    from mofa_tpu.train.inputs import Stage2InputPipeline

    gcfg = GMFlowConfig(num_transformer_layers=1, num_reg_refine=1)
    gmflow = GMFlow(gcfg)
    isize = (64, 96)
    gp = jax.jit(lambda k: gmflow.init(
        k, jnp.zeros((1,) + isize + (3,)),
        jnp.zeros((1,) + isize + (3,))))(jax.random.PRNGKey(0))
    cmp = CMP(CMPConfig())
    cp = jax.jit(lambda k: cmp.init(
        k, jnp.zeros((1, 384, 384, 3)), jnp.zeros((1, 384, 384, 2)),
        jnp.zeros((1, 384, 384, 2))))(jax.random.PRNGKey(1))

    rng = np.random.RandomState(3)
    clips = [rng.rand(1, 3, 64, 64, 3).astype(np.float32) for _ in range(2)]
    keys = [np.asarray([f"clip:{i}"]) for i in range(2)]

    # live run fills the cache
    cache = TeacherFlowCache(str(tmp_path / "fc"))
    pipe = Stage2InputPipeline(gmflow, gp, cmp, cp, (64, 64),
                               inference_size=isize, pair_chunk=None,
                               flow_cache=cache,
                               rng=np.random.RandomState(7))
    list(pipe.run(iter(zip(keys, clips)), lambda b: np.asarray(b["flows"])))
    assert len(cache) == 2

    # expected = the sequential path fed the CACHE's fp16-rounded flows:
    # the watershed hint sampler is DISCONTINUOUS in the flow values, so
    # the fair comparison rounds the teacher identically (storage
    # precision itself is covered by test_flow_cache_roundtrip)
    from mofa_tpu.train.inputs import stage2_control_flow
    rng_seq = np.random.RandomState(7)
    want = []
    for i, px in enumerate(clips):
        flows = np.stack([cache.get(f"clip:{i}")])  # [1, t-1, h, w, 2]
        dense, _ = stage2_control_flow(cmp, cp, px, flows, (64, 64),
                                       rng=rng_seq)
        want.append(np.asarray(dense))

    # cached run: teacher must never be called
    pipe2 = Stage2InputPipeline(gmflow, gp, cmp, cp, (64, 64),
                                inference_size=isize, pair_chunk=None,
                                flow_cache=cache,
                                rng=np.random.RandomState(7))

    def _boom(px):
        raise AssertionError("teacher ran despite an all-hit cache")

    pipe2._teacher = _boom
    cached = list(pipe2.run(iter(zip(keys, clips)),
                            lambda b: np.asarray(b["flows"])))
    assert len(cached) == 2
    for a, b in zip(want, cached):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
