"""Flow-dataset layout discovery + KITTI 16-bit PNG flow codec."""

import numpy as np
from PIL import Image

from mofa_tpu.ops.flow_viz import write_flo
from mofa_tpu.train.flow_datasets import (discover_flow_samples, load_sample,
                                          read_flow_kitti, write_flow_kitti,
                                          read_pfm, write_pfm)


def _img(path, h=8, w=10, seed=0):
    rng = np.random.RandomState(seed)
    Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(path)


def test_kitti_png_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    flow = np.round(rng.randn(6, 7, 2).astype(np.float32) * 64) / 64
    p = str(tmp_path / "f.png")
    write_flow_kitti(p, flow)
    back, valid = read_flow_kitti(p)
    np.testing.assert_allclose(back, flow, atol=1 / 64)
    assert (valid == 1).all()


def test_triples_layout(tmp_path):
    _img(tmp_path / "a_img1.png"); _img(tmp_path / "a_img2.png", seed=1)
    write_flo(np.zeros((8, 10, 2), np.float32), str(tmp_path / "a_flow.flo"))
    s = discover_flow_samples(str(tmp_path))  # auto sniff
    assert len(s) == 1 and s[0].flow_format == "flo"
    i1, i2, fl, va = load_sample(s[0])
    assert fl.shape == (8, 10, 2) and (va == 1).all()


def test_chairs_layout(tmp_path):
    for i in (1, 2):
        for j in (1, 2):
            _img(tmp_path / f"{i:05d}_img{j}.ppm", seed=i * 2 + j)
        # huge magnitude marks invalid pixels in .flo datasets
        f = np.zeros((8, 10, 2), np.float32)
        f[0, 0] = 1e10
        write_flo(f, str(tmp_path / f"{i:05d}_flow.flo"))
    s = discover_flow_samples(str(tmp_path), "chairs")
    assert len(s) == 2
    assert s[0].img1_path.endswith("00001_img1.ppm")
    assert s[0].img2_path.endswith("00001_img2.ppm")
    _, _, _, va = load_sample(s[0])
    assert va[0, 0] == 0 and va[1:].all()


def test_sintel_layout(tmp_path):
    scene = tmp_path / "training" / "clean" / "alley_1"
    flows = tmp_path / "training" / "flow" / "alley_1"
    scene.mkdir(parents=True); flows.mkdir(parents=True)
    for i in range(3):
        _img(scene / f"frame_{i:04d}.png", seed=i)
    for i in range(2):
        write_flo(np.zeros((8, 10, 2), np.float32),
                  str(flows / f"frame_{i:04d}.flo"))
    s = discover_flow_samples(str(tmp_path))  # auto sniff
    assert len(s) == 2
    assert s[1].img1_path.endswith("frame_0001.png")
    assert s[1].img2_path.endswith("frame_0002.png")


def test_pfm_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    flow = rng.randn(6, 9, 2).astype(np.float32) * 10
    p = str(tmp_path / "f.pfm")
    write_pfm(p, flow)
    np.testing.assert_array_equal(read_pfm(p), flow)


def test_things_layout(tmp_path):
    """FlyingThings3D: into_future keeps pair order, into_past swaps it
    and takes the next flow (datasets.py:221-227)."""
    idir = tmp_path / "frames_cleanpass" / "TRAIN" / "A" / "0000" / "left"
    fdirs = {d: tmp_path / "optical_flow" / "TRAIN" / "A" / "0000" / d / "left"
             for d in ("into_future", "into_past")}
    idir.mkdir(parents=True)
    for d in fdirs.values():
        d.mkdir(parents=True)
    for i in range(3):
        _img(idir / f"{i:04d}.png", seed=i)
        for d, p in fdirs.items():
            write_pfm(str(p / f"{i:04d}.pfm"),
                      np.full((8, 10, 2), float(i), np.float32))
    s = discover_flow_samples(str(tmp_path))  # auto sniff
    assert len(s) == 4  # 2 per direction
    fut = [x for x in s if "into_future" in x.flow_path]
    past = [x for x in s if "into_past" in x.flow_path]
    assert fut[0].img1_path.endswith("0000.png")
    assert fut[0].img2_path.endswith("0001.png")
    assert fut[0].flow_path.endswith("0000.pfm")
    assert past[0].img1_path.endswith("0001.png")
    assert past[0].img2_path.endswith("0000.png")
    assert past[0].flow_path.endswith("0001.pfm")
    _, _, fl, va = load_sample(past[0])
    np.testing.assert_array_equal(fl, 1.0)
    assert (va == 1).all()


def test_kitti_layout(tmp_path):
    img2 = tmp_path / "training" / "image_2"
    occ = tmp_path / "training" / "flow_occ"
    img2.mkdir(parents=True); occ.mkdir(parents=True)
    _img(img2 / "000000_10.png"); _img(img2 / "000000_11.png", seed=1)
    write_flow_kitti(str(occ / "000000_10.png"),
                     np.ones((8, 10, 2), np.float32))
    s = discover_flow_samples(str(tmp_path))  # auto sniff
    assert len(s) == 1 and s[0].flow_format == "kitti_png"
    _, _, fl, va = load_sample(s[0])
    np.testing.assert_allclose(fl, 1.0, atol=1 / 64)
    assert (va == 1).all()
