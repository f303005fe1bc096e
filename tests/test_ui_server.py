"""Browser-UI server: HTTP plumbing + preprocess semantics.

The heavy generation path inside /run is the same DragFlowEngine +
TrajPipeline already covered by the CLI/pipeline tests; here it is
faked so the test exercises routing, encoding, and state handling."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np

from mofa_tpu.apps.ui_server import (
    TrajUIBackend, _array_to_data_url, _data_url_to_array, build_parser,
    make_handler)


def _png_url(arr):
    return _array_to_data_url(arr)


def test_data_url_roundtrip():
    arr = (np.random.RandomState(0).rand(20, 30, 3) * 255).astype(np.uint8)
    back = _data_url_to_array(_array_to_data_url(arr))
    np.testing.assert_array_equal(arr, back)


def test_backend_preprocess_crops_to_64():
    args = build_parser().parse_args(["--tiny", "--target_size", "128"])
    backend = TrajUIBackend(args)
    img = (np.random.RandomState(1).rand(200, 260, 3) * 255).astype(np.uint8)
    out = backend.preprocess({"image": _png_url(img), "target_size": 128})
    assert out["height"] % 64 == 0 and out["width"] % 64 == 0
    got = _data_url_to_array(out["image"])
    assert got.shape[:2] == (out["height"], out["width"])


def test_http_roundtrip(monkeypatch):
    from http.server import ThreadingHTTPServer

    args = build_parser().parse_args(
        ["--tiny", "--num_frames", "3", "--num_inference_steps", "1"])
    backend = TrajUIBackend(args)

    def fake_drag_flow(image01, tracks, brush=None):
        h, w = image01.shape[:2]
        assert len(tracks) == 1 and len(tracks[0]) == 2
        if brush is not None:
            assert brush.max() > 0
        return np.zeros((1, args.num_frames - 1, h, w, 2), np.float32)

    class FakePipe:
        def __call__(self, image, flow, **kw):
            t = flow.shape[1] + 1
            h, w = image.shape[1:3]
            return np.zeros((1, t, h, w, 3), np.float32), None

    monkeypatch.setattr(backend, "_drag_flow", fake_drag_flow)
    monkeypatch.setattr(backend, "pipeline", lambda: FakePipe())

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(backend))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        page = urllib.request.urlopen(base + "/").read().decode()
        assert "MOFA" in page and "canvas" in page

        img = (np.random.RandomState(2).rand(64, 64, 3) * 255).astype(np.uint8)
        body = json.dumps({
            "image": _png_url(img),
            "tracks": [[[3, 4], [10, 12]]],
            "brush": _png_url(np.full((64, 64, 3), 255, np.uint8)),
        }).encode()
        req = urllib.request.Request(
            base + "/run", data=body,
            headers={"Content-Type": "application/json"})
        resp = json.loads(urllib.request.urlopen(req).read())
        assert resp["video"] == "/video"

        video = urllib.request.urlopen(base + "/video").read()
        assert video[:8] != b"" and len(video) > 100

        # error path surfaces as 500 with message
        bad = urllib.request.Request(
            base + "/run", data=json.dumps(
                {"image": _png_url(img), "tracks": []}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad)
            assert False, "expected 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500 and "trajectory" in e.read().decode()
    finally:
        httpd.shutdown()


def test_run_landmarks_route(monkeypatch, tmp_path):
    import io as _io
    from mofa_tpu.apps import hybrid_app

    args = build_parser().parse_args(["--tiny"])
    backend = TrajUIBackend(args)

    seen = {}

    def fake_run(parsed):
        seen["landmarks"] = np.load(parsed.landmarks)
        seen["tiny"] = parsed.tiny
        seen["mask"] = parsed.face_mask
        open(parsed.output, "wb").write(b"\x00" * 200)

    monkeypatch.setattr(hybrid_app, "run", fake_run)

    img = (np.random.RandomState(3).rand(32, 32, 3) * 255).astype(np.uint8)
    lm = np.random.RandomState(4).rand(5, 68, 2).astype(np.float32)
    buf = _io.BytesIO()
    np.save(buf, lm)

    resp = backend.run_landmarks({
        "image": _array_to_data_url(img),
        "landmarks": base64.b64encode(buf.getvalue()).decode(),
        "mode": "hybrid",
        "brush": _array_to_data_url(np.full((32, 32, 3), 255, np.uint8)),
    })
    assert resp["video"] == "/video"
    assert backend.last_video and len(backend.last_video) == 200
    np.testing.assert_array_equal(seen["landmarks"], lm)
    assert seen["tiny"] and seen["mask"] is not None

    import pytest as _pytest
    with _pytest.raises(ValueError, match="landmarks"):
        backend.run_landmarks({"image": _array_to_data_url(img),
                               "mode": "hybrid"})
    with _pytest.raises(ValueError, match="mode"):
        backend.run_landmarks({"image": _array_to_data_url(img),
                               "landmarks": "aa", "mode": "bogus"})
