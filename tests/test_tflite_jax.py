"""Golden tests for the tflite->JAX compiler (mofa_tpu/interop/tflite_jax.py)
against tf.lite.Interpreter on the reference's OWN mediapipe model files
(/root/reference/MOFA-Video-Hybrid/aniportrait/src/utils/mp_models/), i.e.
the exact weights the reference's LMKExtractor runs
(/root/reference/MOFA-Video-Hybrid/aniportrait/src/utils/mp_utils.py:19-37).

Covers all three FaceLandmarker CNNs (BlazeFace detector, 478-pt landmark
model, blendshapes MLP-mixer) plus the TF-free npz round-trip used at
deployment time.
"""

import os
import zipfile

import numpy as np
import pytest

from mofa_tpu.interop.tflite_jax import TFLiteGraph, compile_tflite

MP_DIR = "/root/reference/MOFA-Video-Hybrid/aniportrait/src/utils/mp_models"
TASK = os.path.join(MP_DIR, "face_landmarker_v2_with_blendshapes.task")

pytestmark = pytest.mark.skipif(
    not os.path.exists(TASK), reason="reference mp_models not mounted")

tf = pytest.importorskip("tensorflow")


def _tflite_bytes(member):
    with zipfile.ZipFile(TASK) as z:
        return z.read(member)


def _run_tflite(buf, inputs):
    """Run tf.lite; return {tensor_id: output} keyed like graph.outputs."""
    interp = tf.lite.Interpreter(model_content=buf)
    interp.allocate_tensors()
    for detail, x in zip(interp.get_input_details(), inputs):
        interp.set_tensor(detail["index"], x)
    interp.invoke()
    return {d["index"]: interp.get_tensor(d["index"])
            for d in interp.get_output_details()}


def _golden(member, tol):
    buf = _tflite_bytes(member)
    interp = tf.lite.Interpreter(model_content=buf)
    interp.allocate_tensors()
    rng = np.random.default_rng(0)
    inputs = [rng.standard_normal(d["shape"], dtype=np.float32).astype(
        d["dtype"]) for d in interp.get_input_details()]
    want = _run_tflite(buf, inputs)

    graph = TFLiteGraph.from_bytes(buf)
    fn, params = compile_tflite(graph)
    got = fn(params, *inputs)

    assert len(got) == len(want)
    for tid, g in zip(graph.outputs, got):
        g = np.asarray(g)
        w = want[tid]
        assert g.shape == tuple(w.shape)
        np.testing.assert_allclose(g, w, atol=tol, rtol=1e-4)


def test_face_detector_golden():
    # BlazeFace short-range: [1,128,128,3] in [-1,1] -> boxes [1,896,16] +
    # scores [1,896,1]. fp16-folded weights => ~1e-4 scale agreement.
    _golden("face_detector.tflite", tol=5e-4)


def test_face_landmarks_golden():
    # 478-pt landmarker: [1,256,256,3] in [0,1] -> 1434 coords + score.
    _golden("face_landmarks_detector.tflite", tol=5e-4)


def test_blendshapes_golden():
    # MLP-mixer on 146 2-D landmarks -> 52 blendshape scores.
    _golden("face_blendshapes.tflite", tol=5e-4)


def test_standalone_tflite_golden():
    # The reference also ships a bare blaze_face_short_range.tflite.
    path = os.path.join(MP_DIR, "blaze_face_short_range.tflite")
    if not os.path.exists(path):
        pytest.skip("no standalone tflite")
    buf = open(path, "rb").read()
    interp = tf.lite.Interpreter(model_content=buf)
    interp.allocate_tensors()
    rng = np.random.default_rng(1)
    inputs = [rng.standard_normal(d["shape"], dtype=np.float32)
              for d in interp.get_input_details()]
    want = _run_tflite(buf, inputs)
    graph = TFLiteGraph.from_bytes(buf)
    fn, params = compile_tflite(graph)
    got = fn(params, *inputs)
    for tid, g in zip(graph.outputs, got):
        np.testing.assert_allclose(np.asarray(g), want[tid],
                                   atol=5e-4, rtol=1e-4)


def test_npz_roundtrip(tmp_path):
    # TF-free deployment path: parse once, save_npz, reload with zero TF
    # dependency, bitwise-identical outputs.
    buf = _tflite_bytes("face_blendshapes.tflite")
    g1 = TFLiteGraph.from_bytes(buf)
    p = str(tmp_path / "bs.npz")
    g1.save_npz(p)
    g2 = TFLiteGraph.load_npz(p)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 146, 2)).astype(np.float32)
    fn1, p1 = compile_tflite(g1)
    fn2, p2 = compile_tflite(g2)
    a = [np.asarray(t) for t in fn1(p1, x)]
    b = [np.asarray(t) for t in fn2(p2, x)]
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(x1, x2)
