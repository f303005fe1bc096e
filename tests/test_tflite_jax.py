"""Golden tests for the tflite->JAX compiler (mofa_tpu/interop/tflite_jax.py)
against tf.lite.Interpreter on the reference's OWN mediapipe model files
(/root/reference/MOFA-Video-Hybrid/aniportrait/src/utils/mp_models/), i.e.
the exact weights the reference's LMKExtractor runs
(/root/reference/MOFA-Video-Hybrid/aniportrait/src/utils/mp_utils.py:19-37).

Covers all three FaceLandmarker CNNs (BlazeFace detector, 478-pt landmark
model, blendshapes MLP-mixer) plus the TF-free npz round-trip used at
deployment time.

tf.lite runs in a SUBPROCESS: importing tensorflow into the main pytest
process alongside torch (loaded by the golden suites that run earlier in
collection order) segfaults at interpreter construction — observed as a
whole-suite `pytest tests/` crash while the file passed standalone. The
subprocess generates the random inputs, runs the interpreter, and ships
inputs+outputs back via npz, so this process stays tensorflow-free.
"""

import os
import subprocess
import sys
import zipfile

import numpy as np
import pytest

from mofa_tpu.interop.tflite_jax import TFLiteGraph, compile_tflite

MP_DIR = "/root/reference/MOFA-Video-Hybrid/aniportrait/src/utils/mp_models"
TASK = os.path.join(MP_DIR, "face_landmarker_v2_with_blendshapes.task")

pytestmark = pytest.mark.skipif(
    not os.path.exists(TASK), reason="reference mp_models not mounted")

# runs in a clean child: tf.lite on the given flatbuffer with seeded
# random inputs; writes inputs (in_0, ...) and outputs keyed by tensor id
_TF_RUNNER = r"""
import sys
import numpy as np
import tensorflow as tf

buf_path, seed, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
buf = open(buf_path, "rb").read()
interp = tf.lite.Interpreter(model_content=buf)
interp.allocate_tensors()
rng = np.random.default_rng(seed)
inputs = [rng.standard_normal(d["shape"], dtype=np.float32).astype(
    d["dtype"]) for d in interp.get_input_details()]
for detail, x in zip(interp.get_input_details(), inputs):
    interp.set_tensor(detail["index"], x)
interp.invoke()
save = {f"in_{i}": x for i, x in enumerate(inputs)}
for d in interp.get_output_details():
    save[f"out_{d['index']}"] = interp.get_tensor(d["index"])
np.savez(out_path, **save)
"""


def _tf_available():
    r = subprocess.run([sys.executable, "-c", "import tensorflow"],
                       capture_output=True)
    return r.returncode == 0


def _run_tflite_subprocess(buf, seed, tmp_path):
    """Returns (inputs list, {tensor_id: output}) from a tf.lite child."""
    if not _tf_available():
        pytest.skip("tensorflow not importable")
    buf_path = str(tmp_path / "model.tflite")
    out_path = str(tmp_path / "golden.npz")
    with open(buf_path, "wb") as f:
        f.write(buf)
    r = subprocess.run([sys.executable, "-c", _TF_RUNNER, buf_path,
                        str(seed), out_path], capture_output=True, text=True)
    assert r.returncode == 0, f"tf.lite child failed:\n{r.stderr[-2000:]}"
    data = np.load(out_path)
    inputs = [data[f"in_{i}"] for i in range(
        sum(1 for k in data.files if k.startswith("in_")))]
    outputs = {int(k[4:]): data[k] for k in data.files
               if k.startswith("out_")}
    return inputs, outputs


def _tflite_bytes(member):
    with zipfile.ZipFile(TASK) as z:
        return z.read(member)


def _golden(member, tol, tmp_path, seed=0, raw_path=None):
    buf = open(raw_path, "rb").read() if raw_path else _tflite_bytes(member)
    inputs, want = _run_tflite_subprocess(buf, seed, tmp_path)

    graph = TFLiteGraph.from_bytes(buf)
    fn, params = compile_tflite(graph)
    got = fn(params, *inputs)

    assert len(got) == len(want)
    for tid, g in zip(graph.outputs, got):
        g = np.asarray(g)
        w = want[tid]
        assert g.shape == tuple(w.shape)
        np.testing.assert_allclose(g, w, atol=tol, rtol=1e-4)


def test_face_detector_golden(tmp_path):
    # BlazeFace short-range: [1,128,128,3] in [-1,1] -> boxes [1,896,16] +
    # scores [1,896,1]. fp16-folded weights => ~1e-4 scale agreement.
    _golden("face_detector.tflite", 5e-4, tmp_path)


def test_face_landmarks_golden(tmp_path):
    # 478-pt landmarker: [1,256,256,3] in [0,1] -> 1434 coords + score.
    _golden("face_landmarks_detector.tflite", 5e-4, tmp_path)


def test_blendshapes_golden(tmp_path):
    # MLP-mixer on 146 2-D landmarks -> 52 blendshape scores.
    _golden("face_blendshapes.tflite", 5e-4, tmp_path)


def test_standalone_tflite_golden(tmp_path):
    # The reference also ships a bare blaze_face_short_range.tflite.
    path = os.path.join(MP_DIR, "blaze_face_short_range.tflite")
    if not os.path.exists(path):
        pytest.skip("no standalone tflite")
    _golden(None, 5e-4, tmp_path, seed=1, raw_path=path)


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
