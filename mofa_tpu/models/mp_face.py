"""In-framework FaceLandmarker: the reference's mediapipe LMKExtractor
(/root/reference/MOFA-Video-Hybrid/aniportrait/src/utils/mp_utils.py:19-93)
rebuilt on the tflite->JAX compiler (mofa_tpu/interop/tflite_jax.py), running
the REFERENCE'S OWN model files (face_landmarker_v2_with_blendshapes.task).

Pipeline (mediapipe FaceLandmarkerGraph semantics, re-derived from the
published task-graph configs):
  1. BlazeFace short-range detection: 128x128 letterboxed [-1,1] input,
     896 SSD anchors (strides 8,16,16,16), sigmoid score clip 100,
     weighted NMS @ IoU 0.3, min score 0.5.
  2. ROI: eye-keypoint rotation (kp0->kp1, target angle 0), box scaled
     1.5x, square-long — then a rotated 256x256 [0,1] crop.
  3. Landmarks model -> 478 x (x,y,z)/256, projected back to image
     normalized coords (z scaled by ROI width); presence = sigmoid score.
  4. Blendshapes model on the 146-landmark subset in pixel coords -> 52
     scores (neutral dropped downstream, mp_utils.py:68).
  5. Geometry: weighted orthogonal Procrustes against the canonical
     metric face (parsed straight out of the .task's geometry binarypb)
     -> 4x4 facial transformation matrix + metric landmarks (lmks3d).

The three CNNs are golden vs tf.lite.Interpreter on the real weights
(tests/test_tflite_jax.py). The geometry stage is a re-derivation (weak
perspective, 63-degree vertical FOV camera per mediapipe's
pose_util.create_perspective_matrix) validated by synthetic-pose recovery
and relative-pose consistency tests plus an end-to-end run on the
reference's demo face (tests/test_mp_face.py); exact mediapipe bit-parity
is unverifiable in this image (no mediapipe), and downstream consumers
(AniPortrait pose retargeting) use relative poses, which only need
consistency. Wired into apps/audio2ldmk_app.py via --task.
"""

from __future__ import annotations

import functools
import struct
import zipfile
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mofa_tpu.interop.tflite_jax import TFLiteGraph, compile_tflite

# mediapipe/tasks/cc/vision/face_landmarker/face_blendshapes_graph.cc
# kLandmarksSubsetIdxs (146 2-D landmarks fed to the blendshape model).
BLENDSHAPE_SUBSET = np.array([
    0, 1, 4, 5, 6, 7, 8, 10, 13, 14, 17, 21, 33, 37,
    39, 40, 46, 52, 53, 54, 55, 58, 61, 63, 65, 66, 67, 70,
    78, 80, 81, 82, 84, 87, 88, 91, 93, 95, 103, 105, 107, 109,
    127, 132, 133, 136, 144, 145, 146, 148, 149, 150, 152, 153, 154, 155,
    157, 158, 159, 160, 161, 162, 163, 168, 172, 173, 176, 178, 181, 185,
    191, 195, 197, 234, 246, 249, 251, 263, 267, 269, 270, 276, 282, 283,
    284, 285, 288, 291, 293, 295, 296, 297, 300, 308, 310, 311, 312, 314,
    317, 318, 321, 323, 324, 332, 334, 336, 338, 356, 361, 362, 365, 373,
    374, 375, 377, 378, 379, 380, 381, 382, 384, 385, 386, 387, 388, 389,
    390, 397, 398, 400, 402, 405, 409, 415, 454, 466, 468, 469, 470, 471,
    472, 473, 474, 475, 476, 477], dtype=np.int32)


# ---------- geometry metadata (protobuf wire parse, no proto schema) ----------

def _varint(b: bytes, i: int) -> Tuple[int, int]:
    r, s = 0, 0
    while True:
        x = b[i]; i += 1
        r |= (x & 0x7F) << s
        if not x & 0x80:
            return r, i
        s += 7


def _wire_fields(buf: bytes):
    i = 0
    while i < len(buf):
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
            yield fno, v
        elif wt == 2:
            ln, i = _varint(buf, i)
            yield fno, buf[i:i + ln]
            i += ln
        elif wt == 5:
            yield fno, struct.unpack("<f", buf[i:i + 4])[0]
            i += 4
        elif wt == 1:
            yield fno, struct.unpack("<d", buf[i:i + 8])[0]
            i += 8
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wt}")


def parse_geometry_metadata(buf: bytes):
    """GeometryPipelineMetadata -> (canonical [468,5] xyzuv, tris [N,3],
    procrustes weights [468]).

    The canonical metric mesh has 468 vertices — the 10 iris landmarks the
    478-pt model adds have no canonical counterpart (the reference's
    `mesh3d.vertex_buffer` is likewise 468 rows, mp_utils.py:82-84)."""
    verts: List[float] = []
    tris: List[int] = []
    wrefs: List[Tuple[int, float]] = []
    for fno, v in _wire_fields(buf):
        if fno == 1:  # Mesh3d
            for f2, v2 in _wire_fields(v):
                if f2 == 3:
                    verts.append(float(v2))
                elif f2 == 4:
                    if isinstance(v2, bytes):  # packed uint32 index buffer
                        n = len(v2) // 4
                        tris.extend(struct.unpack(f"<{n}I", v2))
                    else:
                        tris.append(int(v2))
        elif fno == 2:  # WeightedLandmarkRef
            lid, wgt = 0, 0.0
            for f2, v2 in _wire_fields(v):
                if f2 == 1:
                    lid = int(v2)
                elif f2 == 2:
                    wgt = float(v2)
            wrefs.append((lid, wgt))
    canonical = np.asarray(verts, np.float32).reshape(-1, 5)
    weights = np.zeros(len(canonical), np.float32)
    for lid, wgt in wrefs:
        weights[lid] = wgt
    return canonical, np.asarray(tris, np.int64).reshape(-1, 3), weights


# ---------- BlazeFace anchors (short-range config) ----------

def blaze_anchors() -> np.ndarray:
    """896 SSD anchor centers for the 128x128 short-range face detector
    (strides [8,16,16,16], fixed anchor size, offset 0.5)."""
    anchors = []
    for stride, per_cell in ((8, 2), (16, 6)):
        g = 128 // stride
        for y in range(g):
            for x in range(g):
                cx, cy = (x + 0.5) / g, (y + 0.5) / g
                anchors.extend([(cx, cy)] * per_cell)
    return np.asarray(anchors, np.float32)  # [896, 2]


def decode_detections(raw_boxes: np.ndarray, raw_scores: np.ndarray,
                      anchors: np.ndarray, score_thresh: float = 0.5):
    """TensorsToDetections: [896,16]+[896,1] -> (boxes xyxy, 6 kps, scores),
    coords normalized to the 128-square input."""
    s = 1.0 / 128.0
    scores = 1.0 / (1.0 + np.exp(-np.clip(
        raw_scores[:, 0].astype(np.float64), -100, 100)))
    keep = scores >= score_thresh
    rb, a, scores = raw_boxes[keep], anchors[keep], scores[keep]
    cx, cy = rb[:, 0] * s + a[:, 0], rb[:, 1] * s + a[:, 1]
    w, h = rb[:, 2] * s, rb[:, 3] * s
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    kps = rb[:, 4:16].reshape(-1, 6, 2) * s + a[:, None, :]
    return boxes, kps, scores


def weighted_nms(boxes, kps, scores, iou_thresh: float = 0.3):
    """Mediapipe WEIGHTED NMS: blend overlapping candidates score-weighted."""
    order = np.argsort(-scores)
    out = []
    alive = np.ones(len(scores), bool)
    for i in order:
        if not alive[i]:
            continue
        ix1 = np.maximum(boxes[i, 0], boxes[:, 0])
        iy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        ix2 = np.minimum(boxes[i, 2], boxes[:, 2])
        iy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(ix2 - ix1, 0) * np.maximum(iy2 - iy1, 0)
        area = ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
                + (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                - inter)
        iou = np.where(area > 0, inter / np.maximum(area, 1e-12), 0.0)
        group = alive & (iou > iou_thresh)
        wsum = scores[group].sum()
        out.append((
            (boxes[group] * scores[group, None]).sum(0) / wsum,
            (kps[group] * scores[group, None, None]).sum(0) / wsum,
            scores[i]))
        alive &= ~group
    return out


# ---------- the landmarker ----------

def detect_face(det_fn, det_params, img01: np.ndarray):
    """BlazeFace short-range detection on one frame. img01 [H,W,3] float in
    [0,1] -> best face (box xyxy, 6 kps, score) in image-normalized coords,
    or None. Standalone so the driving-video fitter
    (preprocess/video_fit.py) can use it without the landmark models."""
    h, w = img01.shape[:2]
    size = max(h, w)
    pad_y, pad_x = (size - h) // 2, (size - w) // 2
    sq = np.zeros((size, size, 3), np.float32)
    sq[pad_y:pad_y + h, pad_x:pad_x + w] = img01
    x = jax.image.resize(jnp.asarray(sq), (128, 128, 3), "linear")
    x = x[None] * 2.0 - 1.0
    raw_box, raw_score = det_fn(det_params, x)
    boxes, kps, scores = decode_detections(
        np.asarray(raw_box)[0], np.asarray(raw_score)[0], blaze_anchors())
    if len(scores) == 0:
        return None
    dets = weighted_nms(boxes, kps, scores)
    box, kp, score = dets[0]
    # letterbox-square [0,1] -> image-normalized [0,1]
    def unpad(pts):
        pts = pts * size
        pts[..., 0] = (pts[..., 0] - pad_x) / w
        pts[..., 1] = (pts[..., 1] - pad_y) / h
        return pts
    return unpad(box.reshape(2, 2)).reshape(4), unpad(kp), score


def load_face_detector(path: str):
    """(det_fn jitted, det_params) from a bare BlazeFace .tflite or a
    face_landmarker .task bundle (both ship with the reference)."""
    if path.endswith(".task"):
        graph = TFLiteGraph.from_task(path, "face_detector.tflite")
    elif path.endswith(".npz"):
        graph = TFLiteGraph.load_npz(path)
    else:
        graph = TFLiteGraph.from_path(path)
    fn, params = compile_tflite(graph)
    return jax.jit(fn), params


@dataclass(eq=False)  # identity hash: `self` is a static jit arg in _crop256
class FaceLandmarkerJax:
    """Callable LMKExtractor replacement. Build via `load_face_landmarker`."""

    det_fn: object
    det_params: Dict
    lmk_fn: object
    lmk_params: Dict
    bs_fn: object
    bs_params: Dict
    canonical: np.ndarray        # [468, 5] xyzuv (metric mesh)
    tris: np.ndarray             # [N, 3]
    proc_weights: np.ndarray     # [468]

    # --- model stages (jitted) ---

    def _detect(self, img01: np.ndarray):
        """img01 [H,W,3] float in [0,1] -> best face, via detect_face."""
        return detect_face(self.det_fn, self.det_params, img01)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _crop256(self, img, cx, cy, half, rot):
        """Rotated square crop (pixel coords) -> [1,256,256,3] in [0,1]."""
        h, w = img.shape[:2]
        u = (jnp.arange(256) + 0.5) / 256.0 * 2.0 - 1.0
        gy, gx = jnp.meshgrid(u, u, indexing="ij")
        c, s = jnp.cos(rot), jnp.sin(rot)
        sx = cx + half * (gx * c - gy * s)
        sy = cy + half * (gx * s + gy * c)
        x0 = jnp.floor(sx - 0.5); y0 = jnp.floor(sy - 0.5)
        fx = sx - 0.5 - x0; fy = sy - 0.5 - y0
        def tap(xi, yi):
            xi = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
            yi = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
            return img[yi, xi]
        v = (tap(x0, y0) * ((1 - fx) * (1 - fy))[..., None]
             + tap(x0 + 1, y0) * (fx * (1 - fy))[..., None]
             + tap(x0, y0 + 1) * ((1 - fx) * fy)[..., None]
             + tap(x0 + 1, y0 + 1) * (fx * fy)[..., None])
        return v[None]

    # --- geometry (weighted Procrustes vs the canonical metric face) ---

    def _solve_pose(self, lmks: np.ndarray, aspect: float):
        """Normalized screen landmarks [478,3] -> (trans_mat [4,4],
        metric landmarks [468,3] — the canonical-mesh vertex count; the 10
        iris points have no metric counterpart, matching the reference's
        `mesh3d.vertex_buffer` contract (mp_utils.py:82-84)).

        Weak-perspective re-derivation of mediapipe's geometry pipeline:
        unproject to the near plane of the 63-degree vFOV camera
        (pose_util.create_perspective_matrix), then solve the weighted
        orthogonal Procrustes problem (weights from the .task metadata)
        canonical -> runtime for (s, R, t); depth from the weak-perspective
        relation d = near/s. lmks3d = runtime expressed in the canonical
        (metric) frame — rigid pose removed, expression deformation kept."""
        near = 1.0
        top = near * np.tan(np.radians(63.0 / 2))
        right = top * aspect
        n = len(self.canonical)                   # 468: drop iris landmarks
        x = (lmks[:n, 0] * 2 - 1) * right
        y = -(lmks[:n, 1] * 2 - 1) * top          # y up in metric space
        z = -lmks[:n, 2] * right                  # z toward the camera
        runtime = np.stack([x, y, z], -1)

        can = self.canonical[:, :3]
        wgt = self.proc_weights[:, None]
        wsum = self.proc_weights.sum()
        mu_r = (runtime * wgt).sum(0) / wsum
        mu_c = (can * wgt).sum(0) / wsum
        rc, cc = runtime - mu_r, can - mu_c
        cov = (rc * wgt).T @ cc
        U, S, Vt = np.linalg.svd(cov)
        d = np.sign(np.linalg.det(U @ Vt))
        D = np.diag([1.0, 1.0, d])
        R = U @ D @ Vt
        var_c = ((cc ** 2) * wgt).sum()
        scale = (S * np.diag(D)).sum() / max(var_c, 1e-12)
        t = mu_r - scale * R @ mu_c
        depth = near / max(scale, 1e-9)

        trans = np.eye(4, dtype=np.float32)
        trans[:3, :3] = R
        trans[:3, 3] = np.array([t[0] / scale, t[1] / scale, -depth],
                                np.float32)
        metric = (runtime - t) @ R / scale        # R^-1 (runtime - t) / s
        return trans, metric.astype(np.float32)

    # --- full pipeline ---

    def __call__(self, img_rgb: np.ndarray) -> Optional[dict]:
        """img_rgb uint8/float [H,W,3] -> mp_utils.LMKExtractor dict
        (lmks [478,3] image-normalized, lmks3d [468,3] metric, trans_mat
        [4,4], faces [N,3] 1-based, bs [51]) or None if no face."""
        img01 = np.asarray(img_rgb, np.float32)
        if img01.max() > 2.0:
            img01 = img01 / 255.0
        h, w = img01.shape[:2]

        det = self._detect(img01)
        if det is None:
            return None
        box, kp, _ = det
        # FaceDetectionsToRoi: eye-line rotation, 1.5x square-long box
        rot = float(np.arctan2(-(kp[1, 1] - kp[0, 1]) * h,
                               (kp[1, 0] - kp[0, 0]) * w))
        cx, cy = (box[0] + box[2]) / 2 * w, (box[1] + box[3]) / 2 * h
        side = max((box[2] - box[0]) * w, (box[3] - box[1]) * h)
        half = side * 1.5 / 2

        crop = self._crop256(jnp.asarray(img01), jnp.float32(cx),
                             jnp.float32(cy), jnp.float32(half),
                             jnp.float32(-rot))
        out = self.lmk_fn(self.lmk_params, crop)
        raw = np.asarray(out[0]).reshape(478, 3) / 256.0
        presence = 1.0 / (1.0 + np.exp(-float(np.asarray(out[1]).ravel()[0])))
        if presence < 0.5:
            return None

        c, s = np.cos(-rot), np.sin(-rot)
        lx, ly = raw[:, 0] * 2 - 1, raw[:, 1] * 2 - 1
        px = cx + half * (lx * c - ly * s)
        py = cy + half * (lx * s + ly * c)
        pz = raw[:, 2] * (2 * half) / w           # z scaled by ROI width
        lmks = np.stack([px / w, py / h, pz], -1).astype(np.float32)

        sel = lmks[BLENDSHAPE_SUBSET][:, :2] * np.array([w, h], np.float32)
        bs = np.asarray(self.bs_fn(self.bs_params, jnp.asarray(sel)[None])[0])

        trans_mat, metric = self._solve_pose(lmks, w / h)
        return {"lmks": lmks, "lmks3d": metric, "trans_mat": trans_mat,
                "faces": self.tris + 1, "bs": bs[1:].astype(np.float32)}


def load_face_landmarker(task_path: str) -> FaceLandmarkerJax:
    """Build from a mediapipe face_landmarker .task bundle (the reference
    ships one at aniportrait/src/utils/mp_models/)."""
    with zipfile.ZipFile(task_path) as z:
        det = TFLiteGraph.from_bytes(z.read("face_detector.tflite"))
        lmk = TFLiteGraph.from_bytes(z.read("face_landmarks_detector.tflite"))
        bs = TFLiteGraph.from_bytes(z.read("face_blendshapes.tflite"))
        canonical, tris, wgt = parse_geometry_metadata(
            z.read("geometry_pipeline_metadata_landmarks.binarypb"))
    det_fn, det_p = compile_tflite(det)
    lmk_fn, lmk_p = compile_tflite(lmk)
    bs_fn, bs_p = compile_tflite(bs)
    return FaceLandmarkerJax(jax.jit(det_fn), det_p, jax.jit(lmk_fn), lmk_p,
                             jax.jit(bs_fn), bs_p, canonical, tris, wgt)
