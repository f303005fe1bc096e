"""Offline teacher-flow cache for stage-1/2 training.

The GMFlow teacher is DETERMINISTIC per clip (anchor-frame0 -> frame_i
flows of fixed frames; models/gmflow/model.py:get_optical_flows), yet the
reference recomputes it inline every step — 6.3 s of the measured 11.5 s
stage-2 step (BENCH_stage2_r04.json; reference hot loop
/root/reference/Training/train_stage2.py:1249-1268 via train_stage1.py:
113-143). Precomputing it offline removes that device time entirely.

Clip identity: the WebVid sampler draws (video, start) from a SEEDED rng
(train/data.py), so a precompute pass that replays the same seed visits
exactly the training clip sequence; each clip's flows are stored under the
key "<videoid>:<start>:<stride>x<n_frames>:<sample_size>" (sha1-named npz,
fp16 — the bf16-teacher EPE bound in
tests/test_gmflow_golden.py::test_teacher_bf16_epe_bound already covers
half-precision flow storage). `apps/train_app.py --precompute_flows` runs
the pass; `--flow_cache DIR` consumes it (misses fall back to the live
teacher and are filled in, so a partial cache is still correct).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np


def clip_key(videoid: str, start: int, stride: int, n_frames: int,
             sample_size: int) -> str:
    return f"{videoid}:{start}:{stride}x{n_frames}:{sample_size}"


class TeacherFlowCache:
    """npz-per-clip store of teacher flows [t-1, h, w, 2] (saved fp16)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        h = hashlib.sha1(key.encode()).hexdigest()[:24]
        return os.path.join(self.root, f"{h}.npz")

    def get(self, key: str) -> np.ndarray | None:
        path = self._path(key)
        if not os.path.exists(path):
            return None
        with np.load(path) as z:
            if str(z["key"]) != key:   # hash-prefix collision guard
                return None
            return z["flows"].astype(np.float32)

    def put(self, key: str, flows: np.ndarray) -> None:
        tmp = self._path(key) + ".tmp"
        with open(tmp, "wb") as f:   # file object: np.savez must not append .npz
            np.savez_compressed(f, key=np.str_(key),
                                flows=np.asarray(flows, np.float16))
        os.replace(tmp, self._path(key))   # atomic vs concurrent readers

    def get_batch(self, keys) -> np.ndarray | None:
        """Stacked flows [b, t-1, h, w, 2] if EVERY key hits, else None.
        Accepts any array/sequence of keys (normalized via str())."""
        hits = [self.get(str(k)) for k in np.atleast_1d(np.asarray(keys))]
        if any(h is None for h in hits):
            return None
        return np.stack(hits)

    def put_batch(self, keys, flows: np.ndarray) -> None:
        for k, f in zip(np.atleast_1d(np.asarray(keys)), flows):
            self.put(str(k), f)

    def __len__(self) -> int:
        return sum(1 for f in os.listdir(self.root) if f.endswith(".npz"))
