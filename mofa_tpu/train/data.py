"""Training data pipeline: WebVid-style clip dataset + device prefetch.

Re-derivation of `WebVid10M` (/root/reference/Training/train_utils/
dataset.py:34-139): CSV metadata (videoid, page_dir, name), random clip of
`sample_n_frames` at `sample_stride`, resize to `sample_size`, values in
(0, 1), infinite retry on decode failure. decord isn't available in this
image, so decoding uses cv2.VideoCapture; layout is channel-last
[T, H, W, 3] feeding `jax.device_put` prefetch (host->HBM overlap).
"""

from __future__ import annotations

import csv
import os
import queue
import threading
from typing import Iterator

import numpy as np


def read_video_clip(path: str, start: int, n_frames: int, stride: int,
                    size: tuple[int, int]) -> np.ndarray:
    """Decode frames [start, start+stride, ...] -> [n, H, W, 3] float32 (0,1)."""
    import cv2
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    frames = []
    want = [start + i * stride for i in range(n_frames)]
    want_set = set(want)
    last = want[-1]
    i = 0
    ok = True
    while ok and i <= last:
        ok, frame = cap.read()
        if not ok:
            break
        if i in want_set:
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            frame = cv2.resize(frame, (size[1], size[0]),
                               interpolation=cv2.INTER_LINEAR)
            frames.append(frame)
        i += 1
    cap.release()
    if len(frames) != n_frames:
        raise IOError(f"short video {path}: got {len(frames)}/{n_frames}")
    return np.stack(frames).astype(np.float32) / 255.0


def video_length(path: str) -> int:
    import cv2
    cap = cv2.VideoCapture(path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    return n


class WebVidDataset:
    """CSV-driven clip sampler with infinite retry (dataset.py:77-110)."""

    def __init__(self, csv_path: str, video_folder: str,
                 sample_size: int = 384, sample_stride: int = 4,
                 sample_n_frames: int = 25, seed: int = 0):
        with open(csv_path, newline="") as f:
            self.rows = list(csv.DictReader(f))
        self.video_folder = video_folder
        self.sample_size = sample_size
        self.sample_stride = sample_stride
        self.sample_n_frames = sample_n_frames
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.rows)

    def _video_path(self, row) -> str:
        return os.path.join(self.video_folder, row.get("page_dir", ""),
                            f"{row['videoid']}.mp4")

    def _get_clip(self, index: int):
        row = self.rows[index]
        path = self._video_path(row)
        total = video_length(path)
        span = (self.sample_n_frames - 1) * self.sample_stride + 1
        if total < span:
            raise IOError(f"{path}: {total} < {span} frames")
        start = self.rng.randint(0, total - span + 1)
        clip = read_video_clip(path, start, self.sample_n_frames,
                               self.sample_stride,
                               (self.sample_size, self.sample_size))
        from mofa_tpu.train.flow_cache import clip_key
        return clip, clip_key(row["videoid"], start, self.sample_stride,
                              self.sample_n_frames, self.sample_size)

    def __getitem__(self, index: int) -> dict:
        while True:  # infinite retry-on-failure, like the reference
            try:
                clip, key = self._get_clip(index)
                # clip_key names the (video, start) draw — the seeded rng
                # makes the draw sequence replayable, which is what lets
                # --precompute_flows / --flow_cache pre-stage the teacher
                return {"pixel_values01": clip, "clip_key": key}
            except Exception:
                index = self.rng.randint(0, len(self.rows))

    def batches(self, batch_size: int, shuffle: bool = True) -> Iterator[dict]:
        order = np.arange(len(self.rows))
        while True:
            if shuffle:
                self.rng.shuffle(order)
            for i in range(0, len(order) - batch_size + 1, batch_size):
                items = [self[j] for j in order[i:i + batch_size]]
                yield {k: np.stack([it[k] for it in items]) for k in items[0]}


class DevicePrefetcher:
    """Background-thread host->device staging (the decord-dataloader
    equivalent for TPU: decode on host threads, device_put ahead of use)."""

    def __init__(self, iterator: Iterator[dict], depth: int = 2,
                 sharding=None):
        import jax
        self._jax = jax
        self.iterator = iterator
        self.sharding = sharding
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _worker(self):
        for batch in self.iterator:
            if self._stop.is_set():
                return
            arrs = {k: (v if np.asarray(v).dtype.kind in "US"
                        else self._jax.device_put(v, self.sharding))
                    for k, v in batch.items()}  # string keys stay on host
            self.q.put(arrs)
        self.q.put(None)

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is None:
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
