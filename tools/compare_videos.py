"""Video fidelity comparison: PSNR / per-frame MSE between two videos.

The BASELINE.json acceptance metric is output PSNR > 35 dB vs the CUDA
reference; this tool computes it once reference outputs + converted
checkpoints are available:

    python tools/compare_videos.py ours.mp4 reference.mp4
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def read_video(path: str) -> np.ndarray:
    import cv2
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    assert frames, f"no frames decoded from {path}"
    return np.stack(frames).astype(np.float64)


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("ours")
    p.add_argument("reference")
    args = p.parse_args(argv)
    a = read_video(args.ours)
    b = read_video(args.reference)
    t = min(len(a), len(b))
    if a.shape[1:] != b.shape[1:]:
        raise SystemExit(f"shape mismatch: {a.shape} vs {b.shape}")
    per_frame = [psnr(a[i], b[i]) for i in range(t)]
    out = {"frames": t, "psnr_mean": float(np.mean(per_frame)),
           "psnr_min": float(np.min(per_frame)),
           "passes_35db": bool(np.mean(per_frame) > 35.0)}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
