"""Video reading + mean-video tool (host side).

The reference uses a PyAV packet-ToC ``VideoReader``
(``utils/utils.py:117-250``); PyAV is not available here, so random access is
built on OpenCV with a small frame cache. Short training clips (~60 frames)
are decoded sequentially up to the highest requested index.

``compute_mean_video`` is the equivalent of reference
``data/average_gt_video.py`` (temporal mean of every frame → the "mean video"
background target of SLR stage 2).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


class VideoReader:
    """Random-access frame reader returning (H, W, 3) uint8 RGB frames."""

    def __init__(self, path: str):
        import cv2

        self.path = path
        self._cv2 = cv2
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            raise IOError(f"cannot open video: {path}")
        self._n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self._h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self._w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        cap.release()
        self._cache: Dict[int, np.ndarray] = {}
        self._next = 0
        self._cap = None

    def __len__(self) -> int:
        return self._n

    @property
    def height(self):
        return self._h

    @property
    def width(self):
        return self._w

    def _ensure_upto(self, idx: int):
        if idx in self._cache:
            return
        cv2 = self._cv2
        if self._cap is None or idx < self._next:
            if self._cap is not None:
                self._cap.release()
            self._cap = cv2.VideoCapture(self.path)
            self._next = 0
        while self._next <= idx:
            ok, frame = self._cap.read()
            if not ok:
                raise IndexError(f"frame {idx} beyond end of {self.path}")
            self._cache[self._next] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            self._next += 1

    def __getitem__(self, idx: int) -> np.ndarray:
        if idx < 0:
            idx += self._n
        self._ensure_upto(idx)
        return self._cache[idx]

    def frames(self, indices: Sequence[int]) -> List[np.ndarray]:
        return [self[i] for i in indices]

    def close(self):
        if self._cap is not None:
            self._cap.release()
            self._cap = None
        self._cache.clear()


def compute_mean_video(video_path: str,
                       max_frames: Optional[int] = None) -> np.ndarray:
    """Temporal mean of all frames → (H, W, 3) uint8 (reference
    data/average_gt_video.py)."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    acc = None
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok or (max_frames is not None and n >= max_frames):
            break
        f = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB).astype(np.float64)
        acc = f if acc is None else acc + f
        n += 1
    cap.release()
    if acc is None:
        raise IOError(f"no frames in {video_path}")
    return np.clip(acc / n, 0, 255).astype(np.uint8)


def write_mean_videos(data_dir: str, out_dir: str, split: str = "train"):
    """Batch tool: <data>/<split>/*_gt.mp4 → <out>/<scene>.png."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    vids = sorted(x for x in os.listdir(os.path.join(data_dir, split))
                  if x.endswith("_gt.mp4"))
    for v in vids:
        scene = v[:-7]
        mean = compute_mean_video(os.path.join(data_dir, split, v))
        Image.fromarray(mean).save(os.path.join(out_dir, scene + ".png"))
