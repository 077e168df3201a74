"""Sparse-motion hint synthesis (host-side numpy/sklearn).

Reference algorithm (``data/eulerian_data_motion_hint.py:120-160`` online,
``:218-292`` offline; re-implemented at inference in
``test_animating/test_motion_4eval_rawsize_threshold.py:163-219``):

1. moving mask = motion speed > 0.2161635;
2. KMeans over the (x, y) coordinates of moving pixels → k centroid pixels
   (k=5 offline/inference; k ∈ [1, 5] random online);
3. Gaussian-RBF densification: each centroid's motion value is spread with
   weight exp(-(d/σ)²), normalized by the weight sum, then masked to the
   moving region (σ = H/5 offline/inference; random online).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

SPEED_THRESHOLD = 0.2161635  # reference :128 / test_motion driver :174


def moving_mask_threshold(motion: np.ndarray) -> np.ndarray:
    """motion (H, W, 2) -> float mask (H, W)."""
    speed = np.sqrt(motion[..., 0] ** 2 + motion[..., 1] ** 2)
    return (speed > SPEED_THRESHOLD).astype(np.float32)


def kmeans_hint_pixels(mask: np.ndarray, n_hints: int,
                       seed: Optional[int] = 0) -> np.ndarray:
    """Cluster moving-pixel coordinates; returns (n, 2) int (x, y) centroid
    pixels (cluster means cast to int, reference :139-144)."""
    from sklearn.cluster import KMeans

    ys, xs = np.nonzero(mask)
    pts = np.stack([xs, ys], axis=1).astype(np.float64)
    est = KMeans(n_clusters=n_hints, n_init=10, random_state=seed)
    labels = est.fit_predict(pts)
    out = np.zeros((n_hints, 2), np.int64)
    for i in range(n_hints):
        sel = pts[labels == i].mean(0)
        out[i, 0] = int(sel[0])
        out[i, 1] = int(sel[1])
    return out


def densify_hints(motion: np.ndarray, hint_xy: np.ndarray,
                  sigma: float, mask: np.ndarray) -> np.ndarray:
    """Gaussian-RBF densification (reference :146-160). motion (H, W, 2),
    hint_xy (n, 2) int (x, y); returns (H, W, 2)."""
    H, W, _ = motion.shape
    gx, gy = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    num = np.zeros((H, W, 2))
    den = np.zeros((H, W, 1))
    for x, y in hint_xy:
        dist = np.sqrt((gx - x) ** 2 + (gy - y) ** 2)
        w = np.exp(-((dist / sigma) ** 2))[..., None]
        num += w * motion[int(y), int(x)]
        den += w
    den[den == 0.0] = 1.0
    dense = num / den
    return (dense * mask[..., None]).astype(np.float32)


def synthesize_hint(motion: np.ndarray, n_hints: int = 5,
                    sigma: Optional[float] = None, seed: int = 0,
                    min_moving: int = 5) -> Tuple[np.ndarray, np.ndarray]:
    """Full pipeline: (motion (H, W, 2)) → (hint field (H, W, 2),
    moving mask (H, W)). Matches the offline/inference configuration
    (k=5, sigma=H/5) by default."""
    H = motion.shape[0]
    mask = moving_mask_threshold(motion)
    if mask.sum() < min_moving:
        return np.zeros_like(motion), mask
    if sigma is None:
        sigma = H / 5.0
    hints = kmeans_hint_pixels(mask, n_hints, seed)
    return densify_hints(motion, hints, sigma, mask), mask


def synthesize_hint_online(motion: np.ndarray, rng: np.random.Generator
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Training-time randomized variant (reference :132-160): k ∈ [1, 5],
    sigma ∈ [H/(2k), H·2/k]; < 10 moving pixels → zero hint."""
    H = motion.shape[0]
    mask = moving_mask_threshold(motion)
    if mask.sum() < 10:
        return np.zeros_like(motion), mask
    k = int(1 + rng.integers(5))
    sigma = float(rng.integers(H // (k * 2), max(H // (k * 2) + 1, int(H / (k / 2.0)))))
    hints = kmeans_hint_pixels(mask, k, int(rng.integers(2**31)))
    return densify_hints(motion, hints, sigma, mask), mask
