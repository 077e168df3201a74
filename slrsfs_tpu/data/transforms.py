"""Host-side image/flow transforms (PIL-based for resize parity).

Equivalents of reference ``utils/utils.py:264-337`` (get_params /
get_transform): random 720² crop from 1280×720, bicubic resize to W², h-flip
(with flow x-negation), optional color jitter, normalize to [-1, 1].
PIL stays on the host deliberately — the eval protocol resizes with PIL and
``jax.image`` differs at edges (SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
from PIL import Image, ImageEnhance


def get_params(rng: np.random.RandomState, size: Tuple[int, int],
               crop_size: int, no_flip: bool = False,
               color_jitter: bool = False) -> Dict:
    w, h = size
    x = rng.randint(0, max(0, w - crop_size) + 1)
    y = rng.randint(0, max(0, h - crop_size) + 1)
    flip = (rng.rand() > 0.5) and not no_flip
    cj = (rng.rand() > 0.5) if color_jitter else False
    return {
        "crop_pos": (int(x), int(y)),
        "crop_size": int(crop_size),
        "flip": bool(flip),
        "colorjitter": bool(cj),
        "colorjitter_params": {
            "brightness": float(rng.rand() * 0.2 + 1.0),
            "contrast": float(rng.rand() * 0.2 + 1.0),
            "saturation": float(rng.rand() * 0.2 + 1.0),
            "hue": float(rng.rand() * 0.05),
        },
    }


def _color_jitter(img: Image.Image, p: Dict) -> Image.Image:
    img = ImageEnhance.Brightness(img).enhance(p["brightness"])
    img = ImageEnhance.Contrast(img).enhance(p["contrast"])
    img = ImageEnhance.Color(img).enhance(p["saturation"])
    if p["hue"]:
        hsv = np.array(img.convert("HSV"), np.int16)
        hsv[..., 0] = (hsv[..., 0] + int(p["hue"] * 255)) % 256
        img = Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")
    return img


def transform_image(img: Image.Image, out_w: int, params: Optional[Dict],
                    normalize: bool = True,
                    method=Image.BICUBIC) -> np.ndarray:
    """Train transform (crop→resize→flip→jitter→normalize) or, with
    params=None, the val/inference transform (bilinear resize only,
    reference eulerian_data.py:47-53). Returns (H, W, 3) float32 NHWC."""
    if params is None:
        img = img.convert("RGB").resize((out_w, out_w), Image.BILINEAR)
    else:
        img = img.convert("RGB")
        x, y = params["crop_pos"]
        cs = params["crop_size"]
        if img.size[0] > cs or img.size[1] > cs:
            img = img.crop((x, y, x + cs, y + cs))
        img = img.resize((out_w, out_w), method)
        if params["flip"]:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if params["colorjitter"]:
            img = _color_jitter(img, params["colorjitter_params"])
    arr = np.asarray(img, np.float32) / 255.0
    if normalize:
        arr = (arr - 0.5) / 0.5
    return arr


def _resize_flow_bilinear(flow: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False) equivalent
    (cv2.resize INTER_LINEAR matches the half-pixel convention)."""
    import cv2

    return cv2.resize(flow, (out_w, out_h), interpolation=cv2.INTER_LINEAR)


def _resize_flow_nearest(flow: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """torch F.interpolate default mode='nearest' equivalent — the INFERENCE
    drivers use this (test_baseline_4eval.py:181). torch nearest picks
    src = floor(dst * in/out); cv2 INTER_NEAREST differs at ties, so index
    directly."""
    h, w = flow.shape[:2]
    ys = np.floor(np.arange(out_h) * (h / out_h)).astype(int)
    xs = np.floor(np.arange(out_w) * (w / out_w)).astype(int)
    return flow[ys][:, xs]


def transform_flow(flow: np.ndarray, out_w: int, params: Optional[Dict],
                   mode: str = "bilinear",
                   speed: float = 1.0) -> np.ndarray:
    """Crop/flip/scale/resize a (H, W, 2) motion field (reference
    eulerian_data.py:80-97 train / test_baseline_4eval.py:173-184 inference).

    Flow values are scaled by out_w / source_size so displacements stay in
    output pixels; horizontal flip negates the x channel.
    """
    flow = np.asarray(flow, np.float32)
    if params is not None:
        x, y = params["crop_pos"]
        cs = params["crop_size"]
        flow = flow[y:y + cs, x:x + cs]
        scale = np.array([out_w / cs, out_w / cs], np.float32)
        if params["flip"]:
            flow = flow[:, ::-1].copy()
            flow[..., 0] *= -1
    else:
        scale = np.array([out_w / flow.shape[1], out_w / flow.shape[0]],
                         np.float32)
    flow = flow * scale * speed
    if mode == "bilinear":
        return _resize_flow_bilinear(flow, out_w, out_w)
    return _resize_flow_nearest(flow, out_w, out_w)
