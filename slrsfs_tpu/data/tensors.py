"""Compressed tensor loading (the reference's ``*_motion.pth`` files).

Reference ``load_compressed_tensor`` (utils/utils.py:111-115) is
lz4framed-compressed pickle of a torch tensor. lz4framed is not available in
this environment; supported formats here, by sniffing:

* plain ``torch.save`` .pth (zip or legacy pickle),
* lz4-frame (magic 0x184D2204) via the ``lz4`` package if installed, else
  natively through the system ``liblz4`` (ctypes, ``data/lz4f.py``),
* numpy ``.npy`` / ``.npz`` (our native flow format).
"""

from __future__ import annotations

import io
import os
import pickle

import numpy as np

_LZ4_MAGIC = b"\x04\x22\x4d\x18"


def load_compressed_tensor(path: str) -> np.ndarray:
    """Load a motion tensor; returns numpy (keeps the source (1, 2, H, W)
    torch layout if that is what is stored — callers normalize layout)."""
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".npz"):
        z = np.load(path)
        return z[list(z.files)[0]]
    with open(path, "rb") as f:
        head = f.read(4)
    if head == _LZ4_MAGIC:
        with open(path, "rb") as f:
            blob = f.read()
        try:
            import lz4.frame

            raw = lz4.frame.decompress(blob)
        except ImportError:
            from . import lz4f  # ctypes binding to system liblz4

            if not lz4f.available():
                raise ImportError(
                    f"{path} is lz4-framed (the reference's format) but "
                    "neither the lz4 package nor liblz4.so is available; "
                    "re-encode with slrsfs_tpu.data.tensors.save_motion"
                )
            raw = lz4f.decompress(blob)
        t = pickle.loads(raw)
        return _to_numpy(t)
    # plain torch.save
    import torch

    return _to_numpy(torch.load(path, map_location="cpu", weights_only=False))


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def save_motion(path: str, flow_hw2: np.ndarray) -> None:
    """Native compressed flow format: (H, W, 2) float32 .npz."""
    assert flow_hw2.ndim == 3 and flow_hw2.shape[-1] == 2, flow_hw2.shape
    np.savez_compressed(path, flow=np.asarray(flow_hw2, np.float32))


def motion_to_hw2(flow) -> np.ndarray:
    """Normalize any stored layout ((1,{2,3},H,W), ({2,3},H,W), (H,W,{2,3}))
    → (H, W, 2). A 3-channel uv·m motion folds to uv*m (the reference's
    use_uvm handling, animating_softmax_splating.py:541-546)."""
    flow = _to_numpy(flow)
    if flow.ndim == 4:
        flow = flow[0]
    if flow.ndim == 3 and flow.shape[0] in (2, 3) and flow.shape[-1] not in (2, 3):
        flow = flow.transpose(1, 2, 0)
    if flow.shape[-1] == 3:
        flow = flow[..., :2] * flow[..., 2:3]
    assert flow.shape[-1] == 2, flow.shape
    return np.ascontiguousarray(flow, dtype=np.float32)
