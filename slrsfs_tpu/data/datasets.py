"""Eulerian-data training datasets (host side, numpy NHWC batches).

One unified implementation of the reference's six loader variants
(``data/eulerian_data*.py``; registry in ``options/options.py:36-120``):

* ``eulerian_data``                — 3 views + motion (eulerian_data.py)
* ``eulerian_data_balanced1_mask`` — + rock mask + mean video + shallow-scene
                                     oversampling (eulerian_data_balanced1_mask.py)
* ``eulerian_data_bg``             — 2 biased views + mean video (eulerian_data_bg.py)
* ``eulerian_data_hint``           — + precomputed *_sparse_motion.flo hints
                                     (eulerian_data_hint.py)
* ``eulerian_data_motion_hint``    — 1 view + motion + online hint synthesis
                                     (eulerian_data_motion_hint.py)
* ``eulerian_data_mask_hint``      — hints + rock mask (eulerian_data_mask_hint.py)

Scene layout on disk matches the reference dataset release:
``<root>/train/XXXXX_YYYYY_gt.mp4``, ``..._motion.pth`` (or our ``.npz``),
``<root>/avr_image/XXXXX_YYYYY.png``, ``<rock_root>/XXXXX_YYYYY.png.json``,
``..._sparse_motion.flo``. Sampling: triplet (start ∈ [0, N/3), end ∈
[2N/3, N), middle ∈ [start, end)), 720² random crop of the 1280×720 frames,
bicubic resize to W², h-flip with flow x-negation (eulerian_data.py:63-97).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional

import numpy as np
from PIL import Image

from slrsfs_tpu.config import Options
from slrsfs_tpu.data.masks import rasterize_rock_label, transform_mask
from slrsfs_tpu.data.tensors import load_compressed_tensor, motion_to_hw2
from slrsfs_tpu.data.transforms import get_params, transform_flow, transform_image
from slrsfs_tpu.data.video import VideoReader
from slrsfs_tpu.utils.flow_viz import read_flo


class LiquidDataset:
    """Unified eulerian-data loader. Returns per-sample dicts of NHWC numpy
    arrays; use ``batches`` for a collated iterator."""

    RAW_W, RAW_H = 1280, 720

    def __init__(self, root: str, opt: Options, variant: str = "eulerian_data",
                 split: str = "train", seed: int = 0,
                 rock_label_root: Optional[str] = None,
                 no_flip: bool = False):
        self.root = root
        self.opt = opt
        self.variant = variant
        self.split = split
        self.rock_label_root = rock_label_root or os.path.join(root, "rock_label")
        self.no_flip = no_flip
        self.isval = split != "train"
        self.seed = seed
        self.epoch = 0
        self._scan()
        self.with_mask = "mask" in variant
        self.with_mean = ("mask" in variant or "bg" in variant
                          or opt.use_mean_video or opt.MVloss > 0.0)
        self.with_hint = "hint" in variant
        self.online_hint = variant == "eulerian_data_motion_hint" and opt.use_online_hint
        self.single_view = "motion_hint" in variant
        self.two_view = variant == "eulerian_data_bg"
        # shallow-scene oversampling list (eulerian_data_balanced1_mask.py:75-85)
        self.shallow: Optional[np.ndarray] = None
        shallow_path = os.path.join(root, "imageset_shallow.npy")
        if "balanced" in variant and os.path.exists(shallow_path):
            self.shallow = np.load(shallow_path, allow_pickle=True)

    def _scan(self):
        d = os.path.join(self.root, self.split)
        self.scenes = sorted(x[:-7] for x in os.listdir(d) if x.endswith("_gt.mp4"))
        if not self.scenes:
            raise FileNotFoundError(f"no *_gt.mp4 scenes under {d}")

    def __len__(self) -> int:
        return max(2**15, len(self.scenes))  # eulerian_data.py:59-60

    def totrain(self, epoch: int):
        self.split = "train"
        self.isval = False
        self.epoch = epoch
        self._scan()

    def toval(self, epoch: int):
        self.split = "validation"
        self.isval = True
        self.epoch = epoch
        self._scan()

    # ------------------------------------------------------------------

    def _sample_rng(self, index: int) -> np.random.RandomState:
        """Sampling is a pure function of (seed, split, epoch, index) so
        iteration is reproducible and independent of prefetch-consumption
        timing (reference per-epoch reseeding contract,
        eulerian_data.py:136-163)."""
        mix = (self.seed * 0x9E3779B1
               + self.epoch * 0x85EBCA77
               + index * 0xC2B2AE3D
               + (0x27D4EB2F if self.isval else 0)) & 0x7FFFFFFF
        return np.random.RandomState(mix)

    def _pick_scene(self, rng: np.random.RandomState) -> str:
        if (self.shallow is not None and not self.isval
                and rng.randint(self.opt.balanced_weight) > 0):
            return str(self.shallow[rng.randint(len(self.shallow))])
        return self.scenes[rng.randint(len(self.scenes))]

    def _load_motion(self, scene: str) -> np.ndarray:
        base = os.path.join(self.root, self.split, scene + "_motion")
        for ext in (".npz", ".npy", ".pth"):
            if os.path.exists(base + ext):
                return motion_to_hw2(load_compressed_tensor(base + ext))
        raise FileNotFoundError(base + ".{npz,npy,pth}")

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        opt = self.opt
        W = opt.W
        rng = self._sample_rng(index)
        scene = self._pick_scene(rng)
        video = VideoReader(os.path.join(self.root, self.split, scene + "_gt.mp4"))
        # reference hardcodes 1280x720 with a 720^2 crop (eulerian_data.py:
        # 26-27,63); we probe the actual size so smaller fixtures work
        crop = min(720, video.height, video.width)
        params = None if self.isval else get_params(
            rng, (video.width, video.height), crop, no_flip=self.no_flip)
        N = len(video)
        start = rng.randint(0, max(N // 3, 1))
        end = rng.randint(N // 3 * 2, N)
        middle = rng.randint(start, end)
        if self.two_view:
            # biased 2-view sampling (eulerian_data_bg.py:81-82)
            pair = rng.randint(0, N, size=2)
            start, end = int(pair.min()), int(pair.max())
            middle = end

        motion = self._load_motion(scene)

        views = [start] if self.single_view else (
            [start, end] if self.two_view else [start, middle, end])
        images = [
            transform_image(Image.fromarray(video[t]), W, params)
            for t in views
        ]
        video.close()

        flow = transform_flow(motion, W, params, mode="bilinear")
        batch: Dict[str, np.ndarray] = {
            "images": images,
            "motions": flow,
            "index": np.asarray([start, middle, end], np.int32),
            "isval": np.asarray(self.isval),
        }

        if self.with_mean:
            mv = Image.open(os.path.join(self.root, "avr_image", scene + ".png"))
            batch["mean_video"] = transform_image(mv, W, params)
        if self.with_mask:
            raw = rasterize_rock_label(
                os.path.join(self.rock_label_root, scene + ".png.json"),
                motion.shape[:2])
            batch["mask_rock"] = transform_mask(raw, W, params)[..., None]
        if self.with_hint:
            if self.online_hint:
                from slrsfs_tpu.data.hints import synthesize_hint_online

                hint_raw, _ = synthesize_hint_online(
                    motion, np.random.default_rng(rng.randint(2**31)))
            else:
                hint_raw = read_flo(os.path.join(
                    self.root, self.split, scene + "_sparse_motion.flo"))
            batch["hints"] = transform_flow(hint_raw, W, params, mode="bilinear")
        if opt.random_ff_mask and not self.isval:
            # free-form occlusion keep-mask applied to the splatted features
            # (reference --random_ff_mask + rate, train_options.py:569-574,
            # animating_softmax_splating.py:680-692)
            from slrsfs_tpu.data.augment import ff_keep_mask

            batch["ff_mask"] = ff_keep_mask(
                np.random.default_rng(rng.randint(2**31)), W, W,
                rate=opt.random_ff_mask_rate).astype(np.float32)
        return batch

    # ------------------------------------------------------------------

    def batches(self, batch_size: int, num_batches: Optional[int] = None,
                prefetch: int = 2, workers: int = 2) -> Iterator[Dict]:
        """Collated batch iterator with parallel background prefetch.

        ``__getitem__`` is a pure function of (epoch, index), so samples
        decode concurrently on ``workers`` threads (cv2/PIL/np release the
        GIL for the heavy parts — the reference's multi-worker
        ``DataLoader`` equivalent) while batch ORDER stays deterministic:
        futures are consumed in submission order with at most
        ``prefetch + workers`` batches in flight."""
        from concurrent.futures import ThreadPoolExecutor

        def make(i):
            samples = [self[i * batch_size + j] for j in range(batch_size)]
            out: Dict = {}
            first = samples[0]
            for k in first:
                if k == "images":
                    out[k] = [
                        np.stack([s[k][v] for s in samples])
                        for v in range(len(first[k]))
                    ]
                else:
                    out[k] = np.stack([s[k] for s in samples])
            return out

        total = num_batches if num_batches is not None else (
            len(self) // batch_size)
        from collections import deque

        with ThreadPoolExecutor(max_workers=max(1, workers)) as ex:
            inflight: deque = deque()
            nxt = 0
            while nxt < total and len(inflight) < prefetch + workers:
                inflight.append(ex.submit(make, nxt))
                nxt += 1
            while inflight:
                batch = inflight.popleft().result()
                if nxt < total:
                    inflight.append(ex.submit(make, nxt))
                    nxt += 1
                yield batch


def get_dataset(opt: Options, root: str, split: str = "train",
                **kw) -> LiquidDataset:
    """Registry equivalent of reference ``options/options.py:36-120``."""
    known = (
        "eulerian_data",
        "eulerian_data_balanced1_mask",
        "eulerian_data_bg",
        "eulerian_data_hint",
        "eulerian_data_motion_hint",
        "eulerian_data_mask_hint",
    )
    if opt.dataset not in known:
        raise ValueError(f"unknown dataset {opt.dataset}; known: {known}")
    return LiquidDataset(root, opt, variant=opt.dataset, split=split, **kw)
