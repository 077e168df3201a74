"""Model registry (reference ``options/options.py:1-34`` get_model)."""

from __future__ import annotations

from slrsfs_tpu.config import Options


def get_model(opt: Options):
    from slrsfs_tpu.models.baseline import BaselineModel

    if opt.model_type == "softmax_splating":
        return BaselineModel(opt)
    if opt.model_type == "softmax_splating_2layers_alpha_seperate":
        from slrsfs_tpu.models.slr import SLRModel

        return SLRModel(opt)
    if opt.model_type in ("SPADE_unet_mask_motion", "unet_motion"):
        from slrsfs_tpu.models.motion import MotionRegressor

        return MotionRegressor(opt)
    if opt.model_type == "bg":
        from slrsfs_tpu.models.slr import BackgroundModel

        return BackgroundModel(opt)
    raise ValueError(f"unknown model_type: {opt.model_type}")
