from slrsfs_tpu.losses.synthesis import SynthesisLoss, MotionLoss, psnr, l1
from slrsfs_tpu.losses.ssim import ssim

__all__ = ["SynthesisLoss", "MotionLoss", "psnr", "l1", "ssim"]
