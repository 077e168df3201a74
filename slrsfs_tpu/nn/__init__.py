from slrsfs_tpu.nn import archs, blocks, conv, norm, resnets

__all__ = ["archs", "blocks", "conv", "norm", "resnets"]
