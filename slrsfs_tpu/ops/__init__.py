from slrsfs_tpu.ops.splat import (
    softsplat,
    softsplat_sum,
    softsplat_sum_at,
    max_splat,
    inverse_max_gather,
    maximum_warp_norm_splat,
)
from slrsfs_tpu.ops.euler import (
    euler_integrate,
    euler_integrate_all,
    euler_integrate_compact,
    euler_integrate_compact_dual,
    euler_integrate_all_dual,
    euler_integrate_phased,
    euler_integrate_phased_compact,
)

__all__ = [
    "softsplat",
    "softsplat_sum",
    "softsplat_sum_at",
    "max_splat",
    "inverse_max_gather",
    "maximum_warp_norm_splat",
    "euler_integrate",
    "euler_integrate_all",
    "euler_integrate_compact",
    "euler_integrate_compact_dual",
    "euler_integrate_all_dual",
    "euler_integrate_phased",
    "euler_integrate_phased_compact",
]
