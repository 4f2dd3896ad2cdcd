from .pippenger import MSM, MSMConfig, default_window_bits
from .precompute import precompute_points, shift_bits_for, split_scalars
from .residency import (
    points_from_resident,
    points_to_resident,
    scalars_to_resident,
)

__all__ = [
    "MSM",
    "MSMConfig",
    "default_window_bits",
    "precompute_points",
    "shift_bits_for",
    "split_scalars",
    "points_from_resident",
    "points_to_resident",
    "scalars_to_resident",
]
