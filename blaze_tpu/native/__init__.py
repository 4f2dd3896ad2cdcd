from .codec import (
    have_native,
    bytes_to_limbs,
    limbs_to_bytes,
    bank_split,
    bank_merge,
    transpose,
)

__all__ = [
    "have_native",
    "bytes_to_limbs",
    "limbs_to_bytes",
    "bank_split",
    "bank_merge",
    "transpose",
]
