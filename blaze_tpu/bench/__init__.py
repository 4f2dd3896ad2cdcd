from .profile import (
    KernelStats,
    SOL_TABLE,
    bench_kernel,
    field_mul_traffic_bytes,
    scaling_efficiency,
    speed_of_light,
)

__all__ = [
    "KernelStats",
    "SOL_TABLE",
    "bench_kernel",
    "field_mul_traffic_bytes",
    "scaling_efficiency",
    "speed_of_light",
]
