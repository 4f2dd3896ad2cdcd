from .ec import ECOracle
from .gen import tiled_msm_instance, random_msm_instance

__all__ = [
    "ECOracle",
    "tiled_msm_instance",
    "random_msm_instance",
]
