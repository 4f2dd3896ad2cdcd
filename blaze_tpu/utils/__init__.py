from .errors import (
    BlazeError,
    DataError,
    DeviceError,
    InvalidPrimitiveParam,
    LoadFailed,
    NotReady,
)
from .misc import elide_payload, retry

__all__ = [
    "BlazeError",
    "DataError",
    "DeviceError",
    "InvalidPrimitiveParam",
    "LoadFailed",
    "NotReady",
    "elide_payload",
    "retry",
]
