"""Byte codecs: little-endian element bytes <-> 16-bit limb arrays.

Wire formats follow the reference contracts: every element is a fixed-width
little-endian byte string — 32 B scalars for all curves, 48 B base-field
coordinates for BLS12-377/381, 32 B for BN254
(`/root/reference/src/ingo_msm/msm_cfg.rs:44-92`), and 32 B little-endian
NTT elements (`/root/reference/src/ingo_ntt/ntt_data.rs:66`).

Since limbs are 16-bit little-endian, the byte format is exactly the
little-endian uint16 memory image of the limb array — codecs are pure
numpy view/byteswap-free reshapes, and a C++ fast path (csrc/codec.cpp)
is used when available for large buffers.
"""
from __future__ import annotations

import numpy as np

from ..native import codec as _native
from .spec import FieldSpec

# Below this, numpy's vectorized astype wins over the ctypes call overhead.
_NATIVE_MIN_BYTES = 1 << 22


def bytes_to_limbs(data: bytes | np.ndarray, spec: FieldSpec) -> np.ndarray:
    """LE bytes (N * nbytes) -> uint32[N, nlimbs] (canonical domain)."""
    buf = np.frombuffer(data, dtype=np.uint8) if isinstance(
        data, (bytes, bytearray, memoryview)
    ) else np.asarray(data, dtype=np.uint8)
    if buf.size % spec.nbytes:
        from ..utils.errors import DataError

        raise DataError(
            f"buffer size {buf.size} not a multiple of element size "
            f"{spec.nbytes} ({spec.name})"
        )
    if buf.size >= _NATIVE_MIN_BYTES and _native.have_native():
        return _native.bytes_to_limbs(np.ascontiguousarray(buf), spec.nbytes)
    u16 = buf.view("<u2").reshape(-1, spec.nlimbs)
    return u16.astype(np.uint32)


def limbs_to_bytes(limbs: np.ndarray, spec: FieldSpec) -> bytes:
    """uint32[..., nlimbs] (canonical domain) -> LE bytes."""
    arr = np.asarray(limbs, dtype=np.uint32).reshape(-1, spec.nlimbs)
    if arr.nbytes >= 2 * _NATIVE_MIN_BYTES and _native.have_native():
        return _native.limbs_to_bytes(np.ascontiguousarray(arr), spec.nbytes)
    return arr.astype("<u2").tobytes()
