"""Point wire formats matching the reference's DMA byte contracts.

* affine input points:  x || y, little-endian coords
  (`/root/reference/tests/msm/mod.rs:118-124` builds exactly this layout);
* projective results:   z || y || x, little-endian coords
  (`/root/reference/tests/msm/mod.rs:397-399` parses [0..48]=z, [48..96]=y,
  [96..144]=x for BLS12-381; same order for the other curves).

Coordinates on the wire are canonical (non-Montgomery) integers.
"""
from __future__ import annotations

import numpy as np

from ..fields.codec import bytes_to_limbs, limbs_to_bytes
from .spec import CurveSpec


def decode_affine_points(data: bytes | np.ndarray, spec: CurveSpec) -> np.ndarray:
    """x||y LE bytes -> uint32[N, 2, L] canonical limbs."""
    limbs = bytes_to_limbs(data, spec.fq)
    if limbs.shape[0] % 2:
        raise ValueError("odd number of coordinates")
    return limbs.reshape(-1, 2, spec.fq.nlimbs)


def encode_affine_points(points: np.ndarray, spec: CurveSpec) -> bytes:
    """uint32[N, 2, L] canonical limbs -> x||y LE bytes."""
    return limbs_to_bytes(np.asarray(points), spec.fq)


def decode_scalars(data: bytes | np.ndarray, spec: CurveSpec) -> np.ndarray:
    return bytes_to_limbs(data, spec.fr)


def encode_scalars(scalars: np.ndarray, spec: CurveSpec) -> bytes:
    return limbs_to_bytes(np.asarray(scalars), spec.fr)


def encode_projective_result(point: np.ndarray, spec: CurveSpec) -> bytes:
    """uint32[3, L] canonical (X, Y, Z) -> z||y||x LE bytes."""
    pt = np.asarray(point).reshape(3, spec.fq.nlimbs)
    return limbs_to_bytes(np.stack([pt[2], pt[1], pt[0]]), spec.fq)


def decode_projective_result(data: bytes, spec: CurveSpec) -> np.ndarray:
    """z||y||x LE bytes -> uint32[3, L] canonical (X, Y, Z)."""
    limbs = bytes_to_limbs(data, spec.fq).reshape(3, spec.fq.nlimbs)
    return np.stack([limbs[2], limbs[1], limbs[0]])
