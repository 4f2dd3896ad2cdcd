"""Device-resident MSM operand layouts for the fused TPU path.

The reference keeps bases resident in card HBM and reuses them across MSM
calls with scalars-only set_data (`/root/reference/src/ingo_msm/
msm_api.rs:144-153,299-322`).  The TPU analog is a *layout*, not an
address: points live on device as lanes-major xy-packed u32 —

    resident[r, n] = X_limb_r(P_n) | (Y_limb_r(P_n) << 16)      (L, N) u32

limbs on sublanes, points on the 128-lane minor axis.  Points-major
(N, 2, L) arrays are lane-padded L -> 128 by XLA (5.3x HBM expansion for
L=24 — what capped single-chip MSM below 2^24); the packed transpose tiles
with zero padding and halves gather traffic again (one u32 row instead of
two u16 rows per limb).  Scalars ride the same transpose as (Ls, N) u16.

Montgomery conversion runs in 2^20-point slices so no lane-padded
full-size temporary ever exists.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.ops import Curve
from ..fields.spec import LIMB_BITS, LIMB_MASK

_SLICE = 1 << 20
_JIT_CACHE: dict = {}


def _conv_fn(curve: Curve, mont: bool):
    key = ("to_res", curve.spec.name, mont)
    fn = _JIT_CACHE.get(key)
    if fn is None:

        @jax.jit
        def conv(blk):                     # (m, 2, L) u32
            m = blk if mont else curve.fq.to_mont(blk)
            a = jnp.moveaxis(m, 0, -1)     # (2, L, m)
            return a[0] | (a[1] << LIMB_BITS)

        fn = _JIT_CACHE[key] = conv
    return fn


def points_to_resident(curve: Curve, points, mont: bool = False):
    """(N, 2, L) u32 affine (canonical, or Montgomery when mont=True)
    -> (L, N) u32 xy-packed Montgomery residency."""
    conv = _conv_fn(curve, mont)
    n = points.shape[0]
    parts = [
        conv(jnp.asarray(points[lo : lo + _SLICE]))
        for lo in range(0, n, _SLICE)
    ]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def points_from_resident(curve: Curve, resident):
    """(L, N) u32 xy-packed residency -> (N, 2, L) u32 Montgomery affine."""
    x = resident & jnp.uint32(LIMB_MASK)
    y = resident >> LIMB_BITS
    return jnp.moveaxis(jnp.stack([x, y], axis=0), -1, 0)


def scalars_to_resident(scalars) -> np.ndarray:
    """(N, Ls) u32 canonical limbs -> (Ls, N) u16 lanes-major (host-side;
    limbs are < 2^16 by representation)."""
    return np.ascontiguousarray(np.asarray(scalars).T).astype(np.uint16)
