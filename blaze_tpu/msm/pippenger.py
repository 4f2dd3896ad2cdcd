"""Pippenger multi-scalar multiplication, TPU-native.

Replaces the reference's FPGA MSM engine (`/root/reference/src/ingo_msm/`,
register lifecycle in msm_api.rs:72-274) with an actual bucket-method
implementation designed for XLA:

  1. c-bit digit decomposition of 16-bit scalar limbs (c=16 gives digits ==
     limbs; the reference's 8x precompute over 32-bit windows,
     msm_api.rs:39-40, is the same windowing idea);
  2. per window: sort point indices by digit (XLA sort — TPUs hate scatter,
     so bucket accumulation becomes contiguous-run reduction);
  3. an EC *prefix scan* over the sorted points, computed as a two-level
     sequential lane scan (lax.scan over N/R steps of R-wide batched
     complete additions) — work-efficient (~N adds) with a graph containing
     only O(1) group-op instances, unlike tree/associative scans;
  4. bucket sums are never materialized: by Abel summation,
         sum_j j * B_j  =  (B-1) * T[e_{B-1}]  -  sum_{j<B-1} T[e_j]
     where T is the prefix sum and e_j the last sorted index with digit <= j
     (empty buckets fall out automatically);
  5. Horner window fold with c doublings per window.

Everything is fixed-shape, branchless, and batched — the only sequential
latency is the lane-scan step counts (~sqrt chunk size).
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.ops import Curve
from ..curves.spec import CurveSpec
from ..fields.spec import LIMB_BITS


def _ceil_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


@dataclasses.dataclass(frozen=True)
class MSMConfig:
    """Static planning knobs (hashable; safe as a jit static argument)."""

    window_bits: int = 16          # c; buckets per window B = 2^c
    chunk_log2: int = 20           # points per device pass (memory bound)
    scan_lanes: int = 0            # 0 = auto (~sqrt of padded chunk)

    def windows(self, scalar_bits: int) -> int:
        return -(-scalar_bits // self.window_bits)


def default_window_bits(n: int) -> int:
    """Pick c so bucket work (~3*2^c) stays well below scan work (~n)."""
    if n <= 0:
        return 1
    c = max(1, min(16, int(math.log2(max(n, 2))) - 3))
    return c


class MSM:
    """Pippenger MSM engine for one curve."""

    def __init__(self, curve: Curve, config: MSMConfig | None = None):
        self.curve = curve
        self.config = config or MSMConfig()

    # ------------------------------------------------------------ digits
    def _digits(self, scalars, c: int, nwin: int):
        """(N, Ls) 16-bit limbs -> (nwin, N) c-bit digits (uint32)."""
        Ls = scalars.shape[-1]
        padded = jnp.pad(scalars, [(0, 0)] * (scalars.ndim - 1) + [(0, 2)])
        outs = []
        mask = jnp.uint32((1 << c) - 1)
        for w in range(nwin):
            lo_bit = w * c
            limb, off = divmod(lo_bit, LIMB_BITS)
            d = padded[..., limb] >> off
            if off + c > LIMB_BITS:
                d = d | (padded[..., limb + 1] << (LIMB_BITS - off))
            if off + c > 2 * LIMB_BITS:  # c > 16 never spans 3 limbs (c<=16)
                raise ValueError("window_bits must be <= 16")
            outs.append(d & mask)
        return jnp.stack(outs, axis=0)

    # ------------------------------------------------- sequential EC scan
    def _proj_scan(self, pts):
        """Inclusive EC prefix sum over axis 0 of (M, 3, L) points.

        Two-level lane decomposition; recursion keeps the graph at O(1)
        group-op instances per level (~3 levels total for M <= 2^24).
        """
        cv = self.curve
        M = pts.shape[0]
        if M == 1:
            return pts
        if M <= 128:
            def body(carry, p):
                nxt = cv.add(carry, p)
                return nxt, nxt

            _, out = jax.lax.scan(body, cv.identity(), pts)
            return out

        R = _ceil_pow2(int(math.sqrt(M)))
        C = -(-M // R)
        pad = R * C - M
        if pad:
            padp = jnp.broadcast_to(cv.identity(), (pad, 3, pts.shape[-1]))
            pts = jnp.concatenate([pts, padp], axis=0)
        grid = pts.reshape(R, C, 3, -1).transpose(1, 0, 2, 3)  # (C, R, 3, L)

        def body(carry, row):
            nxt = cv.add(carry, row)
            return nxt, nxt

        lane_tot, emitted = jax.lax.scan(
            body, jnp.broadcast_to(cv.identity(), (R, 3, grid.shape[-1])), grid
        )
        carries = self._proj_scan(lane_tot)  # inclusive over lanes
        excl = jnp.concatenate(
            [jnp.broadcast_to(cv.identity(), (1, 3, grid.shape[-1])), carries[:-1]],
            axis=0,
        )
        fixed = cv.add(emitted, excl[None, :, :, :])  # (C, R, 3, L)
        out = fixed.transpose(1, 0, 2, 3).reshape(R * C, 3, -1)
        return out[:M]

    def _lane_scan_with_boundaries(self, pts_affine, bounds):
        """Prefix-scan values T[e] for boundary indices only.

        pts_affine: (Npad, 2, L) sorted affine points (mixed adds in the
        scan body).  bounds: (B,) int32 indices into the sorted order; -1
        means "no element" -> identity.  Returns (B, 3, L) projective T[e].
        Avoids the full O(N) carry fix-up: only boundary positions get the
        lane-carry correction.
        """
        cv = self.curve
        N = pts_affine.shape[0]
        L = pts_affine.shape[-1]
        # Lane count: wider than sqrt(N) so every scan step is a large
        # batched add (full VPU tiles through the fused mul kernel); the
        # O(R) lane-carry fix-up stays a small fraction of the O(N) scan.
        R = self.config.scan_lanes or _ceil_pow2(4 * int(math.sqrt(N)))
        R = min(R, N)
        C = -(-N // R)
        pad = R * C - N
        if pad:
            # affine padding: repeat last point; digits of pads sort past
            # every real bucket so no boundary index ever reaches them
            padp = jnp.broadcast_to(pts_affine[-1:], (pad, 2, L))
            pts_affine = jnp.concatenate([pts_affine, padp], axis=0)
        grid = pts_affine.reshape(R, C, 2, L).transpose(1, 0, 2, 3)  # (C,R,2,L)

        def body(carry, row):
            nxt = cv.add_mixed(carry, row)
            return nxt, nxt

        lane_tot, emitted = jax.lax.scan(
            body, jnp.broadcast_to(cv.identity(), (R, 3, L)), grid
        )
        # emitted[(t, r)] = local prefix within lane r up to column t
        lane_prefix = self._proj_scan(lane_tot)  # (R, 3, L) inclusive
        excl = jnp.concatenate(
            [jnp.broadcast_to(cv.identity(), (1, 3, L)), lane_prefix[:-1]], axis=0
        )

        safe = jnp.maximum(bounds, 0)
        lane_idx = safe // C
        col_idx = safe % C
        local = emitted[col_idx, lane_idx]        # (B, 3, L)
        carry = excl[lane_idx]                    # (B, 3, L)
        t = cv.add(carry, local)
        ident = jnp.broadcast_to(cv.identity(), t.shape)
        return cv.select(bounds >= 0, t, ident)

    # --------------------------------------------------------- one window
    def _window_sum(self, pts_affine, digits, c: int):
        """sum_j j * B_j for one window. pts (N,2,L) affine, digits (N,)."""
        cv = self.curve
        B = 1 << c
        order = jnp.argsort(digits)
        sorted_d = jnp.take(digits, order)
        sorted_p = jnp.take(pts_affine, order, axis=0)

        # e_j = last index with digit <= j  (=-1 if none)
        bounds = (
            jnp.searchsorted(sorted_d, jnp.arange(1, B + 1, dtype=digits.dtype))
            .astype(jnp.int32)
            - 1
        )
        t = self._lane_scan_with_boundaries(sorted_p, bounds)  # (B, 3, L)

        # sum_j j*B_j = (B-1) * T[e_{B-1}] - sum_{j=0}^{B-2} T[e_j]
        total = t[B - 1]
        partials = self._proj_scan(t[: B - 1])[-1] if B > 1 else None
        acc = self._small_scalar_mul(total, B - 1, c)
        if partials is not None:
            acc = cv.add(acc, cv.neg(partials))
        return acc

    def _small_scalar_mul(self, point, k: int, nbits: int):
        """point * k for k < 2^nbits via fori_loop double-and-add."""
        cv = self.curve
        kbits = jnp.asarray(
            [(k >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.uint32
        )

        def body(i, acc):
            acc = cv.dbl(acc)
            added = cv.add(acc, point)
            return cv.select(jnp.asarray(kbits[i] == 1), added, acc)

        return jax.lax.fori_loop(0, nbits, body, cv.identity())

    # ------------------------------------------------------------- driver
    def msm_chunk(self, points_aff_mont, scalars, c: int,
                  scalar_bits: int | None = None):
        """MSM over one resident chunk. Returns per-window sums (W, 3, L).

        `scalar_bits` < fr.bits is the precomputed-multiples mode: slices
        from msm/precompute.py carry only that many live bits, so fewer
        windows are scanned (msm_api.rs:39-40 parity)."""
        nwin = -(-(scalar_bits or self.curve.spec.fr.bits) // c)
        digits = self._digits(scalars, c, nwin)  # (W, N)

        def per_window(_, d):
            return None, self._window_sum(points_aff_mont, d, c)

        _, wsums = jax.lax.scan(per_window, None, digits)
        return wsums

    def fold_windows(self, wsums, c: int):
        """Horner fold: result = sum_w 2^(c*w) * wsums[w]."""
        cv = self.curve
        W = wsums.shape[0]

        def outer(w, acc):
            def dblc(_, a):
                return cv.dbl(a)

            acc = jax.lax.fori_loop(0, c, dblc, acc)
            return cv.add(acc, wsums[W - 2 - w])

        return jax.lax.fori_loop(0, W - 1, outer, wsums[W - 1])

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def _msm_jit(self, points, scalars, c: int, scalar_bits=None):
        wsums = self.msm_chunk(points, scalars, c, scalar_bits)
        return self.fold_windows(wsums, c)

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def _msm_chunk_jit(self, points, scalars, c: int, scalar_bits=None):
        return self.msm_chunk(points, scalars, c, scalar_bits)

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def _fold_jit(self, wsums, c: int):
        return self.fold_windows(wsums, c)

    @functools.partial(jax.jit, static_argnums=0)
    def _add_wsums(self, a, b):
        return self.curve.add(a, b)

    def __call__(self, points_aff_mont, scalars, window_bits: int | None = None,
                 scalar_bits: int | None = None):
        """MSM of (N, 2, L) Montgomery affine points with (N, Ls) canonical
        scalar limbs. Returns one projective point (3, L), Montgomery form.

        Large inputs are processed in chunks of 2^chunk_log2 points with
        per-window partial sums combined before the final fold (mirrors the
        reference's 2048-element streaming chunks, msm_api.rs:156 — here the
        chunk is whatever fits HBM comfortably).  `scalar_bits` is for
        precompute-expanded inputs (see `msm_precomputed`).
        """
        n = points_aff_mont.shape[0]
        c = window_bits or min(self.config.window_bits, default_window_bits(n))
        chunk = 1 << self.config.chunk_log2
        if n <= chunk:
            return self._msm_jit(points_aff_mont, scalars, c, scalar_bits)

        wsums = None
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            part = self._msm_chunk_jit(
                points_aff_mont[lo:hi], scalars[lo:hi], c, scalar_bits
            )
            wsums = part if wsums is None else self._add_wsums(wsums, part)
        return self._fold_jit(wsums, c)

    def msm_precomputed(self, expanded_points, scalars, factor: int,
                        window_bits: int | None = None):
        """MSM with precomputed multiples (the reference's 8x mode).

        `expanded_points`: (factor*N, 2, L) from msm.precompute_points
        (multiple-major); `scalars`: (N, Ls) canonical limbs.  Scans only
        ceil(fr.bits/factor) bits' worth of windows."""
        from .precompute import split_scalars

        sliced, bits = split_scalars(
            scalars, factor, self.curve.spec.fr.bits
        )
        return self(expanded_points, sliced, window_bits=window_bits,
                    scalar_bits=bits)
