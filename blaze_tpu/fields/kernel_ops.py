"""In-kernel (Pallas) field arithmetic shared by the fused TPU kernels.

Everything here operates on VALUES already resident in VMEM inside a
pallas_call body, in "lanes-major" layout: a batch of field elements is a
(..., L, T) uint32 array — 16-bit limbs on the sublane (-2) axis, batch on
the 128-lane minor axis, optional leading dims as further batching (they
stay outer dims in Mosaic, so no op here ever retiles the minor layout).
Montgomery products run the VPU limb convolution + MXU byte-matrix REDC
scheme of fields/mxu.py; carry/borrow propagation is Kogge-Stone parallel
prefix (serial ripple would be L dependent (1, T) row ops — 1/8 sublane
utilization and latency-bound).

Two reduction disciplines, chosen per instance:

  * lazy=True  — every value is < 2p.  Requires R > 4p (true for the
    base fields, L = 24): Montgomery mul of x, y < 2p gives
    (xy + mp)/R < 4p^2/R + p < 2p, so muls skip their conditional
    subtraction; adds/subs reduce against 2p.  Used by the EC kernels
    (curves/kernels.py), which canonicalize only at kernel exit.
  * lazy=False — canonical < p invariant.  Works for any R > p (the
    255-bit scalar fields have R = 2^256 < 4p, so lazy is unsound
    there): each mul pays one conditional subtraction, adds reduce
    against p.  Used by the NTT/Poseidon kernels over Fr.

This is the TPU-native replacement for the reference's opaque FPGA field
cores (`/root/reference/src/ingo_msm/msm_hw_code.rs` exposes only their
perf counters).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .mxu import MXUMont
from .spec import LIMB_BITS, LIMB_MASK, FieldSpec, int_to_limbs

# Lane budget per fused-multiply slab: bounds the int8/i32 REDC temporaries
# of one wave to ~15 MB of VMEM regardless of how large a batch callers
# pass (leading dims are processed in chunks of this many total lanes).
# Sized so a full 6-mul wave at the 2048-lane kernel tile (12288 lanes)
# rides ONE matmul round — the MXU<->VPU transition amortization that
# took the standalone mul 419 -> 1116 M muls/s (T = 256 -> 1024).
MAX_WAVE_LANES = 1 << 14


class PallasFieldOps:
    """Per-FieldSpec in-kernel primitives. Subclass or embed in kernels."""

    # Number of constant operands every kernel built on this class passes
    # through to the field layer (see field_const_arrays).
    N_FIELD_CONSTS = 4

    def __init__(self, spec: FieldSpec, lazy: bool):
        self.fspec = spec
        self.lazy = lazy
        eng = MXUMont.for_spec(spec)
        self.L = eng.L
        self.W = eng.W
        # REDC int8 packs (centered byte matrices + ones-row colsum and
        # int32 correction columns, fields/mxu.py:_i8_pack): the two REDC
        # matmuls are ~2/3 of the fused Montgomery mul on v5e and the
        # int8 MXU path runs them at 2x the bf16 rate with EXACT int32
        # accumulation (no f32 exactness budget, no f32->i32 casts).
        # Output rows stay deinterleaved lo-block/hi-block so 16-bit
        # reconstruction is contiguous slices.
        self._mnp_i8 = eng._mnp_i8_host        # (2L+1, 3L-1) int8
        self._mnp_corr = eng._mnp_corr_host    # (2L, 1) int32
        self._mp_i8 = eng._mp_i8_host          # (4L+1, 2L) int8
        self._mp_corr = eng._mp_corr_host      # (4L, 1) int32
        self._p_ints = eng._p_ints
        self._one_ints = [int(v) for v in np.asarray(spec.one_mont_limbs)]
        if lazy:
            assert spec.r > 4 * spec.p, "lazy REDC bound needs R > 4p"
            self._p2_ints = [int(v) for v in int_to_limbs(2 * spec.p, self.L)]
        else:
            assert spec.r > spec.p
            self._p2_ints = None

    # ------------------------------------------------- constant plumbing
    #
    # Pallas kernels receive the REDC constants as operands (constants
    # materialized inside a traced body would leak tracers / re-lower per
    # call).  Kernels built on this class splice `field_const_specs()`
    # into their in_specs, pass `field_const_inputs()` first, and hand the
    # first N_FIELD_CONSTS refs back via `read_consts` as the `fc` tuple
    # every field op takes.
    def field_const_arrays(self):
        """Host numpy constants, fixed order (int8 packs + corrections)."""
        return [self._mnp_i8, self._mnp_corr, self._mp_i8, self._mp_corr]

    def field_const_inputs(self):
        """Per-trace device constants matching field_const_arrays."""
        return [jnp.asarray(a) for a in self.field_const_arrays()]

    @staticmethod
    def const_specs(arrays):
        """Full-array VMEM BlockSpecs for constant operands."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        return [
            pl.BlockSpec(
                a.shape,
                (lambda nd: (lambda *ix: (0,) * nd))(a.ndim),
                memory_space=pltpu.VMEM,
            )
            for a in arrays
        ]

    def field_const_specs(self):
        return self.const_specs(self.field_const_arrays())

    @staticmethod
    def read_consts(refs):
        """Kernel-side: first N_FIELD_CONSTS refs -> the fc tuple."""
        return tuple(r[:] for r in refs[: PallasFieldOps.N_FIELD_CONSTS])

    # ------------------------------------------------------------ helpers
    @staticmethod
    def _shift_down(x, d=1):
        """Along the limb (-2) axis: rows j >= d get x[j-d]; top d zero."""
        pad = [(0, 0)] * (x.ndim - 2) + [(d, 0), (0, 0)]
        return jnp.pad(x, pad)[..., : x.shape[-2], :]

    def _const_col(self, ints, T):
        """(len, T) column whose rows are the given per-limb scalars."""
        return jnp.concatenate(
            [jnp.full((1, T), jnp.uint32(v)) for v in ints], axis=0
        )

    def _one_col(self, T):
        return self._const_col(self._one_ints, T)

    # --------------------------------------------------- carries / borrows
    def _ks_carry(self, cols, carry_in=None):
        """Exact carry normalization of (..., K, T) u32 16-bit-stride
        columns.  Any u32 input values.  Returns (limbs < 2^16, carry_out
        (..., 1, T)).  Two value folds bound rows to <= 2^16, then a
        Kogge-Stone generate/propagate prefix resolves the remaining 0/1
        ripple."""
        K = cols.shape[-2]
        v = cols
        if carry_in is not None:
            pad = [(0, 0)] * (carry_in.ndim - 2) + [(0, K - 1), (0, 0)]
            v = v + jnp.pad(carry_in, pad)
        over = jnp.zeros_like(v[..., :1, :])

        for _ in range(2):  # after two folds every row is <= 2^16
            hi = v >> LIMB_BITS
            over = over + hi[..., K - 1 : K, :]
            v = (v & LIMB_MASK) + self._shift_down(hi)

        g = v >> LIMB_BITS                      # 0/1 generate
        p = jnp.where((v & LIMB_MASK) == LIMB_MASK, jnp.uint32(1),
                      jnp.uint32(0))            # propagate
        d = 1
        while d < K:
            g = g | (p & self._shift_down(g, d))
            p = p & self._shift_down(p, d)
            d *= 2
        over = over + g[..., K - 1 : K, :]
        out = (v + self._shift_down(g)) & LIMB_MASK
        return out, over

    def _ks_carry1(self, v):
        """Lean carry for columns already < 2^17 (e.g. the sum of two
        16-bit-limb values): skips the generic _ks_carry's two value
        folds — only the 0/1 generate/propagate prefix remains.  Returns
        (limbs < 2^16, carry_out (..., 1, T))."""
        K = v.shape[-2]
        g = v >> LIMB_BITS                      # 0/1
        p = jnp.where((v & LIMB_MASK) == LIMB_MASK, jnp.uint32(1),
                      jnp.uint32(0))
        d = 1
        while d < K:
            g = g | (p & self._shift_down(g, d))
            p = p & self._shift_down(p, d)
            d *= 2
        out = (v + self._shift_down(g)) & LIMB_MASK
        return out, g[..., K - 1 : K, :]

    def _ks_borrow_sub(self, a, b):
        """a - b on (..., L, T) 16-bit limb columns; returns (diff,
        borrow_out).  diff is the 2^(16L)-complement result; borrow_out
        (..., 1, T) is 0/1."""
        L = self.L
        v = a + jnp.uint32(LIMB_MASK + 1) - b    # in [1, 2^17)
        g = (v >> LIMB_BITS) ^ jnp.uint32(1)     # borrow generated: v < 2^16
        p = jnp.where((v & LIMB_MASK) == 0, jnp.uint32(1), jnp.uint32(0))
        d = 1
        while d < L:
            g = g | (p & self._shift_down(g, d))
            p = p & self._shift_down(p, d)
            d *= 2
        bor_in = self._shift_down(g)
        out = (v - bor_in) & LIMB_MASK
        return out, g[..., L - 1 : L, :]

    def _cond_sub_p(self, limbs, top):
        """limbs - p when limbs+top*2^(16L) >= p (single conditional)."""
        pcol = self._const_col(self._p_ints, limbs.shape[-1])
        sub, borrow = self._ks_borrow_sub(limbs, pcol)
        ge = (top > 0) | (borrow == 0)
        return jnp.where(ge, sub, limbs)

    def _cond_sub_2p(self, limbs):
        """limbs - 2p when limbs >= 2p (lazy-invariant restore, < 4p in)."""
        pcol = self._const_col(self._p2_ints, limbs.shape[-1])
        sub, borrow = self._ks_borrow_sub(limbs, pcol)
        return jnp.where(borrow == 0, sub, limbs)

    # -------------------------------------------------------------- REDC
    def _dot_exact(self, mat, corr, planes):
        """Exact M @ planes for byte-valued planes via the int8 MXU.

        mat: (M+1, K) int8 — centered entries with the ones colsum-row
        last (fields/mxu.py:_i8_pack); corr: (M, 1) int32 per-row
        constant; planes: (..., K, T) uint32 byte values (< 256).
        Returns (..., M, T) uint32, exact (i32 accumulation)."""
        xi = (planes.astype(jnp.int32) - 128).astype(jnp.int8)
        out = self._const_dot(mat, xi, jnp.int32)
        M = corr.shape[-2]
        full = out[..., :M, :] + out[..., M : M + 1, :] * 128 + corr
        return full.astype(jnp.uint32)

    def _redc(self, acc, fc, subs: int = 1):
        """Montgomery reduction of lazy product columns acc (..., W, T)
        u32 (16-bit stride, values < 2^24) -> limbs (..., L, T).

        fc: the field-const tuple from read_consts.

        lazy=True: result < 2p (no subtraction).  lazy=False: result < p,
        via `subs` chained conditional subtractions with a tracked top
        word — subs=1 suffices for single products (T < p^2 -> < 2p);
        summed-product inputs (e.g. a fused MDS row, T < t*p^2) need
        subs = floor(t*p/R) + 1."""
        L = self.L
        mnp, mnp_corr, mp, mp_corr = fc[:4]
        # K-trimmed byte planes: only byte positions < 2L matter mod R,
        # so columns >= L (and column L-1's third byte) are dropped —
        # 3L-1 input rows = one 128-deep MXU K-block (vs 3W = 147).
        t8 = jnp.concatenate(
            [
                acc[..., :L, :] & 0xFF,
                (acc[..., :L, :] >> 8) & 0xFF,
                acc[..., : L - 1, :] >> 16,
            ],
            axis=-2,
        )
        mc = self._dot_exact(mnp, mnp_corr, t8)       # (..., 2L, T)
        m16 = mc[..., :L, :] + (mc[..., L:, :] << 8)  # deinterleaved blocks
        m, _ = self._ks_carry(m16)
        m8 = jnp.concatenate([m & 0xFF, m >> 8], axis=-2)
        qc = self._dot_exact(mp, mp_corr, m8)         # (..., 4L, T)
        q16 = qc[..., : 2 * L, :] + (qc[..., 2 * L :, :] << 8)
        pad = [(0, 0)] * (q16.ndim - 2) + [(0, 1), (0, 0)]
        u = acc + jnp.pad(q16, pad)
        _, c1 = self._ks_carry(u[..., :L, :])
        if self.lazy:
            # inputs < 2p and R > 4p give a result < 2p < 2^(16L), so the
            # carry out of limb L-1 is the whole story — no top column, no
            # conditional subtraction.
            limbs, _ = self._ks_carry(u[..., L : 2 * L, :], carry_in=c1)
            return limbs
        # canonical: explicit top tracking (the value may exceed 2^(16L),
        # so "ge" alone cannot drop the top).
        limbs, top = self._ks_carry(u[..., L : 2 * L, :], carry_in=c1)
        top = top + u[..., 2 * L : 2 * L + 1, :]
        if subs == 1:
            return self._cond_sub_p(limbs, top)
        # Multi-p reduction (summed-product inputs, e.g. the fused MDS
        # row: v < (subs+1)*p): estimate the quotient k = floor(v/p) from
        # the top 32 bits and subtract k*p ONCE instead of running `subs`
        # chained conditional borrow-subtract networks.  Safety: with
        # thresholds c_j = floor(j*p / 2^(16(L-1))), t_est > c_j implies
        # v >= (c_j+1)*2^(16(L-1)) > j*p, so the subtraction never
        # underflows, and the estimate trails floor(v/p) by at most 1 —
        # the final _cond_sub_p restores < p.
        T = limbs.shape[-1]
        L1 = L - 1
        p_int = sum(int(v) << (16 * i) for i, v in enumerate(self._p_ints))
        t_est = (top << 16) + limbs[..., L1:L, :]          # (..., 1, T)
        k = jnp.zeros_like(t_est)
        for j in range(1, subs + 1):
            cj = jnp.uint32((j * p_int) >> (16 * L1))
            k = k + jnp.where(t_est > cj, jnp.uint32(1), jnp.uint32(0))
        kp = jnp.zeros_like(limbs)
        ktop = jnp.zeros_like(t_est)
        for j in range(1, subs + 1):
            mj = int_to_limbs(j * p_int, L + 1)
            mcol = self._const_col([int(v) for v in mj[:L]], T)
            sel = k == j
            kp = kp + jnp.where(sel, mcol, jnp.uint32(0))
            ktop = ktop + jnp.where(sel, jnp.uint32(int(mj[L])),
                                    jnp.uint32(0))
        sub, borrow = self._ks_borrow_sub(limbs, kp)
        top = top - ktop - borrow
        return self._cond_sub_p(sub, top)

    @staticmethod
    def _const_dot(mat, x, prefer=jnp.float32):
        """mat (M, K) constant  @  x (..., K, T) -> (..., M, T) on the MXU.

        Leading dims of x batch the matmul; the constant is broadcast.
        (Flattening leading dims into lanes around one wide 2D matmul was
        measured SLOWER — the moveaxis/reshape relayouts cost more than
        the batched small matmuls they replace.)"""
        if x.ndim == 2:
            return jnp.dot(mat, x, preferred_element_type=prefer)
        lead = x.shape[:-2]
        nb = len(lead)
        mb = jnp.broadcast_to(mat, (*lead, *mat.shape))
        return jax.lax.dot_general(
            mb, x,
            dimension_numbers=(((nb + 1,), (nb,)),
                               (tuple(range(nb)), tuple(range(nb)))),
            preferred_element_type=prefer,
        )

    def _mont_mul(self, a, b, fc):
        """Fused Montgomery product of (..., L, T) batches (VPU conv + MXU
        REDC; same math as fields/mxu.py MXUMont._kernel).  a and b
        broadcast against each other over leading dims; a's limbs drive
        the convolution (pass the lower-rank operand as a).  Large leading
        batches are processed in slabs to bound VMEM temporaries."""
        L, W = self.L, self.W
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        lead = shape[:-2]
        total_lanes = int(np.prod(lead, dtype=np.int64)) * shape[-1] if lead \
            else shape[-1]
        if lead and total_lanes > MAX_WAVE_LANES:
            # slab over the first leading dim
            n0 = shape[0]
            step = max(1, n0 * MAX_WAVE_LANES // total_lanes)
            if step < n0:  # guard: a no-op slab (n0 == 1 with further
                # leading dims still over budget) must fall through to the
                # base path rather than recurse on an identical shape
                ab = jnp.broadcast_to(a, shape)
                bb = jnp.broadcast_to(b, shape)
                outs = [
                    self._mont_mul(ab[i : i + step], bb[i : i + step], fc)
                    for i in range(0, n0, step)
                ]
                return jnp.concatenate(outs, axis=0)
        # materialize broadcasts up-front: Mosaic can't lower a single op
        # that extends both sublanes and lanes (e.g. (N, 1, 1) -> (N, L, T)
        # from a per-limb slice of a lane-constant operand)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        pad_lead = [(0, 0)] * (len(shape) - 2)
        acc = jnp.zeros((*lead, W, shape[-1]), jnp.uint32)
        for i in range(L):
            prod = a[..., i : i + 1, :] * b
            acc = acc + jnp.pad(
                prod & LIMB_MASK, pad_lead + [(i, W - i - L), (0, 0)]
            )
            acc = acc + jnp.pad(
                prod >> LIMB_BITS, pad_lead + [(i + 1, W - i - 1 - L), (0, 0)]
            )
        return self._redc(acc, fc)

    # ------------------------------------------------------------ add/sub
    def _add_f(self, a, b):
        """Field add under the instance's invariant (< 2p or < p).

        Inputs hold normalized (< 2^16) limbs, so the sum's columns are
        < 2^17 and the lean carry applies."""
        limbs, top = self._ks_carry1(a + b)
        if self.lazy:
            return self._cond_sub_2p(limbs)
        return self._cond_sub_p(limbs, top)

    def _sub_f(self, a, b):
        """Field sub on (..., L, T) 16-bit limb batches."""
        d, borrow = self._ks_borrow_sub(a, b)
        # if borrowed, add the modulus back (no re-borrow possible)
        pcol = self._const_col(
            self._p2_ints if self.lazy else self._p_ints, d.shape[-1]
        )
        fixed, _ = self._ks_carry1(d + pcol)
        return jnp.where(borrow > 0, fixed, d)

    # ------------------------------------------------------------- waves
    # Independent ops of one formula run as ONE wide call on
    # lane-concatenated operands: the REDC matmuls sit on the MXU while
    # everything else is VPU work, and batching a wave turns 2 MXU<->VPU
    # round-trips per product into 2 per wave.
    def _mm_wave(self, xs, ys, fc):
        T = xs[0].shape[1]
        r = self._mont_mul(
            jnp.concatenate(xs, axis=1), jnp.concatenate(ys, axis=1), fc
        )
        return [r[:, i * T : (i + 1) * T] for i in range(len(xs))]

    def _add_wave(self, xs, ys):
        T = xs[0].shape[1]
        r = self._add_f(jnp.concatenate(xs, axis=1), jnp.concatenate(ys, axis=1))
        return [r[:, i * T : (i + 1) * T] for i in range(len(xs))]

    def _sub_wave(self, xs, ys):
        T = xs[0].shape[1]
        r = self._sub_f(jnp.concatenate(xs, axis=1), jnp.concatenate(ys, axis=1))
        return [r[:, i * T : (i + 1) * T] for i in range(len(xs))]
