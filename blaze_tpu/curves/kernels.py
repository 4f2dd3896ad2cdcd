"""Fused Pallas EC kernels for TPU: whole group-law ops in VMEM.

The XLA path issues each Montgomery mul of a curve add as its own Pallas
call (fields/mxu.py) with HBM-materialized intermediates between them.
These kernels fuse complete Renes-Costello-Batina group ops — all 9-12
Montgomery muls plus the add/sub glue — into single kernels whose
intermediates never leave VMEM, and fuse the MSM lane scan (sequential
mixed-adds with a carried accumulator) into ONE pallas_call whose carry
lives in VMEM scratch across grid steps.

This is the TPU replacement for the reference's FPGA "EC adder" engines
(`/root/reference/src/ingo_msm/msm_hw_code.rs:35-54` exposes only their
perf counters; the logic itself is an opaque bitstream).

Layout: "lanes-major" — a field element batch is (L, T): limbs on
sublanes, batch on lanes; a projective point batch is (3L, T) with X, Y, Z
stacked; an affine batch is (2L, T).  The MSM scan keeps its whole working
set in this layout (see msm/pippenger.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.kernel_ops import PallasFieldOps
from ..fields.mxu import mxu_available
from ..fields.spec import LIMB_BITS, LIMB_MASK, int_to_limbs
from .spec import CurveSpec

__all__ = ["ECKernels", "kernels_available"]


def kernels_available() -> bool:
    return mxu_available()


class ECKernels(PallasFieldOps):
    """Per-curve fused kernels. Cached per CurveSpec.

    In-kernel field arithmetic comes from PallasFieldOps with the lazy
    < 2p invariant (R > 4p holds for all supported base fields):
    canonicalize (one cond-sub vs p) only when results leave the kernel
    (msm/pippenger.py does this on the gathered bucket boundaries and
    lane totals)."""

    _CACHE: dict = {}

    @classmethod
    def for_curve(cls, spec: CurveSpec, tile: int = 512,
                  interpret: bool = False) -> "ECKernels":
        key = (spec.name, tile, interpret)
        inst = cls._CACHE.get(key)
        if inst is None:
            inst = cls(spec, tile, interpret)
            cls._CACHE[key] = inst
        return inst

    def __init__(self, spec: CurveSpec, tile: int = 512,
                 interpret: bool = False):
        super().__init__(spec.fq, lazy=True)
        self.spec = spec
        self.tile = tile
        self.interpret = interpret
        fq = spec.fq
        b3 = (3 * spec.b) % fq.p
        b3_mont = (b3 * fq.r) % fq.p
        self._b3_ints = [int(v) for v in int_to_limbs(b3_mont, self.L)]

        # Constant-multiplier byte-conv matrix for b3 (deinterleaved
        # lo/hi rows like MXUMont's REDC matrices): column j of b3*x =
        # sum_i b3_byte[j-i] * x_byte[i] — so the whole limb convolution
        # of a CONSTANT multiplier is one bf16 matmul (entries <= 255,
        # <= 2L products of <= 255^2: exact in f32) instead of L
        # VPU mul+shift+add rounds.
        nb = 2 * self.L
        kb = [(b3_mont >> (8 * i)) & 0xFF for i in range(nb)]
        mb = np.zeros((2 * nb, nb), dtype=np.float32)
        for j in range(2 * nb - 1):
            for i in range(max(0, j - nb + 1), min(nb, j + 1)):
                mb[j, i] = kb[j - i]
        # rows deinterleaved (even byte cols block, odd block) for the
        # contiguous 16-bit reconstruction; columns permuted to the
        # kernel's [limb lo bytes; limb hi bytes] input layout; packed to
        # the centered-int8 + correction form (the exact i32 MXU path,
        # fields/mxu.py:_i8_pack).
        mb = np.concatenate([mb[0::2], mb[1::2]], axis=0)
        col_perm = list(range(0, nb, 2)) + list(range(1, nb, 2))
        from ..fields.mxu import _i8_pack

        self._b3m_i8, self._b3_corr = _i8_pack(mb[:, col_perm])

    # --------------------------------------------------- constant plumbing
    def _ec_const_arrays(self):
        return self.field_const_arrays() + [self._b3m_i8, self._b3_corr]

    def _ec_const_inputs(self):
        return [jnp.asarray(a) for a in self._ec_const_arrays()]

    def _ec_const_specs(self):
        return self.const_specs(self._ec_const_arrays())

    @staticmethod
    def _read_ec_consts(refs):
        """(fc, b3c) from the first 6 kernel refs."""
        fc = PallasFieldOps.read_consts(refs)
        n = PallasFieldOps.N_FIELD_CONSTS
        return fc, (refs[n][:], refs[n + 1][:])

    # ------------------------------------------------- in-kernel field ops
    # (generic limb/REDC/add/sub primitives inherited from PallasFieldOps)

    def _b3_mul(self, x, b3c, fc):
        """b3 * x (Montgomery) for (L, T) batches: the constant-side limb
        convolution runs as ONE int8 matmul against the precomputed byte
        matrix instead of L VPU rounds, then the standard REDC."""
        L = self.L
        b3m, b3corr = b3c
        x8 = jnp.concatenate([x & 0xFF, x >> 8], axis=0)     # (2L bytes, T)
        vc = self._dot_exact(b3m, b3corr, x8)                # (4L, T)
        nb = 2 * L
        w16 = vc[:nb] + (vc[nb:] << 8)                       # (2L, T) <2^31
        carried, over = self._ks_carry(w16)
        acc = jnp.concatenate([carried, over], axis=0)       # (W, T)
        return self._redc(acc, fc)

    def _b3_col(self, T):
        return self._const_col(self._b3_ints, T)

    # ----------------------------------------------------- group formulas
    #
    # Wave-batched via PallasFieldOps._mm_wave/_add_wave/_sub_wave: each
    # wave's independent Montgomery products run as ONE wide _mont_mul on
    # lane-concatenated operands (measured: each MXU<->VPU transition
    # stalls ~0.5 us/tile — the dominant cost of the unbatched body).
    def _b3_wave(self, xs, b3c, fc):
        T = xs[0].shape[1]
        r = self._b3_mul(jnp.concatenate(xs, axis=1), b3c, fc)
        return [r[:, i * T : (i + 1) * T] for i in range(len(xs))]

    def _add_mixed_body(self, X1, Y1, Z1, X2, Y2, fc, b3c):
        """RCB 2016 alg 8 (a=0), all in VMEM. 11 muls in 3 waves (the two
        b3 muls ride the constant-matrix matmul path)."""
        s0, s1 = self._add_wave([X1, X2], [Y1, Y2])
        m0, m1, m2, m3, m4 = self._mm_wave(
            [X1, Y1, s0, Y2, X2], [X2, Y2, s1, Z1, Z1], fc
        )
        d0, t4, u2, d3 = self._add_wave(
            [m0, m3, m4, m0], [m1, Y1, X1, m0]
        )                                    # m0+m1, Y1+Y2Z1, X1+X2Z1, 2m0
        t3 = self._sub_f(m2, d0)             # X1Y2 + X2Y1
        t0 = self._add_f(d3, m0)             # 3 X1X2
        w0, w1 = self._b3_wave([Z1, u2], b3c, fc)
        z3 = self._add_f(m1, w0)
        t1 = self._sub_f(m1, w0)
        r0, r1, r2, r3, r4, r5 = self._mm_wave(
            [t3, t4, t1, t0, z3, t0], [t1, w1, z3, w1, t4, t3], fc
        )
        X3 = self._sub_f(r0, r1)
        Y3, Z3 = self._add_wave([r2, r4], [r3, r5])
        return X3, Y3, Z3

    def _add_full_body(self, X1, Y1, Z1, X2, Y2, Z2, fc, b3c):
        """RCB 2016 alg 7 (a=0). 12 muls in 3 waves; complete."""
        sa = self._add_wave([X1, X2, Y1, Y2, X1, X2], [Y1, Y2, Z1, Z2, Z1, Z2])
        m0, m1, m2, m3, m4, m5 = self._mm_wave(
            [X1, Y1, Z1, sa[0], sa[2], sa[4]],
            [X2, Y2, Z2, sa[1], sa[3], sa[5]], fc,
        )
        u = self._add_wave([m0, m1, m0, m0], [m1, m2, m2, m0])
        t3, t4, t5 = self._sub_wave([m3, m4, m5], [u[0], u[1], u[2]])
        t0 = self._add_f(u[3], m0)           # 3 X1X2
        w0, w1 = self._b3_wave([m2, t5], b3c, fc)
        z3 = self._add_f(m1, w0)
        t1 = self._sub_f(m1, w0)
        r0, r1, r2, r3, r4, r5 = self._mm_wave(
            [t3, t4, t1, t0, z3, t0], [t1, w1, z3, w1, t4, t3], fc
        )
        X3 = self._sub_f(r0, r1)
        Y3, Z3 = self._add_wave([r2, r4], [r3, r5])
        return X3, Y3, Z3

    # ------------------------------------------------------- fused scan
    @functools.cached_property
    def _jit_cache(self):
        # jitted pallas callables keyed by (kind, static shape tuple).
        # pallas_call invoked eagerly with a fresh kernel closure would
        # re-lower the Mosaic kernel EVERY call (~1 s); caching a jitted
        # wrapper makes compilation a per-shape one-time cost.
        return {}

    def _scan_fn(self, C: int, Bp: int, packed: bool, signed: bool):
        key = ("scan", C, Bp, packed, signed)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        L, W, T = self.L, self.W, self.tile

        def kernel(*args):
            (row_ref, emit_ref, tot_ref, carry_scr) = args[6:]
            fc, b3c = self._read_ec_consts(args)
            c = pl.program_id(1)

            @pl.when(c == 0)
            def _init():
                carry_scr[:L] = jnp.zeros((L, T), jnp.uint32)
                carry_scr[L : 2 * L] = self._const_col(self._one_ints, T)
                carry_scr[2 * L :] = jnp.zeros((L, T), jnp.uint32)

            cur = carry_scr[:]
            if packed:
                # xy-packed row: u32 limb r = X_r | (Y_r << 16) — unpack is
                # two mask ops, zero sublane shuffles
                row = row_ref[0]
                X2 = row[:L] & jnp.uint32(LIMB_MASK)
                Y2 = row[:L] >> LIMB_BITS
            else:
                row = row_ref[0].astype(jnp.uint32)
                X2 = row[:L]
                Y2 = row[L : 2 * L]
            if signed:
                # balanced-digit mode: the trailing row carries the digit
                # sign; negate Y (2p - Y, valid in the lazy < 2p domain)
                sgn = row[-1:]
                negY = self._sub_f(
                    self._const_col(self._p2_ints, Y2.shape[-1]), Y2
                )
                Y2 = jnp.where(sgn > 0, negY, Y2)
            X3, Y3, Z3 = self._add_mixed_body(
                cur[:L], cur[L : 2 * L], cur[2 * L :],
                X2, Y2, fc, b3c,
            )
            nxt = jnp.concatenate([X3, Y3, Z3], axis=0)
            carry_scr[:] = nxt
            emit_ref[0] = nxt.astype(jnp.uint16)

            @pl.when(c == C - 1)
            def _fin():
                tot_ref[:] = nxt

        in_rows = (L if packed else 2 * L) + (1 if signed else 0)
        in_dtype = jnp.uint32 if packed else jnp.uint16
        call = pl.pallas_call(
            kernel,
            grid=(Bp // T, C),
            in_specs=self._ec_const_specs() + [
                pl.BlockSpec((1, in_rows, T), lambda i, c: (c, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 3 * L, T), lambda i, c: (c, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * L, T), lambda i, c: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((C, 3 * L, Bp), jnp.uint16),
                jax.ShapeDtypeStruct((3 * L, Bp), jnp.uint32),
            ],
            scratch_shapes=[pltpu.VMEM((3 * L, T), jnp.uint32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=self.interpret,
        )
        fn = jax.jit(call)
        self._jit_cache[key] = fn
        return fn

    def scan_mixed(self, rows):
        """Sequential inclusive EC prefix scan of sorted affine points.

        rows: (C, L, B) uint32 xy-packed (limb r = X_r | Y_r << 16), or
        (C, 2L, B) uint16/uint32 split-limb.  Returns (emitted, lane_tot):
        emitted (C, 3L, B) uint16 inclusive prefixes; lane_tot (3L, B)
        uint32 final carries.

        One pallas_call: grid (B/tile, C); the per-lane running sum lives
        in VMEM scratch across the C inner grid steps (revisited blocks).

        A trailing extra row marks balanced-digit mode: it carries the
        per-point digit sign and the kernel negates Y accordingly."""
        C, nrows, B = rows.shape
        L = self.L
        T = self.tile
        packed = nrows in (L, L + 1)
        signed = nrows in (L + 1, 2 * L + 1)
        assert nrows in (L, L + 1, 2 * L, 2 * L + 1), nrows
        npad = -B % T
        if npad:
            rows = jnp.pad(rows, ((0, 0), (0, 0), (0, npad)))
        Bp = B + npad
        rows = rows.astype(jnp.uint32 if packed else jnp.uint16)

        consts = self._ec_const_inputs()
        emitted, tot = self._scan_fn(C, Bp, packed, signed)(*consts, rows)
        if npad:
            emitted = emitted[..., :B]
            tot = tot[..., :B]
        return emitted, tot

    # ---------------------------------------------------- fused reduction
    def _reduce_fn(self, C: int, Bp: int):
        key = ("reduce", C, Bp)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        L, W, T = self.L, self.W, self.tile

        def kernel(*args):
            (row_ref, tot_ref, carry_scr) = args[6:]
            fc, b3c = self._read_ec_consts(args)
            c = pl.program_id(1)

            @pl.when(c == 0)
            def _init():
                carry_scr[:L] = jnp.zeros((L, T), jnp.uint32)
                carry_scr[L : 2 * L] = self._const_col(self._one_ints, T)
                carry_scr[2 * L :] = jnp.zeros((L, T), jnp.uint32)

            cur = carry_scr[:]
            row = row_ref[0].astype(jnp.uint32)
            X3, Y3, Z3 = self._add_full_body(
                cur[:L], cur[L : 2 * L], cur[2 * L :],
                row[:L], row[L : 2 * L], row[2 * L :],
                fc, b3c,
            )
            nxt = jnp.concatenate([X3, Y3, Z3], axis=0)
            carry_scr[:] = nxt

            @pl.when(c == C - 1)
            def _fin():
                tot_ref[:] = nxt

        call = pl.pallas_call(
            kernel,
            grid=(Bp // T, C),
            in_specs=self._ec_const_specs() + [
                pl.BlockSpec((1, 3 * L, T), lambda i, c: (c, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3 * L, T), lambda i, c: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3 * L, Bp), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((3 * L, T), jnp.uint32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=self.interpret,
        )
        fn = jax.jit(call)
        self._jit_cache[key] = fn
        return fn

    def reduce_cols(self, rows):
        """Lane-wise EC sum over axis 0: (C, 3L, B) u16/u32 -> (3L, B) u32.

        One pallas_call; per-lane accumulator lives in VMEM scratch across
        the C sequential grid steps.  Projective-complete adds, so any row
        may hold identities (e.g. padding)."""
        C, threeL, B = rows.shape
        L = self.L
        T = self.tile
        assert threeL == 3 * L
        npad = -B % T
        if npad:
            # pad with identity columns (0, 1, 0)
            ident = np.zeros((3 * L, npad), np.uint16)
            ident[L : 2 * L] = np.asarray(self._one_ints, np.uint16)[:, None]
            rows = jnp.concatenate(
                [rows.astype(jnp.uint16),
                 jnp.broadcast_to(jnp.asarray(ident), (C, 3 * L, npad))],
                axis=-1,
            )
        Bp = B + npad
        rows = rows.astype(jnp.uint16)
        consts = self._ec_const_inputs()
        tot = self._reduce_fn(C, Bp)(*consts, rows)
        return tot[..., :B] if npad else tot

    # ------------------------------------------------- sequential chains
    #
    # Horner fold and k-fold doubling are long chains of group ops on a
    # HANDFUL of points.  As XLA-level ops each link costs ~85 us (pad to
    # tile, launch, HBM round-trip); here the whole chain is one
    # pallas_call with the accumulator in VMEM scratch (~us per link).

    def _fold_fn(self, c: int, Wn: int):
        key = ("fold", c, Wn)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        L = self.L
        TL = 128                              # one lane tile
        steps = max((Wn - 1) * (c + 1), 1)

        def lane_pick(ws, idx):
            # Mosaic can't reduce unsigned ints; limbs are < 2^16 so an
            # int32 sum is exact.
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, TL), 1)
            col = jnp.sum(
                jnp.where(lane == idx, ws.astype(jnp.int32), jnp.int32(0)),
                axis=1, keepdims=True,
            ).astype(jnp.uint32)
            return jnp.broadcast_to(col, ws.shape)

        def kernel(*args):
            (ws_ref, o_ref, acc_scr) = args[6:]
            fc, b3c = self._read_ec_consts(args)
            s = pl.program_id(0)
            ws = ws_ref[:]

            @pl.when(s == 0)
            def _init():
                acc_scr[:] = lane_pick(ws, Wn - 1)

            acc = acc_scr[:]
            r = s // (c + 1)
            pos = s % (c + 1)
            X, Y, Z = acc[:L], acc[L : 2 * L], acc[2 * L :]
            add_w = pos == c

            q = jnp.where(add_w, lane_pick(ws, Wn - 2 - r), acc)
            X3, Y3, Z3 = self._add_full_body(
                X, Y, Z, q[:L], q[L : 2 * L], q[2 * L :], fc, b3c,
            )
            acc_scr[:] = jnp.concatenate([X3, Y3, Z3], axis=0)

            @pl.when(s == steps - 1)
            def _fin():
                o_ref[:] = acc_scr[:]

        call = pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=self._ec_const_specs() + [
                pl.BlockSpec((3 * L, TL), lambda s: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3 * L, TL), lambda s: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3 * L, TL), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((3 * L, TL), jnp.uint32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=self.interpret,
        )
        fn = jax.jit(call)
        self._jit_cache[key] = fn
        return fn

    def fold_horner(self, wsums_lm, c: int):
        """Horner window fold sum_w 2^(cw) W_w, entirely in one kernel.

        wsums_lm: (3L, Wn) u32 lanes-major (lazy < 2p fine).  Returns one
        (3L,) point, < 2p.  Doubling is the complete add with itself —
        2 extra muls per link, zero extra code paths."""
        L = self.L
        threeL, Wn = wsums_lm.shape
        assert threeL == 3 * L
        ws = jnp.pad(wsums_lm, ((0, 0), (0, 128 - Wn)))
        consts = self._ec_const_inputs()
        out = self._fold_fn(c, Wn)(*consts, ws)
        return out[:, 0]

    def _dbl_fn(self, k: int, Bp: int):
        key = ("dbln", k, Bp)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        L, W, T = self.L, self.W, self.tile

        def kernel(*args):
            (p_ref, o_ref, acc_scr) = args[6:]
            fc, b3c = self._read_ec_consts(args)
            s = pl.program_id(1)

            @pl.when(s == 0)
            def _init():
                acc_scr[:] = p_ref[:]

            a = acc_scr[:]
            X3, Y3, Z3 = self._add_full_body(
                a[:L], a[L : 2 * L], a[2 * L :],
                a[:L], a[L : 2 * L], a[2 * L :], fc, b3c,
            )
            acc_scr[:] = jnp.concatenate([X3, Y3, Z3], axis=0)

            @pl.when(s == k - 1)
            def _fin():
                o_ref[:] = acc_scr[:]

        call = pl.pallas_call(
            kernel,
            grid=(Bp // T, k),
            in_specs=self._ec_const_specs() + [
                pl.BlockSpec((3 * L, T), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3 * L, T), lambda i, s: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3 * L, Bp), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((3 * L, T), jnp.uint32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=self.interpret,
        )
        fn = jax.jit(call)
        self._jit_cache[key] = fn
        return fn

    def dbl_n(self, pts_lm, k: int):
        """k successive doublings of every lane: (3L, B) -> (3L, B)."""
        if k <= 0:
            return pts_lm
        threeL, B = pts_lm.shape
        T = self.tile
        npad = -B % T
        if npad:
            pts_lm = jnp.pad(pts_lm, ((0, 0), (0, npad)))
        consts = self._ec_const_inputs()
        out = self._dbl_fn(k, B + npad)(*consts, pts_lm)
        return out[:, :B] if npad else out

    # --------------------------------------------------- batched full add
    def _add_fn(self, Bp: int):
        key = ("add", Bp)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        L, W, T = self.L, self.W, self.tile

        def kernel(*args):
            (p_ref, q_ref, o_ref) = args[6:]
            fc, b3c = self._read_ec_consts(args)
            a = p_ref[:]
            b = q_ref[:]
            X3, Y3, Z3 = self._add_full_body(
                a[:L], a[L : 2 * L], a[2 * L :],
                b[:L], b[L : 2 * L], b[2 * L :], fc, b3c,
            )
            o_ref[:] = jnp.concatenate([X3, Y3, Z3], axis=0)

        call = pl.pallas_call(
            kernel,
            grid=(Bp // T,),
            in_specs=self._ec_const_specs() + [
                pl.BlockSpec((3 * L, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * L, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3 * L, T), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3 * L, Bp), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=self.interpret,
        )
        fn = jax.jit(call)
        self._jit_cache[key] = fn
        return fn

    def add(self, p, q):
        """Batched complete projective add in lanes-major layout.

        p, q: (3L, B) uint32 -> (3L, B)."""
        T = self.tile
        B = p.shape[-1]
        npad = -B % T
        if npad:
            p = jnp.pad(p, ((0, 0), (0, npad)))
            q = jnp.pad(q, ((0, 0), (0, npad)))
        Bp = B + npad
        consts = self._ec_const_inputs()
        out = self._add_fn(Bp)(*consts, p, q)
        return out[..., :B] if npad else out
