"""Fused Pallas Poseidon kernel: the full permutation in VMEM.

The XLA path (poseidon.py) issues one Montgomery-mul kernel per S-box /
MDS product with HBM round-trips between rounds.  Here the ENTIRE
permutation — all r_f + r_p rounds — runs inside one pallas_call per
lane-batch of states; this is the TPU replacement for the reference's
opaque FPGA hash core (`/root/reference/src/ingo_hash/poseidon_api.rs`
drives it by register writes only).

Key trick: the MDS mix is a matmul by a CONSTANT field matrix, so — like
the REDC matrices of fields/mxu.py — the whole t x t field-matrix product
collapses into ONE bf16 byte-plane matmul on the MXU:

    column k of (M_ij * s_j) = sum_b byte_b(M_ij) * byte_{k-b}(s_j)

assembled as a (t*4L, t*2L) block matrix against the concatenated byte
planes of all t state elements, followed by one BATCHED Montgomery
reduction (kernel_ops._redc over the leading t axis).  The matmul runs on
the int8 MXU path (centered operands + ones-row correction,
fields/mxu.py:_i8_pack) with EXACT int32 accumulation — so the whole
t-wide input rides ONE matmul (the old bf16 path needed <= 8-element
groups to keep f32 sums exact).

Layout: states are (t, L, B) — state rows on the leading axis, 16-bit
limbs on sublanes, independent states on the 128-lane minor axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.kernel_ops import PallasFieldOps
from .params import PoseidonParams

__all__ = ["PoseidonKernels"]

# max state elements per byte-matmul group; int32 accumulation is exact
# for any practical t (|sum| <= t*2L*128^2 ~ 2^23 at t=64), so one group
# covers every Poseidon instance in use (t = 9 / 12)
_GROUP = 64


class PoseidonKernels(PallasFieldOps):
    """Per-PoseidonParams fused permutation kernel."""

    _CACHE: dict = {}

    @classmethod
    def for_params(cls, params: PoseidonParams,
                   interpret: bool = False) -> "PoseidonKernels":
        # The key must pin the FULL constant set: two CSV-loaded parameter
        # sets with identical (field, t, rounds) but different constants
        # must not share a kernel (its MDS/RC matrices are baked in).
        # Exact tuples, not their hash() — a collision would silently
        # reuse a kernel with the wrong baked-in constants.
        consts = (tuple(params.round_constants),
                  tuple(tuple(row) for row in params.mds))
        key = (params.spec.name, params.t, params.r_f, params.r_p,
               consts, interpret)
        inst = cls._CACHE.get(key)
        if inst is None:
            inst = cls(params, interpret)
            cls._CACHE[key] = inst
        return inst

    def __init__(self, params: PoseidonParams, interpret: bool = False):
        super().__init__(params.spec, lazy=False)
        assert params.alpha == 5, "fused S-box is specialized to x^5"
        self.params = params
        self.interpret = interpret
        self._jit_cache: dict = {}
        t, L = params.t, self.L
        nb = 2 * L                                   # bytes per element
        p, r = params.spec.p, params.spec.r

        # ---- block byte-conv matrices, one per <=_GROUP input group.
        # Block (i, j): conv matrix of the constant M[i][j] (Montgomery),
        # rows deinterleaved lo/hi per output block, columns permuted to
        # the [lo bytes; hi bytes] input layout of each element.
        def conv_block(mij_mont: int) -> np.ndarray:
            kb = [(mij_mont >> (8 * b)) & 0xFF for b in range(nb)]
            mb = np.zeros((2 * nb, nb), dtype=np.float32)
            for out in range(2 * nb - 1):
                for b in range(max(0, out - nb + 1), min(nb, out + 1)):
                    mb[out, b] = kb[out - b]
            mb = np.concatenate([mb[0::2], mb[1::2]], axis=0)  # deinterleave
            col_perm = list(range(0, nb, 2)) + list(range(1, nb, 2))
            return mb[:, col_perm]

        # REDC of a t-fold product sum leaves a value < (t*p/R + 1)*p
        self._mds_subs = (t * p) // params.spec.r + 1
        self._groups = [
            list(range(g, min(g + _GROUP, t))) for g in range(0, t, _GROUP)
        ]
        from ..fields.mxu import _i8_pack

        self._bm_i8 = []
        for cols in self._groups:
            bm = np.zeros((t * 2 * nb, len(cols) * nb), dtype=np.float32)
            for i in range(t):
                for cj, j in enumerate(cols):
                    mij = (params.mds[i][j] * r) % p
                    bm[i * 2 * nb : (i + 1) * 2 * nb,
                       cj * nb : (cj + 1) * nb] = conv_block(mij)
            self._bm_i8.append(_i8_pack(bm))

        # round constants: (rounds, t, L, 1) u32 Montgomery
        self._rc_host = params.rc_mont[..., None].astype(np.uint32)
        # R^2 column for optional in-kernel canonical->Montgomery input
        # conversion (mont_mul(x, R^2) = xR): folding it here removes the
        # standalone to_mont pass (measured 253 ms at 2^15 leaves — more
        # than the whole 109 ms permutation)
        from ..fields.spec import int_to_limbs

        r2 = (params.spec.r * params.spec.r) % params.spec.p
        self._r2_host = np.asarray(
            int_to_limbs(r2, self.L), np.uint32
        )[:, None]

    # ------------------------------------------------------------- pieces
    def _mds_mxu(self, state, bms, fc):
        """state (t, L, T) -> MDS @ state, via byte-plane matmuls + one
        batched REDC.  All values canonical (< p)."""
        t, L, T = state.shape
        nb = 2 * L
        by = jnp.concatenate([state & 0xFF, state >> 8], axis=1)  # (t,2L,T)
        acc = None
        for cols, (bm, corr) in zip(self._groups, bms):
            xg = by[cols[0] : cols[-1] + 1].reshape(len(cols) * nb, T)
            vi = self._dot_exact(bm, corr, xg)
            acc = vi if acc is None else acc + vi
        vc = acc.reshape(t, 2 * nb, T)                # byte cols, deint.
        lo, hi = vc[:, :nb], vc[:, nb:]
        w = lo + ((hi & 0xFF) << 8)                   # 16-bit columns
        spill = hi >> 8                               # belongs one col up
        accw = jnp.pad(w, ((0, 0), (0, 1), (0, 0))) + jnp.pad(
            spill, ((0, 0), (1, 0), (0, 0))
        )                                             # (t, W, T) < 2^25
        # carry-normalize BEFORE the REDC matmuls: _redc byte-splits its
        # input into 3 byte planes, which needs limbs < 2^24 (third plane
        # < 2^8); the summed MDS columns exceed that.
        accw, _ = self._ks_carry(accw)                # limbs < 2^16, over=0
        # the summed input is < t*p^2, so the post-REDC value is < ~6p:
        # chained subtractions (computed in __init__) restore < p
        return self._redc(accw, fc, subs=self._mds_subs)

    def _sbox(self, x, fc):
        x2 = self._mont_mul(x, x, fc)
        x4 = self._mont_mul(x2, x2, fc)
        return self._mont_mul(x4, x, fc)

    # ------------------------------------------------------------- kernel
    def _perm_fn(self, T: int, Bp: int, convert_in: bool = False):
        key = ("perm", T, Bp, convert_in)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        t, L = self.params.t, self.L
        nb = 2 * L
        r_f, r_p = self.params.r_f, self.params.r_p
        half = r_f // 2
        rounds = r_f + r_p
        ngroups = len(self._groups)

        def kernel(*args):
            fc = self.read_consts(args)
            rc_ref, r2_ref = args[4], args[5]
            refs = args[6:]
            bms = [
                (refs[2 * g][:], refs[2 * g + 1][:]) for g in range(ngroups)
            ]
            x_ref, o_ref = refs[2 * ngroups], refs[2 * ngroups + 1]
            state = x_ref[:].astype(jnp.uint32)       # (t, L, T)
            if convert_in:
                # canonical limbs in: one extra wave converts the whole
                # state to Montgomery form (x * R^2 * R^-1 = xR)
                state = self._mont_mul(state, r2_ref[:], fc)

            # Round constants are loaded per round FROM THE REF with the
            # traced round index: `rc_ref[:][r]` is a dynamic_slice on a
            # VALUE, which Mosaic cannot lower (interpret mode tolerates
            # it — caught on hardware by tests/test_tpu_fused.py); a
            # dynamic leading-axis read of a VMEM ref lowers fine.
            def full_round(r, s):
                s = self._add_f(s, rc_ref[r])
                s = self._sbox(s, fc)
                return self._mds_mxu(s, bms, fc)

            def partial_round(r, s):
                s = self._add_f(s, rc_ref[r])
                s0 = self._sbox(s[:1], fc)
                s = jnp.concatenate([s0, s[1:]], axis=0)
                return self._mds_mxu(s, bms, fc)

            state = jax.lax.fori_loop(0, half, full_round, state)
            state = jax.lax.fori_loop(half, half + r_p, partial_round, state)
            state = jax.lax.fori_loop(half + r_p, rounds, full_round, state)
            o_ref[:] = state

        bm_specs = self.const_specs(
            [a for pair in self._bm_i8 for a in pair]
        )
        call = pl.pallas_call(
            kernel,
            grid=(Bp // T,),
            in_specs=self.field_const_specs() + [
                pl.BlockSpec((rounds, t, L, 1), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ] + bm_specs + [
                pl.BlockSpec((t, L, T), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((t, L, T), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t, L, Bp), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=self.interpret,
        )
        fn = jax.jit(call)
        self._jit_cache[key] = fn
        return fn

    def permute_lm(self, state, convert_in: bool = False):
        """Fused permutation of (t, L, B) uint32 states.

        Montgomery-form in/out; with convert_in=True the input is
        CANONICAL and converted in-kernel (one extra mul wave)."""
        t, L, B = state.shape
        # bigger lane tiles amortize per-tile MXU<->VPU transition stalls
        # (measured 2.2x on the standalone mul going 512 -> 1024)
        T = 1024 if B >= 1024 else (512 if B >= 512 else 128)
        npad = -B % T
        if npad:
            state = jnp.pad(state, ((0, 0), (0, 0), (0, npad)))
        rc = jnp.asarray(self._rc_host)
        r2 = jnp.asarray(self._r2_host)
        bms = [
            jnp.asarray(a) for pair in self._bm_i8 for a in pair
        ]
        out = self._perm_fn(T, B + npad, convert_in)(
            *self.field_const_inputs(), rc, r2, *bms, state)
        return out[..., :B] if npad else out

    def permute_pm(self, state):
        """Points-major adapter: (..., t, L) -> same, via the fused kernel."""
        t, L = self.params.t, self.L
        batch = state.shape[:-2]
        flat = state.reshape(-1, t, L)
        lm = jnp.moveaxis(flat, 0, -1)                # (t, L, B)
        out = self.permute_lm(lm.astype(jnp.uint32))
        return jnp.moveaxis(out, -1, 0).reshape(*batch, t, L)
