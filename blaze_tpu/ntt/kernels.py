"""Fused Pallas NTT kernels: whole sub-transforms in VMEM.

The XLA-path NTT (transform.py) issues one Montgomery-mul kernel per
butterfly stage with HBM round-trips between stages.  Here an ENTIRE
radix-2 DIT transform of K <= 2^9 points runs inside one pallas_call:
the working set lives in VMEM across all log2(K) stages, batched over
independent transforms on the 128-lane minor axis.  Large transforms are
composed from these base kernels by the Cooley-Tukey recursion in
fused.py (the TPU analog of the reference's fixed 2^27 16-bank FPGA
kernel, `/root/reference/src/ingo_ntt/ntt_data.rs:65-78` — whose compute
is an opaque bitstream; here the butterflies are implemented for real).

Layout: a batch of B independent K-point transforms is a (K, L, B)
array — transform positions on the leading (outer) axis, 16-bit limbs on
sublanes, batch on lanes.  For the scalar fields L = 16, so a u16 tile is
exactly one native (16, 128) Mosaic tile: zero padding waste.

Field arithmetic is PallasFieldOps with the canonical < p invariant
(lazy=False: the 255-bit scalar fields have R < 4p, so the lazy < 2p
discipline of the EC kernels is unsound here).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.kernel_ops import PallasFieldOps
from ..fields.spec import FieldSpec

__all__ = ["NTTKernels"]


def _lane_pad(n: int, t: int = 128) -> int:
    return -n % t


class NTTKernels(PallasFieldOps):
    """Per-FieldSpec fused NTT kernels.  Cached per (spec, interpret)."""

    _CACHE: dict = {}

    @classmethod
    def for_spec(cls, spec: FieldSpec, interpret: bool = False) -> "NTTKernels":
        key = (spec.name, interpret)
        inst = cls._CACHE.get(key)
        if inst is None:
            inst = cls(spec, interpret)
            cls._CACHE[key] = inst
        return inst

    def __init__(self, spec: FieldSpec, interpret: bool = False):
        super().__init__(spec, lazy=False)
        self.interpret = interpret
        self._jit_cache: dict = {}

    def _consts(self):
        return self.field_const_inputs()

    # ------------------------------------------------------------- base NTT
    def _ntt_fn(self, K: int, Bp: int, T: int, in_dtype):
        key = ("ntt", K, Bp, T, str(in_dtype))
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        L = self.L
        logK = K.bit_length() - 1
        assert 1 << logK == K

        def kernel(*args):
            tw_ref, x_ref, o_ref = args[4:]
            fc = self.read_consts(args)
            x = x_ref[:].astype(jnp.uint32)            # (K, L, T)
            # twiddles arrive lane-EXPANDED (K, L, T): Mosaic cannot lower
            # a lane+sublane broadcast of a (m, L, 1) slice, so the lanes
            # are made concrete in HBM (2 MiB u16 at K=512)
            tw = tw_ref[:].astype(jnp.uint32)
            for s in range(logK):
                m = 1 << s
                g2 = K >> (s + 1)
                xr = x.reshape(g2, 2, m * L, T)
                a = xr[:, 0].reshape(g2 * m, L, T)
                b = xr[:, 1].reshape(g2 * m, L, T)
                if s == 0:
                    wb = b          # stage-0 twiddle is W^0 = 1
                else:
                    w = jnp.broadcast_to(
                        tw[m - 1 : 2 * m - 1][None], (g2, m, L, T)
                    ).reshape(g2 * m, L, T)
                    wb = self._mont_mul(w, b, fc)
                lo = self._add_f(a, wb)
                hi = self._sub_f(a, wb)
                x = jnp.stack(
                    [lo.reshape(g2, m * L, T), hi.reshape(g2, m * L, T)],
                    axis=1,
                ).reshape(K, L, T)
            o_ref[:] = x.astype(jnp.uint16)

        call = pl.pallas_call(
            kernel,
            grid=(Bp // T,),
            in_specs=self.field_const_specs() + [
                pl.BlockSpec((K, L, T), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, L, T), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K, L, T), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, L, Bp), jnp.uint16),
            # the unrolled stages' REDC relayouts need more scoped VMEM
            # than the conservative 16M default (v5e has 128M physical)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=self.interpret,
        )
        fn = jax.jit(call)
        self._jit_cache[key] = fn
        return fn

    def ntt_base(self, x, twid_pack):
        """One fused K-point DIT NTT per lane.

        x: (K, L, B) uint16/uint32 Montgomery limbs in BIT-REVERSED order
        (caller permutes; an XLA axis-0 gather fuses with the surrounding
        transposes).  twid_pack: (K, L, T) uint16 stage-packed twiddles,
        lane-expanded to the kernel tile — entry m-1+t (m = 2^s) is
        W_K^(t << (logK-1-s)).  Returns (K, L, B) uint16, natural order,
        canonical (< p) limbs.
        """
        K, L, B = x.shape
        assert L == self.L
        T = twid_pack.shape[-1]
        npad = _lane_pad(B, T)
        if npad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, npad)))
        out = self._ntt_fn(K, B + npad, T, x.dtype)(
            *self._consts(), twid_pack, x)
        return out[..., :B] if npad else out

    # --------------------------------------------------- elementwise muls
    def _mul_fn(self, M: int, Np: int, BA: int, BN: int, nin: int, dtypes):
        key = ("mul", M, Np, BA, BN, nin, dtypes)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        L = self.L

        def kernel(*args):
            refs = args[4:]
            fc = self.read_consts(args)
            o_ref = refs[-1]
            xs = [r[:].astype(jnp.uint32) for r in refs[:-1]]
            acc = self._mont_mul(xs[0], xs[1], fc)
            for extra in xs[2:]:
                acc = self._mont_mul(acc, extra, fc)
            o_ref[:] = acc.astype(jnp.uint16)

        blk = pl.BlockSpec((BA, L, BN), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel,
            grid=(M // BA, Np // BN),
            in_specs=self.field_const_specs() + [blk] * nin,
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((M, L, Np), jnp.uint16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=self.interpret,
        )
        fn = jax.jit(call)
        self._jit_cache[key] = fn
        return fn

    # ------------------------------------------- split-table twiddle mul
    def _twmul_fn(self, A, J, S, B, BA, dtypes):
        key = ("twmul", A, J, S, B, BA, dtypes)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        L = self.L

        # The tables ride FULL-LANE blocks — (BA, L, J) / (BA, L, S),
        # block index constant along the fast grid axes so the pipeline
        # fetches each row-block ONCE per i (Mosaic skips re-copies when
        # the block index is unchanged).  A (BA, L, 1) per-cell column
        # block is NOT lowerable on real TPU (the last block dim must be
        # a lane multiple or equal to the array's — the interpret-mode
        # tests could not catch this); the needed column is selected
        # in-kernel by an iota+where reduction (exact: limbs < 2^16 in
        # int32), which is noise next to the cell's Montgomery muls.
        def _col(tab, idx):
            lane = jax.lax.broadcasted_iota(jnp.int32, tab.shape, 2)
            return jnp.sum(
                jnp.where(lane == idx, tab.astype(jnp.int32), jnp.int32(0)),
                axis=2, keepdims=True,
            ).astype(jnp.uint32)

        if B == 1:
            # grid (A/BA, J); cell (BA, L, S): tw1 a column picked by j,
            # tw2 the S-lane block aligned with the cell lanes
            grid = (A // BA, J)
            y_spec = pl.BlockSpec((BA, L, S), lambda i, j: (i, 0, j),
                                  memory_space=pltpu.VMEM)
            t1_spec = pl.BlockSpec((BA, L, J), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
            t2_spec = pl.BlockSpec((BA, L, S), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM)

            def kernel(*args):
                fc = self.read_consts(args)
                y_ref, t1_ref, t2_ref, o_ref = args[4:]
                y = y_ref[:].astype(jnp.uint32)
                t1 = _col(t1_ref[:], pl.program_id(1))
                t2 = t2_ref[:].astype(jnp.uint32)
                acc = self._mont_mul(t1, y, fc)
                acc = self._mont_mul(acc, t2, fc)
                o_ref[:] = acc.astype(jnp.uint16)
        else:
            # grid (A/BA, J, S); cell (BA, L, B): both twiddles are
            # columns picked by (jo, s), broadcast over the B batch lanes
            grid = (A // BA, J, S)
            y_spec = pl.BlockSpec(
                (BA, L, B), lambda i, jo, s: (i, 0, jo * S + s),
                memory_space=pltpu.VMEM)
            t1_spec = pl.BlockSpec((BA, L, J), lambda i, jo, s: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
            t2_spec = pl.BlockSpec((BA, L, S), lambda i, jo, s: (i, 0, 0),
                                   memory_space=pltpu.VMEM)

            def kernel(*args):
                fc = self.read_consts(args)
                y_ref, t1_ref, t2_ref, o_ref = args[4:]
                y = y_ref[:].astype(jnp.uint32)
                t1 = _col(t1_ref[:], pl.program_id(1))
                t2 = _col(t2_ref[:], pl.program_id(2))
                acc = self._mont_mul(t1, y, fc)
                acc = self._mont_mul(t2, acc, fc)
                o_ref[:] = acc.astype(jnp.uint16)

        call = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=self.field_const_specs() + [y_spec, t1_spec, t2_spec],
            out_specs=y_spec,
            out_shape=jax.ShapeDtypeStruct((A, L, J * S * B), jnp.uint16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=self.interpret,
        )
        fn = jax.jit(call)
        self._jit_cache[key] = fn
        return fn

    def twiddle_mul(self, y, t1, t2, B: int):
        """Inter-level twiddle application WITHOUT per-lane gathers.

        y: (A, L, J*S*B) u16/u32, lane = (jo*S + jl)*B + b; the twiddle
        of entry (v, j) factors as T1[v, jo] * T2[v, jl] (fused.py split
        tables, precomputed per depth as SMALL (A, L, J) / (A, L, S)
        arrays).  The kernel reads both factors by pure block indexing —
        replacing the former ~2-passes-of-the-buffer gather traffic that
        dominated 2^26/2^27 (the within-card bank-shuffle analog,
        ntt_data.rs:80-156).
        """
        A, L, lanes = y.shape
        J, S = t1.shape[-1], t2.shape[-1]
        assert lanes == J * S * B, (y.shape, J, S, B)
        BA = A if A <= 32 else 32
        while A % BA:
            BA -= 1
        dts = (str(y.dtype), str(t1.dtype), str(t2.dtype))
        return self._twmul_fn(A, J, S, B, BA, dts)(
            *self._consts(), y, t1, t2
        )

    def mul_lm(self, x, y, z=None):
        """Elementwise Montgomery product of lanes-major batches.

        x, y (and optional z): (M, L, N) uint16/uint32, same shape.
        Returns (M, L, N) uint16 canonical.  The 3-operand form computes
        x*y*z with both products in one kernel (one HBM round-trip) —
        used by the four-step twiddle application (fused.py).
        """
        M, L, N = x.shape
        assert L == self.L
        ops = [x, y] + ([z] if z is not None else [])
        BA = M if M < 8 else 8          # M is a power of two in practice
        while M % BA:
            BA -= 1
        BN = min(2048, max(128, (1 << 19) // (BA * L) // 128 * 128))
        npad = _lane_pad(N, BN)
        if npad:
            ops = [jnp.pad(o, ((0, 0), (0, 0), (0, npad))) for o in ops]
        dts = tuple(str(o.dtype) for o in ops)
        out = self._mul_fn(M, N + npad, BA, BN, len(ops), dts)(
            *self._consts(), *ops)
        return out[..., :N] if npad else out
