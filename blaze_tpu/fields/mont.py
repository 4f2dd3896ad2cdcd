"""Vectorized Montgomery arithmetic on 16-bit limbs in uint32 lanes.

All ops act on `uint32[..., L]` arrays (little-endian limbs, each < 2^16,
value < p, Montgomery form) and are elementwise over every leading batch
dimension — they trace to pure VPU code under `jax.jit` on TPU and run
unchanged on CPU.  This is the TPU-native replacement for the FPGA field
cores the reference drives blindly (its point/scalar byte widths:
`/root/reference/src/ingo_msm/msm_cfg.rs:44-92`).

Design notes (correctness invariants):
  * full 16x16 limb products are exact in uint32;
  * lazy-carry column accumulation: each column of the double-width product
    receives <= 2L terms, each < 2^16, plus reduction terms — bounded by
    4L * 2^16 < 2^23 for L <= 24, no uint32 overflow;
  * Montgomery reduction is interleaved per-limb with an explicit running
    carry, so `m = t_i * n0inv mod 2^16` sees the fully-normalized limb;
  * the result before final conditional subtraction is < 2p (requires
    R > 4p, true for every supported field), so one branchless
    select-subtract restores the canonical `< p` range.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .spec import FieldSpec, LIMB_BITS, LIMB_MASK, int_to_limbs, limbs_to_int

_U32 = jnp.uint32


class Field:
    """Batched field ops bound to one FieldSpec. Stateless; jit-friendly.

    Methods are designed to be called inside larger jitted programs.  For
    standalone use (tests, host-side glue) use `jit_op('mul')` etc. — cached
    jitted wrappers, one compile per (op, shape) per process, persisted in
    the XLA compilation cache across processes.
    """

    _JIT_CACHE: dict = {}

    def jit_op(self, name: str):
        key = (self.spec.name, name)
        fn = Field._JIT_CACHE.get(key)
        if fn is None:
            fn = jax.jit(getattr(self, name))
            Field._JIT_CACHE[key] = fn
        return fn

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.nlimbs = spec.nlimbs
        self._p = np.asarray(spec.p_limbs, dtype=np.uint32)
        self._r2 = np.asarray(spec.r2_limbs, dtype=np.uint32)
        self._one = np.asarray(spec.one_mont_limbs, dtype=np.uint32)
        self._n0inv = int(spec.n0inv)
        # REDC bound: with canonical inputs (< p), t = (ab + mp)/R < 2p
        # already when R > p; we always conditionally subtract back to < p.
        assert spec.r > spec.p, "Montgomery radix must exceed the modulus"

    # ------------------------------------------------------------------ util
    def zeros(self, batch_shape=()):
        return jnp.zeros((*batch_shape, self.nlimbs), dtype=_U32)

    def one(self, batch_shape=()):
        return jnp.broadcast_to(
            jnp.asarray(self._one), (*batch_shape, self.nlimbs)
        ).astype(_U32)

    def is_zero(self, a):
        """Boolean (...,) — true where the element is 0 (any domain)."""
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    @staticmethod
    def select(cond, a, b):
        """where(cond, a, b) with cond shaped (...,) broadcast over limbs."""
        return jnp.where(cond[..., None], a, b)

    # ------------------------------------------------------ carry primitives
    def _normalize(self, cols, carry_in=None):
        """Propagate carries over `cols` (values < 2^31). Returns (limbs, top).

        limbs are < 2^16; `top` is whatever carries out of the last limb.
        Sequential over L limbs, vectorized over batch.
        """
        outs = []
        carry = carry_in if carry_in is not None else jnp.zeros(
            cols.shape[:-1], dtype=_U32
        )
        for j in range(cols.shape[-1]):
            v = cols[..., j] + carry
            outs.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return jnp.stack(outs, axis=-1), carry

    def _sub_limbs(self, x, y):
        """(x - y) mod 2^(16L) with borrow chain. Returns (limbs, borrow)."""
        outs = []
        borrow = jnp.zeros(x.shape[:-1], dtype=_U32)
        for j in range(self.nlimbs):
            v = x[..., j] + jnp.uint32(1 << LIMB_BITS) - y[..., j] - borrow
            outs.append(v & LIMB_MASK)
            borrow = jnp.uint32(1) - (v >> LIMB_BITS)
        return jnp.stack(outs, axis=-1), borrow

    def _cond_sub_p(self, limbs, extra_top):
        """Reduce a value `extra_top * 2^(16L) + limbs` < 2p into [0, p)."""
        p = jnp.asarray(self._p)
        sub, borrow = self._sub_limbs(limbs, jnp.broadcast_to(p, limbs.shape))
        ge = (extra_top > 0) | (borrow == 0)
        return self.select(ge, sub, limbs)

    # -------------------------------------------------------------- add/sub
    def add(self, a, b):
        limbs, top = self._normalize(a + b)
        return self._cond_sub_p(limbs, top)

    def sub(self, a, b):
        d, borrow = self._sub_limbs(a, b)
        # if borrowed, add p back (cannot re-borrow since p - (b - a) > 0)
        fixed, _ = self._normalize(d + jnp.asarray(self._p))
        return self.select(borrow > 0, fixed, d)

    def neg(self, a):
        p = jnp.broadcast_to(jnp.asarray(self._p), a.shape)
        d, _ = self._sub_limbs(p, a)
        return self.select(self.is_zero(a), a, d)

    def double(self, a):
        return self.add(a, a)

    # ------------------------------------------------------------------ mul
    @staticmethod
    def _shift_cols(v, off: int, width: int):
        """Place row `v` (..., K) at column offset `off` in a width-`width`
        lazy-carry accumulator: zero-pad on both sides (clipping on the
        right).  Static pads keep the XLA graph free of dynamic-update-slice
        chains and narrow/wide interleavings, which explode compile time."""
        k = v.shape[-1]
        if off + k > width:
            v = v[..., : width - off]
            k = width - off
        pad = [(0, 0)] * (v.ndim - 1) + [(off, width - off - k)]
        return jnp.pad(v, pad)

    def _conv_cols(self, a, b, width: int):
        """Lazy-carry column sums of the integer product a*b.

        a, b: uint32[..., La/Lb] with normalized (< 2^16) limbs.  Returns
        uint32[..., width] where column k holds sum_{i+j=k} a_i * b_j split
        into 16-bit lo/hi contributions — each column < 2*min(La,Lb) * 2^16,
        far below uint32 overflow for L <= 24.
        """
        acc = jnp.zeros((*jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]), width), dtype=_U32)
        lb = b.shape[-1]
        for i in range(min(lb, width)):
            prod = a * b[..., i : i + 1]
            acc = acc + self._shift_cols(prod & LIMB_MASK, i, width)
            if i + 1 < width:
                acc = acc + self._shift_cols(prod >> LIMB_BITS, i + 1, width)
        return acc

    def mul(self, a, b):
        """Montgomery product a*b*R^-1 mod p. a, b: uint32[..., L].

        On TPU this dispatches to the fused Pallas kernel (fields/mxu.py):
        VMEM-resident convolution + MXU REDC, ~20x the portable path.

        Portable path: full-width REDC: T = a*b; m = (T mod R) * N' mod R
        with N' = -p^-1 mod R; result = (T + m*p) / R < 2p, then one
        conditional subtraction.  Three independent convolution phases +
        three short carry chains — a structure XLA fuses well on both CPU
        and TPU (the classic limb-serial CIOS interleaving of narrow
        carries with wide updates compiles catastrophically slowly).
        """
        from .mxu import mont_mul_mxu, mxu_available

        if mxu_available():
            out = mont_mul_mxu(self.spec, a, b)
            if out is not None:
                return out
        return self._mul_portable(a, b)

    def _mul_portable(self, a, b):
        """XLA-only REDC path (CPU tests, non-TPU backends)."""
        L = self.nlimbs
        W = 2 * L + 1
        p = jnp.asarray(self._p)
        nprime = jnp.asarray(np.asarray(self.spec.nprime_limbs, dtype=np.uint32))

        t = self._conv_cols(a, b, W)                     # columns of a*b
        t_lo, c_lo = self._normalize(t[..., :L])         # T mod R, carry into col L
        m_cols = self._conv_cols(t_lo, nprime, L)        # low half of T_lo * N'
        m, _ = self._normalize(m_cols)                   # m = ... mod R
        q = self._conv_cols(m, p, W)                     # columns of m*p

        # U = T + m*p; U mod R == 0, so only the carry out of the low half
        # survives.  c1 = (T_lo + (m*p)_lo) / R.
        _, c1 = self._normalize(t_lo + q[..., :L])
        hi = t[..., L : 2 * L] + q[..., L : 2 * L]
        limbs, top = self._normalize(hi, carry_in=c1 + c_lo)
        top = top + t[..., 2 * L] + q[..., 2 * L]
        return self._cond_sub_p(limbs, top)

    def square(self, a):
        return self.mul(a, a)

    # --------------------------------------------------------- domain moves
    def to_mont(self, a):
        return self.mul(a, jnp.asarray(self._r2))

    def from_mont(self, a):
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mul(a, one)

    # ------------------------------------------------------------------ pow
    def pow(self, a, e: int):
        """a^e for a fixed python-int exponent. Runs a fori_loop over bits."""
        nbits = max(e.bit_length(), 1)
        ebits = jnp.asarray(
            [(e >> i) & 1 for i in range(nbits)], dtype=jnp.uint32
        )

        def body(i, acc):
            bit = ebits[nbits - 1 - i]
            acc = self.square(acc)
            withmul = self.mul(acc, a)
            return self.select(
                jnp.broadcast_to(bit, acc.shape[:-1]) == 1, withmul, acc
            )

        init = self.one(a.shape[:-1])
        return jax.lax.fori_loop(0, nbits, body, init)

    def inv(self, a):
        """Batched inverse via Fermat: a^(p-2). inv(0) = 0."""
        return self.pow(a, self.spec.p - 2)

    # ------------------------------------------------------------ power sets
    def powers(self, base_mont, n: int):
        """[b^0, b^1, ..., b^(n-1)] as (n, L) Montgomery limbs.

        Log-doubling: log2(n) batched muls (device-side) — the twiddle
        generator for NTT plans (the reference precomputes nothing: its
        twiddles live inside the opaque FPGA kernel).
        """
        out = self.one((1,))
        if n <= 1:
            return out[:n]
        mulj = self.jit_op("mul")
        cur = jnp.asarray(base_mont)[None]          # b^(2^k) walker
        while out.shape[0] < n:
            k = out.shape[0]
            take = min(k, n - k)
            nxt = mulj(out[:take], cur)             # b^k .. b^(k+take-1)
            out = jnp.concatenate([out, nxt], axis=0)
            if out.shape[0] < n:
                cur = mulj(cur, cur)
        return out

    def power_matrix(self, bases_mont, m: int):
        """(n, L) bases -> (n, m, L) matrix M[i, j] = bases[i]^j.

        Log-doubling along j with the whole base column batched: log2(m)
        muls, n*m total field-mul work, all on device.
        """
        n = bases_mont.shape[0]
        out = self.one((n, 1))
        if m <= 1:
            return out[:, :m]
        mulj = self.jit_op("mul")
        cur = bases_mont[:, None, :]                # bases^(2^k) walker
        while out.shape[1] < m:
            k = out.shape[1]
            take = min(k, m - k)
            nxt = mulj(out[:, :take], cur)
            out = jnp.concatenate([out, nxt], axis=1)
            if out.shape[1] < m:
                cur = mulj(cur, cur)
        return out

    # ------------------------------------------------------- host transfers
    def from_int(self, x, batch_shape=(), mont=True):
        """Python int(s) -> device limbs (Montgomery by default)."""
        if isinstance(x, int):
            arr = np.broadcast_to(
                int_to_limbs(x % self.spec.p, self.nlimbs),
                (*batch_shape, self.nlimbs),
            )
        else:
            xs = list(x)
            arr = np.stack(
                [int_to_limbs(v % self.spec.p, self.nlimbs) for v in xs]
            )
        out = jnp.asarray(arr, dtype=_U32)
        return self.jit_op("to_mont")(out) if mont else out

    def to_int(self, a, mont=True):
        """Device limbs -> python int or nested list of ints."""
        if mont:
            a = self.jit_op("from_mont")(a)
        arr = np.asarray(jax.device_get(a), dtype=np.uint64)
        flat = arr.reshape(-1, self.nlimbs)
        vals = [limbs_to_int(row) for row in flat]
        if arr.ndim == 1:
            return vals[0]
        out = np.empty(arr.shape[:-1], dtype=object)
        out.reshape(-1)[:] = vals
        return out.tolist() if out.ndim else vals[0]

    # ------------------------------------------------------- compact storage
    @staticmethod
    def compress(a):
        """uint32 limbs -> uint16 storage (halves HBM footprint)."""
        return a.astype(jnp.uint16)

    @staticmethod
    def decompress(a):
        return a.astype(_U32)
