"""Composed fused NTT: Cooley-Tukey recursion over the VMEM base kernels.

A size-2^logn transform is decomposed into balanced factors of at most
2^KLOG (each a single fused pallas_call over the whole sub-transform,
ntt/kernels.py); between factors sit an inter-level twiddle multiply and
lane/row transposes — the TPU analog of the reference's 16-bank HBM
scatter/gather shuffle (`/root/reference/src/ingo_ntt/ntt_data.rs:80-156`,
done on the host CPU there; here they are on-device XLA transposes, and
become all_to_all collectives in the sharded path, dist/ntt_dist.py).

The inter-level twiddle W^(j*v) of a K = A*C split is K entries — 4 GiB
of limbs at 2^27, which must never be materialized.  It is applied in
lane slabs from two SPLIT TABLES: with j = jh*S + jl (S ~ sqrt(C)),

    W^(j*v) = T1[jh*v] * T2[jl*v],   T1[m] = W^(S*m),  T2[m] = W^m,

each table ~A*sqrt(C) entries (8 MiB at 2^27).  Per slab: two lane-axis
gathers + ONE fused triple-product kernel (y * T1 * T2, kernels.mul_lm),
so twiddle traffic stays ~3 passes over the slab.

Everything is u16 end to end (limbs < 2^16 by representation): a 2^27
buffer is 4 GiB — the reference's exact buffer budget (ntt_data.rs:42).

Working layout: (K, L, B) — transform index on the leading axis, limbs on
sublanes, B independent transforms on lanes.  A points-major (n, L) input
is the B = 1 case via one trailing-axis expand (zero-cost).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.mont import Field
from ..fields.spec import FieldSpec, int_to_limbs
from .kernels import NTTKernels
from .transform import _bitrev_perm

__all__ = ["FusedNTT", "split_parts"]

KLOG = 9          # max log2 base-kernel size (VMEM-bound)
SLAB_LANES = 1 << 14


def split_parts(logn: int, klog: int = KLOG) -> list[int]:
    """Balanced decomposition of logn into parts each <= klog."""
    if logn <= klog:
        return [max(logn, 0)]
    nparts = -(-logn // klog)
    base, rem = divmod(logn, nparts)
    return [base + 1] * rem + [base] * (nparts - rem)


class FusedNTT:
    """Fused-kernel NTT plan for one (field, logn).  API parity with
    NTTPlan: `.ntt` / `.intt` jitted callables over (n, L) uint32
    Montgomery-form limbs, natural order in and out."""

    def __init__(self, spec: FieldSpec, logn: int, klog: int = KLOG,
                 slab_lanes: int = SLAB_LANES, interpret: bool = False,
                 block: int = 128, ktile: int | None = None):
        if logn > spec.two_adicity:
            raise ValueError(
                f"{spec.name}: 2-adicity {spec.two_adicity} < logn {logn}"
            )
        self.spec = spec
        self.field = Field(spec)
        self.logn = logn
        self.n = 1 << logn
        self.parts = split_parts(logn, klog)
        self.block = block          # blocked-layout lane count (see below)
        self._slab = slab_lanes
        # Base-kernel lane tile: bigger tiles amortize the per-tile
        # MXU<->VPU transition stalls (measured on the standalone mul:
        # 419 -> 505 -> 1116 M muls/s at T = 256 / 512 / 1024); VMEM for
        # the (K, L, T) working set bounds it above.
        import os as _os

        want = ktile or int(_os.environ.get("BLZ_NTT_KTILE", "512"))
        # never exceed the plan's smallest lane extent (depth-0 columns)
        cmin = 1 << max(logn - self.parts[0], 0)
        self.ktile = max(128, min(want, cmin))
        self.kern = NTTKernels.for_spec(spec, interpret)

        p, L = spec.p, spec.nlimbs
        f = self.field
        ninv = pow(self.n, -1, p)
        self._ninv_mont = jnp.asarray(
            int_to_limbs((ninv * spec.r) % p, L), dtype=jnp.uint32
        )

        def mont(v):
            return jnp.asarray(int_to_limbs((v * spec.r) % p, L))

        # ---- base-kernel twiddle packs, one per distinct part size.
        # pack[m-1+t] (m = 2^s) = W_A^(t << (a-1-s)): the stage-s slice is
        # the contiguous rows [m-1, 2m-1).
        self._packs = {}
        self._bitrev = {}
        for a in sorted(set(self.parts)):
            self._bitrev[a] = jnp.asarray(_bitrev_perm(a))
            if a == 0:
                continue
            A = 1 << a
            # Per-part lane tile: the base kernel's scoped VMEM scales
            # with K * T (measured on chip: K = 512, T = 512 needs 101 MB
            # — just past the 100 MB scoped limit), so cap the product at
            # 2^17 (K = 512 -> T = 256 ~ 51 MB).
            Ta = max(128, min(self.ktile, (1 << 17) // A))
            idx = np.zeros(A, dtype=np.int64)
            for s in range(a):
                m = 1 << s
                idx[m - 1 : 2 * m - 1] = np.arange(m) << (a - 1 - s)
            for inv in (False, True):
                wa = spec.root_of_unity(a)
                if inv:
                    wa = pow(wa, -1, p)
                pows = f.powers(mont(wa), max(A // 2, 1))      # (A/2, L)
                pack = jnp.take(pows, jnp.asarray(idx % max(A // 2, 1)),
                                axis=0)[:, :, None]
                # lane-expanded u16 (kernels.py needs concrete lanes)
                self._packs[(a, inv)] = (
                    jnp.broadcast_to(pack, (A, L, Ta))
                    .astype(jnp.uint16) + jnp.uint16(0)
                )

        # ---- inter-level split twiddle tables, one pair per node depth.
        # Depth d splits K_d = prod(parts[d:]) as A_d * C_d.  n^-1 is
        # folded into the depth-0 inverse T1 (every element passes the
        # depth-0 twiddle exactly once).
        #
        # Tables are PRE-EXPANDED to (A, L, J) / (A, L, S) with
        # J * S = C: entry (v, j = jo*S + jl)'s twiddle W^(j*v) is
        # tab1[v, :, jo] * tab2[v, :, jl], so the hot-path kernel
        # (kernels.twiddle_mul) reads both factors by pure BLOCK indexing
        # — the former per-lane index gathers moved ~2 buffer-sizes of
        # amplified traffic per level and dominated 2^26/2^27.  The
        # tables stay small (8 MiB each at 2^27 depth 0); the one-time
        # expansion gather here is off the hot path.
        self._tabs = {}
        for d in range(len(self.parts) - 1):
            logK = sum(self.parts[d:])
            a = self.parts[d]
            logC = logK - a
            logS = (logC + 1) // 2
            A, C, S = 1 << a, 1 << logC, 1 << logS
            J = C >> logS
            n1 = (J - 1) * (A - 1) + 1
            n2 = (S - 1) * (A - 1) + 1
            vgrid = np.arange(A, dtype=np.int64)[:, None]
            idx1 = jnp.asarray(vgrid * np.arange(J, dtype=np.int64)[None])
            idx2 = jnp.asarray(vgrid * np.arange(S, dtype=np.int64)[None])
            for inv in (False, True):
                w = spec.root_of_unity(logK)
                if inv:
                    w = pow(w, -1, p)
                t1 = f.powers(mont(pow(w, S, p)), n1)          # (n1, L)
                t2 = f.powers(mont(w), n2)
                if inv and d == 0:
                    t1 = f.mul(t1, self._ninv_mont)
                tab1 = jnp.take(t1, idx1, axis=0)              # (A, J, L)
                tab2 = jnp.take(t2, idx2, axis=0)
                self._tabs[(d, inv)] = (
                    jnp.moveaxis(tab1, -1, 1).astype(jnp.uint16),  # (A,L,J)
                    jnp.moveaxis(tab2, -1, 1).astype(jnp.uint16),
                )

    # ------------------------------------------------------------ twiddle
    # Cells narrower than one 128-lane tile fall back to the gathered
    # mul_lm path (only small plans hit it); tests may lower this to
    # force the kernel path under the interpreter.
    _TWMUL_MIN_LANES = 128

    def _apply_twiddle(self, y, depth: int, B: int, inverse: bool):
        """y: (A, L, C*B) u16, lane = j*B + b.  Multiply entry (v, j) by
        W^(j*v) = tab1[v, j//S] * tab2[v, j%S]."""
        tab1, tab2 = self._tabs[(depth, inverse)]
        A, L, lanes = y.shape
        J, S = tab1.shape[-1], tab2.shape[-1]
        cell = S if B == 1 else B
        if cell >= self._TWMUL_MIN_LANES:
            return self.kern.twiddle_mul(y, tab1, tab2, B)
        # small-plan fallback: expand the twiddles lane-wise and use the
        # generic triple-product kernel
        lane = jax.lax.broadcasted_iota(jnp.int32, (A, L, lanes), 2)
        j = lane // B if B > 1 else lane
        jo, jl = j // S, j % S
        tw1 = jnp.take_along_axis(tab1, jo, axis=2)
        tw2 = jnp.take_along_axis(tab2, jl, axis=2)
        return self.kern.mul_lm(y, tw1, tw2)

    # ---------------------------------------------------------- recursion
    def _base(self, x, a: int, inverse: bool):
        if a == 0:
            return x.astype(jnp.uint16)
        x = jnp.take(x, self._bitrev[a], axis=0)
        return self.kern.ntt_base(x, self._packs[(a, inverse)])

    def _rec(self, x, depth: int, inverse: bool):
        """x: (K, L, B) u16/u32 natural order -> (K, L, B) u16 natural."""
        parts = self.parts[depth:]
        K, L, B = x.shape
        if len(parts) == 1:
            return self._base(x, parts[0], inverse)
        a = parts[0]
        A = 1 << a
        C = K >> a
        # column NTTs of size A, batched over (j, b) lanes
        x = x.reshape(A, C, L, B).swapaxes(1, 2).reshape(A, L, C * B)
        y = self._base(x, a, inverse)
        y = self._apply_twiddle(y, depth, B, inverse)
        # row NTTs of size C, batched over (v, b) lanes
        y = y.reshape(A, L, C, B).transpose(2, 1, 0, 3).reshape(C, L, A * B)
        z = self._rec(y, depth + 1, inverse)
        # output index u*A + v at z[u, :, v*B + b]
        return z.reshape(C, L, A, B).swapaxes(1, 2).reshape(K, L, B)

    # ------------------------------------------------------------- public
    def _fwd(self, x):
        y = self._rec(x.astype(jnp.uint16)[..., None], 0, False)
        return y[..., 0].astype(jnp.uint32)

    def _inv(self, x):
        y = self._rec(x.astype(jnp.uint16)[..., None], 0, True)
        out = y[..., 0].astype(jnp.uint32)
        if len(self.parts) == 1:
            out = self.field.mul(out, self._ninv_mont)
        return out

    @functools.cached_property
    def ntt(self):
        """Forward NTT, jitted: (n, L) uint32 Montgomery -> same."""
        return jax.jit(self._fwd)

    @functools.cached_property
    def intt(self):
        """Inverse NTT, jitted."""
        return jax.jit(self._inv)

    # u16 in/out with input donation: at 2^27 a buffer is 4 GiB (the
    # reference's budget, ntt_data.rs:42) and the u32 public dtype would
    # double it past single-chip HBM.  Limbs are < 2^16 by representation,
    # so u16 is lossless.
    @functools.cached_property
    def ntt16(self):
        return jax.jit(
            lambda x: self._rec(x[..., None], 0, False)[..., 0],
            donate_argnums=0,
        )

    @functools.cached_property
    def intt16(self):
        if len(self.parts) == 1:
            raise NotImplementedError(
                "u16 inverse needs the folded n^-1 (multi-level plans)"
            )
        return jax.jit(
            lambda x: self._rec(x[..., None], 0, True)[..., 0],
            donate_argnums=0,
        )

    # ---- lane-blocked boundary layout -----------------------------------
    #
    # A flat (K, L) u16 array has a 16-lane minor axis: the TPU tiles it
    # (8, 128), an 8x HBM expansion — 16 GiB for the 2 GiB 2^26 buffer
    # (measured OOM: "Unpadded (2.00G) Padded (16.00G)").  The BLOCKED
    # layout (K/128, L, 128) — element k at [k//128, :, k%128] — is
    # exactly one native tile per (row, limb) group: zero padding, and the
    # depth-0 column split consumes it with one friendly transpose.  This
    # is the layout NTT buffers should LIVE in at 2^26/2^27 scale (the
    # analog of the reference's bank-strided residency, ntt_data.rs:80-111).

    def _blocked_ok(self) -> bool:
        a = self.parts[0]
        C = self.n >> a
        return (
            len(self.parts) > 1
            and C % self.block == 0
            and (1 << a) % self.block == 0
        )

    def to_blocked(self, x16):
        """Host numpy (K, L) u16 -> (K/block, L, block) blocked (native
        C++ fast path when built — a 4 GiB transpose at 2^27)."""
        from ..native import codec as _native

        return _native.to_blocked(np.asarray(x16, np.uint16), self.block)

    def from_blocked(self, xb):
        """Host numpy (K/block, L, block) -> (K, L) u16."""
        from ..native import codec as _native

        return _native.from_blocked(np.asarray(xb), self.block)

    def _run_blocked(self, xb, inverse: bool):
        """(K/block, L, block) u16 natural order -> same, transformed."""
        if not self._blocked_ok():
            raise ValueError(
                f"blocked layout needs multi-level parts with A, C "
                f">= {self.block} (logn={self.logn}, parts={self.parts})"
            )
        T = self.block
        L = self.spec.nlimbs
        a = self.parts[0]
        A = 1 << a
        C = self.n >> a
        # element k = r*T + c = v*C + j (v leading on the depth-0 columns;
        # j = m*T + c): r = v*(C/T) + m — a reshape + one transpose whose
        # in/out minor dims are all >= a full tile.
        x = xb.reshape(A, C // T, L, T)
        x = jnp.moveaxis(x, 1, 2).reshape(A, L, C)
        y = self._base(x, a, inverse)
        y = self._apply_twiddle(y, 0, 1, inverse)
        y = y.reshape(A, L, C, 1).transpose(2, 1, 0, 3).reshape(C, L, A)
        z = self._rec(y, 1, inverse)                       # (C, L, A)
        # output index u*A + v at z[u, :, v]; v = q*T + c ->
        # blocked row r = u*(A/T) + q
        zb = z.reshape(C, L, A // T, T)
        return jnp.moveaxis(zb, 2, 1).reshape(self.n // T, L, T)

    def ntt_blocked_available(self) -> bool:
        return self._blocked_ok()

    @functools.cached_property
    def ntt16b(self):
        """Forward NTT over the blocked u16 layout, input donated."""
        return jax.jit(lambda x: self._run_blocked(x, False), donate_argnums=0)

    @functools.cached_property
    def intt16b(self):
        """Inverse NTT over the blocked u16 layout, input donated."""
        return jax.jit(lambda x: self._run_blocked(x, True), donate_argnums=0)
