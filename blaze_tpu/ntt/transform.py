"""Number-theoretic transform over NTT-friendly scalar fields.

The reference's NTT is a fixed 2^27 FPGA kernel fed through a 16-bank HBM
scatter/gather shuffle done on the host CPU (`/root/reference/src/ingo_ntt/
ntt_data.rs:65-156`).  Here the transform itself is computed on TPU:

  * iterative radix-2 DIT butterflies after a bit-reversal permutation.
    All log2(n) stages run through ONE compiled butterfly instance inside
    a `fori_loop` — pair/twiddle indices are computed in-graph from the
    stage number, so the graph holds a single batched Montgomery multiply
    regardless of n (compile time is flat in n);
  * the full twiddle set (n/2 powers of the root) is generated on device
    at plan-build time with log2(n) batched muls (`Field.powers`) — no
    host bigint loops;
  * a four-step (Bailey) decomposition for sizes whose twiddle/working
    sets exceed a single pass — the transpose between the two passes is
    the TPU analog of the reference's 16-bank shuffle, and becomes an
    all_to_all over the mesh in the distributed path (dist/ntt_dist.py).

Data layout: (..., n, L) uint32 16-bit limbs, Montgomery form, natural
order in and out.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.mont import Field
from ..fields.spec import FieldSpec, int_to_limbs


def _bitrev_perm(logn: int) -> np.ndarray:
    n = 1 << logn
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


class NTTPlan:
    """Precomputed twiddles + permutations for one (field, logn)."""

    def __init__(self, spec: FieldSpec, logn: int):
        if logn > spec.two_adicity:
            raise ValueError(
                f"{spec.name}: 2-adicity {spec.two_adicity} < logn {logn}"
            )
        self.spec = spec
        self.field = Field(spec)
        self.logn = logn
        self.n = 1 << logn
        p, L = spec.p, spec.nlimbs
        w = spec.root_of_unity(logn)
        winv = pow(w, -1, p)
        self.w = w
        self.w_inv = winv

        def root_powers(root):
            mont = jnp.asarray(int_to_limbs((root * spec.r) % p, L))
            return self.field.powers(mont, max(self.n // 2, 1))

        # all twiddles any stage needs are powers of the base root:
        # stage s uses W^(t * n/2^(s+1)), t < 2^s — a strided subset of
        # [W^0 .. W^(n/2-1)], gathered in-graph.
        self.pow_fwd = root_powers(w)          # (n/2, L) device, Montgomery
        self.pow_inv = root_powers(winv)
        self.bitrev = _bitrev_perm(logn)
        ninv = pow(self.n, -1, p)
        self.n_inv_mont = np.asarray(
            int_to_limbs((ninv * spec.r) % p, L), dtype=np.uint32
        )

    # ------------------------------------------------------------- kernels
    def _stages(self, x, pow_all):
        """x: (..., n, L) bit-reversed order in, natural order out.

        One fori_loop over stages; a single butterfly instance with
        in-graph index math (shifts by the traced stage number).
        """
        f = self.field
        n, logn = self.n, self.logn
        if logn == 0:
            return x
        half = n // 2
        j = jnp.arange(half, dtype=jnp.int32)
        ii = jnp.arange(n, dtype=jnp.int32)

        def stage(s, x):
            mask = (jnp.int32(1) << s) - 1
            lo = ((j >> s) << (s + 1)) | (j & mask)   # bit-s=0 position
            hi = lo | (jnp.int32(1) << s)
            tw_idx = (j & mask) << (self.logn - 1 - s)  # t * n/2^(s+1)
            w = jnp.take(pow_all, tw_idx, axis=0)     # (n/2, L)
            a = jnp.take(x, lo, axis=-2)
            b = jnp.take(x, hi, axis=-2)
            wb = f.mul(w, b)
            cat = jnp.concatenate([f.add(a, wb), f.sub(a, wb)], axis=-2)
            # scatter back: x'[i] lives at pair jj, half-half select
            jj = ((ii >> (s + 1)) << s) | (ii & mask)
            src = jj + ((ii >> s) & 1) * half
            return jnp.take(cat, src, axis=-2)

        return jax.lax.fori_loop(0, logn, stage, x)

    def _fwd(self, x):
        x = jnp.take(x, jnp.asarray(self.bitrev), axis=-2)
        return self._stages(x, self.pow_fwd)

    def _inv(self, x):
        x = jnp.take(x, jnp.asarray(self.bitrev), axis=-2)
        x = self._stages(x, self.pow_inv)
        return self.field.mul(x, jnp.asarray(self.n_inv_mont))

    @functools.cached_property
    def ntt(self):
        """Forward NTT, jitted. (..., n, L) Montgomery -> same."""
        return jax.jit(self._fwd)

    @functools.cached_property
    def intt(self):
        """Inverse NTT, jitted."""
        return jax.jit(self._inv)


class FourStepNTT:
    """Bailey four-step decomposition: n = n1 * n2 (for large n).

    View coefficients as a (n1, n2) row-major matrix A (a[i] = A[i//n2,
    i%n2]).  Then NTT(a) = flatten_T( NTT_rows( twiddle * NTT_cols(A) ) ):

      1. n2 column NTTs of size n1 (batched over columns);
      2. elementwise multiply by W^(i*j), W the n-th root;
      3. n1 row NTTs of size n2 (batched over rows);
      4. output element (j, i) read as X[j*n1 + i] (transpose).

    The step-4 transpose is the reference's bank-shuffle analog
    (ntt_data.rs:80-156) and the all_to_all boundary when sharded.

    The W^(i*j) inter-pass twiddle matrix is generated on device
    (`Field.power_matrix`, n total muls in log-doubling batches) and held
    compressed as uint16 limbs — at 2^24 that is ~0.5 GiB instead of 1.
    """

    def __init__(self, spec: FieldSpec, logn: int, logn1: int | None = None):
        self.spec = spec
        self.field = Field(spec)
        self.logn = logn
        self.logn1 = logn1 if logn1 is not None else logn // 2
        self.logn2 = logn - self.logn1
        self.n1, self.n2 = 1 << self.logn1, 1 << self.logn2
        self.plan1 = NTTPlan(spec, self.logn1)
        self.plan2 = NTTPlan(spec, self.logn2)

        p, L = spec.p, spec.nlimbs
        w = spec.root_of_unity(logn)
        self._tw_fwd = self._twiddle_matrix(w)
        self._tw_inv = self._twiddle_matrix(pow(w, -1, p))
        # no global n^-1 scale needed: the sub-plans' inverse passes already
        # apply n1^-1 and n2^-1, and n1^-1 * n2^-1 == n^-1.

    def _twiddle_matrix(self, w):
        """W^(i*j) for i<n1, j<n2, Montgomery form, uint16-compressed."""
        p, L = self.spec.p, self.spec.nlimbs
        mont = jnp.asarray(int_to_limbs((w * self.spec.r) % p, L))
        bases = self.field.powers(mont, self.n1)          # (n1, L)
        return Field.compress(self.field.power_matrix(bases, self.n2))

    def _fwd(self, x):
        f = self.field
        n1, n2, L = self.n1, self.n2, self.spec.nlimbs
        a = x.reshape(*x.shape[:-2], n1, n2, L)
        # column NTTs: transform over the n1 axis (move it last-but-one)
        a = jnp.swapaxes(a, -3, -2)                 # (..., n2, n1, L)
        a = self.plan1._fwd(a)
        a = jnp.swapaxes(a, -3, -2)                 # (..., n1, n2, L)
        a = f.mul(a, Field.decompress(self._tw_fwd))
        a = self.plan2._fwd(a)                      # row NTTs over n2 axis
        # output index (j, i) -> X[j * n1 + i]
        a = jnp.swapaxes(a, -3, -2)                 # (..., n2, n1, L)
        return a.reshape(*x.shape[:-2], n1 * n2, L)

    def _inv(self, x):
        f = self.field
        n1, n2, L = self.n1, self.n2, self.spec.nlimbs
        a = x.reshape(*x.shape[:-2], n2, n1, L)     # inverse of final transpose
        a = jnp.swapaxes(a, -3, -2)                 # (..., n1, n2, L)
        a = self.plan2._inv(a)
        a = f.mul(a, Field.decompress(self._tw_inv))
        a = jnp.swapaxes(a, -3, -2)                 # (..., n2, n1, L)
        a = self.plan1._inv(a)
        a = jnp.swapaxes(a, -3, -2)
        return a.reshape(*x.shape[:-2], n1 * n2, L)

    @functools.cached_property
    def ntt(self):
        return jax.jit(self._fwd)

    @functools.cached_property
    def intt(self):
        return jax.jit(self._inv)


def make_ntt(spec: FieldSpec, logn: int, four_step_threshold: int = 20,
             fused_threshold: int = 10):
    """Factory: fused Pallas plan on TPU (ntt/fused.py) for logn >=
    fused_threshold; below it (or off-TPU) the portable single-pass plan,
    with the XLA four-step decomposition for large portable sizes."""
    from ..fields.mxu import mxu_available

    if logn >= fused_threshold and mxu_available():
        from .fused import FusedNTT

        return FusedNTT(spec, logn)
    if logn <= four_step_threshold:
        return NTTPlan(spec, logn)
    return FourStepNTT(spec, logn)
