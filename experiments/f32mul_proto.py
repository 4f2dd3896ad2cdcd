"""Prototype: 8-bit-limb Montgomery mul with MXU REDC. Measures vs u32conv.

Representation: int32[..., L8] limbs base 2^8 (values < 2^8 canonical).
  T = conv(a, b)            -- VPU f32 column sums (exact: < 2^22)
  m = (T mod R) * N' mod R  -- (N, L8) @ (L8, L8) banded const matmul (MXU)
  q = m * p                 -- (N, L8) @ (L8, 2*L8) banded const matmul (MXU)
  U = T + q; result U / R   -- carry chains in int32 base 2^16 (VPU)

Run: python experiments/f32mul_proto.py [field] [logb]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from blaze_tpu.fields import FIELDS, Field

F32 = jnp.float32


def int_to_limbs8(x, l8):
    return np.array([(x >> (8 * i)) & 0xFF for i in range(l8)], dtype=np.int32)


def limbs8_to_int(a):
    return sum(int(v) << (8 * i) for i, v in enumerate(np.asarray(a, dtype=np.int64)))


def banded(limbs, rows, width):
    """Matrix M with M[i, i+j] = limbs[j]: (x @ M)[k] = sum_{i+j=k} x_i*l_j."""
    m = np.zeros((rows, width), dtype=np.float32)
    for i in range(rows):
        for j in range(len(limbs)):
            if i + j < width:
                m[i, i + j] = limbs[j]
    return m


class F32Field:
    def __init__(self, spec):
        self.spec = spec
        self.l8 = spec.nbytes  # 8-bit limbs
        L8 = self.l8
        p, r = spec.p, spec.r
        assert r == 1 << (8 * L8) or True
        # R here is 2^(8*L8); recompute Montgomery consts for that radix
        self.R = 1 << (8 * L8)
        self.r2 = (self.R * self.R) % p
        self.nprime = (-pow(p, -1, self.R)) % self.R
        self.p_limbs = int_to_limbs8(p, L8)
        self.np_mat = jnp.asarray(banded(int_to_limbs8(self.nprime, L8), L8, L8))
        self.p_mat = jnp.asarray(banded(self.p_limbs, L8, 2 * L8))
        self.p_i32 = jnp.asarray(self.p_limbs)

    def from_int(self, xs):
        arr = np.stack([int_to_limbs8(x * self.R % self.spec.p, self.l8) for x in xs])
        return jnp.asarray(arr)

    def to_int(self, a):
        # from Montgomery: multiply by 1
        one = jnp.zeros_like(a).at[..., 0].set(1)
        v = np.asarray(jax.jit(self.mul)(a, one))
        return [limbs8_to_int(r) for r in v]

    def _carry8(self, cols):
        """int32 columns (< 2^30) -> 8-bit limbs + top carry, base-2^16 chain."""
        L8 = cols.shape[-1]
        outs = []
        carry = jnp.zeros(cols.shape[:-1], dtype=jnp.int32)
        # pairwise chain in base 2^16 to halve sequential steps
        for j in range(0, L8, 2):
            hi = cols[..., j + 1] if j + 1 < L8 else 0
            v = cols[..., j] + (hi << 8) + carry
            outs.append(v & 0xFF)
            outs.append((v >> 8) & 0xFF)
            carry = v >> 16
        out = jnp.stack(outs[:L8], axis=-1)
        return out, carry

    def _sub_p(self, x):
        """x (8-bit limbs) - p with borrow; returns (diff, borrow)."""
        L8 = self.l8
        outs = []
        borrow = jnp.zeros(x.shape[:-1], dtype=jnp.int32)
        for j in range(L8):
            v = x[..., j] - self.p_i32[j] - borrow
            outs.append(v & 0xFF)
            borrow = (v >> 8) & 1
        return jnp.stack(outs, axis=-1), borrow

    def _conv(self, a, b):
        """f32 column sums of a*b, width 2*L8 (static shift-pads)."""
        L8 = self.l8
        af = a.astype(F32)
        bf = b.astype(F32)
        acc = jnp.zeros((*a.shape[:-1], 2 * L8), dtype=F32)
        pad_cfg = [(0, 0)] * (a.ndim - 1)
        for j in range(L8):
            term = af * bf[..., j : j + 1]
            acc = acc + jnp.pad(term, pad_cfg + [(j, L8 - j)])
        return acc

    def mul(self, a, b):
        L8 = self.l8
        t = self._conv(a, b)                                  # f32 (.., 2L8)
        t_i = t.astype(jnp.int32)
        t_lo, _tc = self._carry8(t_i[..., :L8])               # normalized low
        # m = t_lo * N' mod R  (MXU)
        m_cols = jnp.dot(t_lo.astype(F32), self.np_mat,
                         preferred_element_type=F32)
        m, _ = self._carry8(m_cols.astype(jnp.int32))
        # q = m * p (MXU), full width
        q = jnp.dot(m.astype(F32), self.p_mat, preferred_element_type=F32)
        u = t_i + q.astype(jnp.int32)
        # low half sums to 0 mod R; need its carry-out
        lo, c_lo = self._carry8(u[..., :L8])
        hi_cols = u[..., L8:].at[..., 0].add(c_lo)
        res, top = self._carry8(hi_cols)
        # res + top*R < 2p; conditional subtract
        sub, borrow = self._sub_p(res)
        ge = (top > 0) | (borrow == 0)
        return jnp.where(ge[..., None], sub, res)


def timeit(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "bls12_381_fq"
    logb = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 1 << logb
    spec = FIELDS[name]
    rng = np.random.default_rng(0)
    vals_a = [int(rng.integers(1, 1 << 62)) ** 5 % spec.p for _ in range(256)]
    vals_b = [int(rng.integers(1, 1 << 62)) ** 5 % spec.p for _ in range(256)]
    xa = [vals_a[i % 256] for i in range(n)]
    xb = [vals_b[(i * 7 + 3) % 256] for i in range(n)]

    # --- current u32 16-bit conv
    F = Field(spec)
    a = F.from_int(xa)
    b = F.from_int(xb)
    mul = jax.jit(F.mul)
    t = timeit(mul, a, b)
    print(f"u32conv  {name} 2^{logb}: {t*1e3:9.3f} ms  {n/t/1e6:9.2f} Mmul/s")

    # --- f32/MXU 8-bit
    G = F32Field(spec)
    ga = G.from_int(xa)
    gb = G.from_int(xb)
    gmul = jax.jit(G.mul)
    got = G.to_int(gmul(ga, gb))[:8]
    want = [(x * y) % spec.p for x, y in zip(xa[:8], xb[:8])]
    ok = got == want
    print(f"f32/MXU correct: {ok}")
    if not ok:
        print(" got", got[:2], "\nwant", want[:2])
    t = timeit(gmul, ga, gb)
    print(f"f32mxu   {name} 2^{logb}: {t*1e3:9.3f} ms  {n/t/1e6:9.2f} Mmul/s")


if __name__ == "__main__":
    main()
