"""Hybrid Montgomery mul: VPU conv(a,b) + MXU (bf16 matmul) REDC.

16-bit limbs in uint32 (N, L).  T = conv(a,b) lazy columns (< 2^21).
REDC via two exact bf16 matmuls with constant banded byte matrices:
  m = (T mod R)*N' mod R   -- one (N, 3W) @ (3W, 2L) matmul on T's bytes
  q = m * p                -- one (N, 2L) @ (2L, 4L) matmul on m's bytes
Exactness: all matmul operands < 2^8 (exact in bf16), column sums < 2^22
(exact in f32 accumulation).

Run: python experiments/hybrid_mul.py [field] [logb] [chain]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from blaze_tpu.fields import FIELDS, Field
from blaze_tpu.fields.spec import LIMB_BITS, LIMB_MASK


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1]))


def timeit(fn, *args, iters=3):
    out = fn(*args); sync(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args); sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def bytes_of_int(x, n):
    return np.array([(x >> (8 * i)) & 0xFF for i in range(n)], dtype=np.int64)


class HybridField:
    def __init__(self, spec):
        self.spec = spec
        L = self.L = spec.nlimbs
        self.W = 2 * L + 1
        B = 2 * L                       # bytes in R = 2^(16L)
        p = spec.p
        R = 1 << (16 * L)
        np_ = (-pow(p, -1, R)) % R
        np8 = bytes_of_int(np_, B)
        p8 = bytes_of_int(p, B)

        # M_np: (3W, B) — row (k, c) holds np8 shifted by (2k + c);
        # column j of T8 @ M_np = sum over bytes of (T*N') byte-column j.
        W = self.W
        m_np = np.zeros((3 * W, B), dtype=np.float32)
        for k in range(W):
            for c in range(3):
                off = 2 * k + c
                for i in range(B):
                    if off + i < B:
                        m_np[3 * k + c, off + i] = np8[i]
        self.m_np = jnp.asarray(m_np, dtype=jnp.bfloat16)

        # M_p: (B, 4L) — q bytes = m8 @ M_p.
        m_p = np.zeros((B, 4 * L), dtype=np.float32)
        for i in range(B):
            for j in range(B):
                if i + j < 4 * L:
                    m_p[i, i + j] = p8[j]
        self.m_p = jnp.asarray(m_p, dtype=jnp.bfloat16)

        self.p_limbs = jnp.asarray(np.asarray(spec.p_limbs, np.uint32))

    # ------------------------------------------------------------ pieces
    def conv_ab(self, a, b):
        """Lazy 16-bit-stride columns of a*b: (N, W) uint32 < 2^21."""
        L, W = self.L, self.W
        acc = jnp.zeros((*a.shape[:-1], W), jnp.uint32)
        pad = [(0, 0)] * (a.ndim - 1)
        for i in range(L):
            prod = a * b[..., i : i + 1]
            lo = prod & LIMB_MASK
            hi = prod >> LIMB_BITS
            acc = acc + jnp.pad(lo, pad + [(i, W - i - L)])
            acc = acc + jnp.pad(hi, pad + [(i + 1, W - i - 1 - L)])
        return acc

    def t_bytes(self, t):
        """(N, W) u32 < 2^24 -> (N, 3W) bytes, bf16."""
        b0 = t & 0xFF
        b1 = (t >> 8) & 0xFF
        b2 = t >> 16
        out = jnp.stack([b0, b1, b2], axis=-1).reshape(*t.shape[:-1], -1)
        return out.astype(jnp.bfloat16)

    def _carry16(self, cols, carry_in=None):
        outs = []
        carry = carry_in if carry_in is not None else jnp.zeros(
            cols.shape[:-1], jnp.uint32)
        for j in range(cols.shape[-1]):
            v = cols[..., j] + carry
            outs.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return jnp.stack(outs, axis=-1), carry

    def mul(self, a, b):
        L, W = self.L, self.W
        t = self.conv_ab(a, b)                              # (N, W) < 2^21
        # m = (T*N') mod R, byte columns via MXU
        m_cols = jnp.dot(self.t_bytes(t), self.m_np,
                         preferred_element_type=jnp.float32)  # (N, 2L) < 2^22
        mc = m_cols.astype(jnp.uint32)
        m16 = mc[..., 0::2] + (mc[..., 1::2] << 8)           # (N, L) < 2^30
        m, _ = self._carry16(m16)                            # exact m limbs
        # q = m * p byte columns via MXU
        m8 = jnp.stack([m & 0xFF, m >> 8], axis=-1).reshape(
            *m.shape[:-1], -1).astype(jnp.bfloat16)          # (N, 2L)
        q_cols = jnp.dot(m8, self.m_p,
                         preferred_element_type=jnp.float32)  # (N, 4L) < 2^22
        qc = q_cols.astype(jnp.uint32)
        q16 = qc[..., 0::2] + (qc[..., 1::2] << 8)           # (N, 2L) < 2^30
        u = t + jnp.pad(q16, [(0, 0)] * (t.ndim - 1) + [(0, 1)])
        _, c1 = self._carry16(u[..., :L])                    # low half -> 0
        limbs, top = self._carry16(u[..., L : 2 * L], carry_in=c1)
        top = top + u[..., 2 * L]
        # conditional subtract p
        outs = []
        borrow = jnp.zeros(limbs.shape[:-1], jnp.uint32)
        for j in range(L):
            v = limbs[..., j] + jnp.uint32(1 << LIMB_BITS) - self.p_limbs[j] - borrow
            outs.append(v & LIMB_MASK)
            borrow = jnp.uint32(1) - (v >> LIMB_BITS)
        sub = jnp.stack(outs, axis=-1)
        ge = (top > 0) | (borrow == 0)
        return jnp.where(ge[..., None], sub, limbs)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "bls12_381_fq"
    logb = int(sys.argv[2]) if len(sys.argv) > 2 else 18
    chain = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n = 1 << logb
    spec = FIELDS[name]
    F = Field(spec)
    rng = np.random.default_rng(0)
    base = [int(rng.integers(1, 1 << 62)) ** 5 % spec.p for _ in range(64)]
    a = F.from_int([base[i % 64] for i in range(n)])
    b = F.from_int([base[(i * 7 + 3) % 64] for i in range(n)])

    def mk(mulfn):
        return jax.jit(lambda x, y: jax.lax.fori_loop(
            0, chain, lambda i, x: mulfn(x, y), x))

    f0 = mk(F.mul)
    t = timeit(f0, a, b)
    print(f"baseline {name} 2^{logb} x{chain}: {t*1e3:9.1f} ms "
          f"{chain*n/t/1e6:8.1f} Mmul/s")

    H = HybridField(spec)
    f1 = mk(H.mul)
    r0 = np.asarray(f0(a, b))
    r1 = np.asarray(f1(a, b))
    print("match:", bool((r0 == r1).all()))
    t = timeit(f1, a, b)
    print(f"hybrid   {name} 2^{logb} x{chain}: {t*1e3:9.1f} ms "
          f"{chain*n/t/1e6:8.1f} Mmul/s")


if __name__ == "__main__":
    main()
