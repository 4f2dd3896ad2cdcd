"""Pallas fused Montgomery mul (hybrid VPU conv + MXU REDC), TPU.

Internal layout transposed: (L, T) tiles — limbs on sublanes, batch on
lanes.  Whole REDC in VMEM; two bf16 matmuls on byte-split operands.

Run: python experiments/pallas_mul.py [field] [logb] [chain]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


class PallasMont:
    """Montgomery mul with (batch, L) public layout, (L, T) kernel layout."""

    def __init__(self, spec, tile=512):
        self.spec = spec
        self.tile = tile
        L = self.L = spec.nlimbs
        W = self.W = 2 * L + 1
        B = 2 * L
        p = spec.p
        R = 1 << (16 * L)
        np_ = (-pow(p, -1, R)) % R
        np8 = bytes_of_int(np_, B)
        p8 = bytes_of_int(p, B)

        # transposed matrices: out_cols x in_rows so kernel does M @ X
        # input rows in byte-plane order: row c*W + k == byte c of column k
        m_np = np.zeros((B, 3 * W), dtype=np.float32)   # (out 2L, in 3W)
        for k in range(W):
            for c in range(3):
                off = 2 * k + c
                for i in range(B):
                    if off + i < B:
                        m_np[off + i, c * W + k] = np8[i]
        self.m_np = jnp.asarray(m_np, dtype=jnp.bfloat16)

        # input rows in byte-plane order: row c*L + l == byte c of limb l
        m_p = np.zeros((4 * L, B), dtype=np.float32)    # (out 4L, in 2L)
        for i in range(B):
            for j in range(B):
                if i + j < 4 * L:
                    c, l = i % 2, i // 2
                    m_p[i + j, c * L + l] = p8[j]
        self.m_p = jnp.asarray(m_p, dtype=jnp.bfloat16)

    # ------------------------------------------------------------- kernel
    def _kernel(self, mnp_ref, mp_ref, a_ref, b_ref, o_ref):
        L, W = self.L, self.W
        a = a_ref[:]                       # (L, T) u32
        b = b_ref[:]
        T = a.shape[1]

        # conv(a, b): acc (W, T)
        acc = jnp.zeros((W, T), jnp.uint32)
        for i in range(L):
            prod = a * b[i : i + 1]
            lo = prod & LIMB_MASK
            hi = prod >> LIMB_BITS
            acc = acc + jnp.pad(lo, ((i, W - i - L), (0, 0)))
            acc = acc + jnp.pad(hi, ((i + 1, W - i - 1 - L), (0, 0)))

        # byte split -> (3W, T) bf16
        t8 = jnp.concatenate(
            [acc & 0xFF, (acc >> 8) & 0xFF, acc >> 16], axis=0
        ).astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

        m_cols = jnp.dot(mnp_ref[:], t8, preferred_element_type=jnp.float32)
        mc = m_cols.astype(jnp.int32).astype(jnp.uint32).reshape(L, 2, T)
        m16 = mc[:, 0] + (mc[:, 1] << 8)                # (L, T)

        def carry(cols, carry_in=None):
            outs = []
            c = carry_in if carry_in is not None else jnp.zeros(
                (1, cols.shape[1]), jnp.uint32)
            for j in range(cols.shape[0]):
                v = cols[j : j + 1] + c
                outs.append(v & LIMB_MASK)
                c = v >> LIMB_BITS
            return jnp.concatenate(outs, axis=0), c

        m, _ = carry(m16)
        m8 = jnp.concatenate([m & 0xFF, m >> 8], axis=0).astype(
            jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

        q_cols = jnp.dot(mp_ref[:], m8, preferred_element_type=jnp.float32)
        qc = q_cols.astype(jnp.int32).astype(jnp.uint32).reshape(2 * L, 2, T)
        q16 = qc[:, 0] + (qc[:, 1] << 8)                # (2L, T)
        u = acc + jnp.pad(q16, ((0, 1), (0, 0)))

        _, c1 = carry(u[:L])
        limbs, top = carry(u[L : 2 * L], carry_in=c1)
        top = top + u[2 * L : 2 * L + 1]

        # conditional subtract p
        outs = []
        borrow = jnp.zeros((1, T), jnp.uint32)
        plimbs = [int(v) for v in np.asarray(self.spec.p_limbs)]
        for j in range(L):
            v = limbs[j : j + 1] + jnp.uint32((1 << LIMB_BITS) - plimbs[j]) - borrow
            outs.append(v & LIMB_MASK)
            borrow = jnp.uint32(1) - (v >> LIMB_BITS)
        sub = jnp.concatenate(outs, axis=0)
        ge = (top > 0) | (borrow == 0)                  # (1, T)
        o_ref[:] = jnp.where(ge, sub, limbs)

    @functools.partial(jax.jit, static_argnums=0)
    def mul(self, a, b):
        """(N, L) x (N, L) -> (N, L), canonical Montgomery product."""
        L, W = self.L, self.W
        n = a.shape[0]
        T = self.tile
        npad = -n % T
        at = jnp.pad(a, [(0, npad), (0, 0)]).T          # (L, N')
        bt = jnp.pad(b, [(0, npad), (0, 0)]).T
        grid = (at.shape[1] // T,)
        out = pl.pallas_call(
            self._kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((2 * L, 3 * W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * L, 2 * L), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, T), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(at.shape, jnp.uint32),
        )(self.m_np, self.m_p, at, bt)
        return out.T[:n]


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

    P = PallasMont(spec)

    r0 = np.asarray(jax.jit(F.mul)(a, b))
    r1 = np.asarray(P.mul(a, b))
    print("match:", bool((r0 == r1).all()))

    def mk(mulfn):
        return jax.jit(lambda x, y: jax.lax.fori_loop(
            0, chain, lambda i, x: mulfn(x, y), x))

    f1 = mk(P.mul)
    r2 = np.asarray(f1(a, b))
    f0 = mk(F.mul)
    r3 = np.asarray(f0(a, b))
    print("chain match:", bool((r2 == r3).all()))
    t = timeit(f1, a, b)
    print(f"pallas  {name} 2^{logb} x{chain}: {t*1e3:9.1f} ms "
          f"{chain*n/t/1e6:8.1f} Mmul/s")


if __name__ == "__main__":
    main()
