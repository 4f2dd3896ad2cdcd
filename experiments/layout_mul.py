"""Layout experiment: Montgomery mul with limbs on the MAJOR axis.

Current Field.mul keeps limbs minor (batch, L) and shifts along lanes.
Here: arrays are (L, batch) so column shifts are sublane-dim pads (cheap)
and every elementwise op is a full (L, N) tile.  Same math (16-bit limbs,
uint32 lazy-carry full REDC).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from blaze_tpu.fields import FIELDS, Field
from blaze_tpu.fields.spec import LIMB_BITS, LIMB_MASK, int_to_limbs


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


class TField:
    """Transposed-layout Montgomery field ops. arrays: uint32 (L, N)."""

    def __init__(self, spec):
        self.spec = spec
        self.L = spec.nlimbs
        self.p = jnp.asarray(np.asarray(spec.p_limbs, np.uint32)[:, None])
        self.np_ = jnp.asarray(np.asarray(spec.nprime_limbs, np.uint32)[:, None])

    def _conv(self, a, b, width):
        """Column sums of a*b: (W, N). Shifts are leading-axis pads."""
        L = self.L
        acc = jnp.zeros((width, a.shape[1]), jnp.uint32)
        for i in range(min(L, width)):
            prod = a * b[i]                     # (L, N) full products
            lo = prod & LIMB_MASK
            hi = prod >> LIMB_BITS
            w_lo = min(L, width - i)
            acc = acc.at[i : i + w_lo].add(lo[:w_lo]) if False else (
                acc + jnp.pad(lo[:w_lo], [(i, width - i - w_lo), (0, 0)])
            )
            if i + 1 < width:
                w_hi = min(L, width - i - 1)
                acc = acc + jnp.pad(hi[:w_hi], [(i + 1, width - i - 1 - w_hi), (0, 0)])
        return acc

    def _carry(self, cols, carry_in=None):
        outs = []
        carry = carry_in if carry_in is not None else jnp.zeros(
            cols.shape[1:], jnp.uint32)
        for j in range(cols.shape[0]):
            v = cols[j] + carry
            outs.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return jnp.stack(outs), carry

    def _sub(self, x, y):
        outs = []
        borrow = jnp.zeros(x.shape[1:], jnp.uint32)
        for j in range(self.L):
            v = x[j] + jnp.uint32(1 << LIMB_BITS) - y[j] - borrow
            outs.append(v & LIMB_MASK)
            borrow = jnp.uint32(1) - (v >> LIMB_BITS)
        return jnp.stack(outs), borrow

    def mul(self, a, b):
        L = self.L
        W = 2 * L + 1
        t = self._conv(a, b, W)
        t_lo, c_lo = self._carry(t[:L])
        m_cols = self._conv(t_lo, self.np_, L)
        m, _ = self._carry(m_cols)
        q = self._conv(m, self.p, W)
        _, c1 = self._carry(t_lo + q[:L])
        limbs, top = self._carry(t[L : 2 * L] + q[L : 2 * L], carry_in=c1 + c_lo)
        top = top + t[2 * L] + q[2 * L]
        sub, borrow = self._sub(limbs, jnp.broadcast_to(self.p, limbs.shape))
        ge = (top > 0) | (borrow == 0)
        return jnp.where(ge[None], sub, limbs)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "bls12_381_fq"
    logb = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    chain = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n = 1 << logb
    spec = FIELDS[name]
    F = Field(spec)
    rng = np.random.default_rng(0)
    base = [int(rng.integers(1, 1 << 62)) ** 5 % spec.p for _ in range(64)]
    xa = [base[i % 64] for i in range(n)]
    xb = [base[(i * 7 + 3) % 64] for i in range(n)]
    a = F.from_int(xa); b = F.from_int(xb)

    def mk_chain(mulfn):
        def fn(x, y):
            return jax.lax.fori_loop(0, chain, lambda i, x: mulfn(x, y), x)
        return jax.jit(fn)

    # baseline (batch, L)
    f0 = mk_chain(F.mul)
    t = timeit(f0, a, b)
    print(f"minor-limbs  {name} 2^{logb} x{chain}: {t*1e3:9.1f} ms "
          f"{chain*n/t/1e6:8.1f} Mmul/s")

    # transposed (L, batch)
    T = TField(spec)
    at, bt = a.T, b.T
    f1 = mk_chain(T.mul)
    # correctness: chain result equals baseline chain
    r0 = np.asarray(f0(a, b))
    r1 = np.asarray(f1(at, bt)).T
    print("match:", bool((r0 == r1).all()))
    t = timeit(f1, at, bt)
    print(f"major-limbs  {name} 2^{logb} x{chain}: {t*1e3:9.1f} ms "
          f"{chain*n/t/1e6:8.1f} Mmul/s")


if __name__ == "__main__":
    main()
