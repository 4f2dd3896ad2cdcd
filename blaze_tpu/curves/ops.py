"""Branchless elliptic-curve group ops for y^2 = x^3 + b (a = 0).

Complete homogeneous-projective formulas from Renes-Costello-Batina 2016
(algorithms 7/8/9 for j-invariant 0): a single code path handles doubling,
inverses and the identity — exactly what a traced/vectorized TPU program
needs.  Points are `uint32[..., 3, L]` (X, Y, Z limb rows, Montgomery form);
identity is (0 : 1 : 0).

This supplies the math of the reference's opaque FPGA "EC adder" engines
(perf-counter surface at `/root/reference/src/ingo_msm/msm_hw_code.rs:35-54`),
and the projective z||y||x result contract parsed by its oracle
(`/root/reference/tests/msm/mod.rs:397-399` — affine = (x/z, y/z)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.mont import Field
from .spec import CurveSpec


class Curve:
    """Batched group ops bound to one CurveSpec. Stateless; jit-friendly.

    As with Field, use `jit_op('add')` etc. for standalone calls — cached
    jitted wrappers shared per curve across instances.
    """

    _JIT_CACHE: dict = {}

    def jit_op(self, name: str):
        key = (self.spec.name, name)
        fn = Curve._JIT_CACHE.get(key)
        if fn is None:
            fn = jax.jit(getattr(self, name))
            Curve._JIT_CACHE[key] = fn
        return fn

    def __init__(self, spec: CurveSpec):
        self.spec = spec
        self.fq = Field(spec.fq)
        self.fr = Field(spec.fr)
        # 3b in Montgomery form, host-side constant
        from ..fields.spec import int_to_limbs

        b3 = (3 * spec.b) % spec.fq.p
        self._b3 = np.asarray(
            int_to_limbs((b3 * spec.fq.r) % spec.fq.p, spec.fq.nlimbs),
            dtype=np.uint32,
        )

    # ------------------------------------------------------------ structure
    @property
    def nlimbs(self):
        return self.fq.nlimbs

    @staticmethod
    def pack(x, y, z):
        return jnp.stack([x, y, z], axis=-2)

    @staticmethod
    def unpack(p):
        return p[..., 0, :], p[..., 1, :], p[..., 2, :]

    def identity(self, batch_shape=()):
        f = self.fq
        return self.pack(
            f.zeros(batch_shape), f.one(batch_shape), f.zeros(batch_shape)
        )

    def is_identity(self, p):
        _, _, z = self.unpack(p)
        return self.fq.is_zero(z)

    @staticmethod
    def select(cond, p, q):
        """where(cond, p, q); cond shaped (...,)."""
        return jnp.where(cond[..., None, None], p, q)

    def neg(self, p):
        x, y, z = self.unpack(p)
        return self.pack(x, self.fq.neg(y), z)

    # ---------------------------------------------------------- group law
    def add(self, p, q):
        """Complete projective addition (RCB alg 7, a=0). 12 field muls."""
        f = self.fq
        b3 = jnp.asarray(self._b3)
        X1, Y1, Z1 = self.unpack(p)
        X2, Y2, Z2 = self.unpack(q)

        t0 = f.mul(X1, X2)
        t1 = f.mul(Y1, Y2)
        t2 = f.mul(Z1, Z2)
        t3 = f.mul(f.add(X1, Y1), f.add(X2, Y2))
        t3 = f.sub(t3, f.add(t0, t1))            # X1Y2 + X2Y1
        t4 = f.mul(f.add(Y1, Z1), f.add(Y2, Z2))
        t4 = f.sub(t4, f.add(t1, t2))            # Y1Z2 + Y2Z1
        t5 = f.mul(f.add(X1, Z1), f.add(X2, Z2))
        t5 = f.sub(t5, f.add(t0, t2))            # X1Z2 + X2Z1

        t0 = f.add(f.double(t0), t0)             # 3 X1X2
        t2 = f.mul(b3, t2)                       # 3b Z1Z2
        z3 = f.add(t1, t2)                       # Y1Y2 + 3bZ1Z2
        t1 = f.sub(t1, t2)                       # Y1Y2 - 3bZ1Z2
        y3 = f.mul(b3, t5)                       # 3b (X1Z2 + X2Z1)

        X3 = f.sub(f.mul(t3, t1), f.mul(t4, y3))
        Y3 = f.add(f.mul(t1, z3), f.mul(t0, y3))
        Z3 = f.add(f.mul(z3, t4), f.mul(t0, t3))
        return self.pack(X3, Y3, Z3)

    def add_mixed(self, p, q_affine):
        """Complete mixed addition (RCB alg 8, a=0), q affine (x, y) stacked
        as uint32[..., 2, L]. 11 field muls. Handles p = identity; q must be
        a real point (affine encoding cannot express the identity)."""
        f = self.fq
        b3 = jnp.asarray(self._b3)
        X1, Y1, Z1 = self.unpack(p)
        X2, Y2 = q_affine[..., 0, :], q_affine[..., 1, :]

        t0 = f.mul(X1, X2)
        t1 = f.mul(Y1, Y2)
        t3 = f.mul(f.add(X2, Y2), f.add(X1, Y1))
        t3 = f.sub(t3, f.add(t0, t1))            # X1Y2 + X2Y1
        t4 = f.add(f.mul(Y2, Z1), Y1)            # Y1 + Y2Z1
        y3 = f.add(f.mul(X2, Z1), X1)            # X1 + X2Z1

        t0 = f.add(f.double(t0), t0)             # 3 X1X2
        t2 = f.mul(b3, Z1)                       # 3b Z1
        z3 = f.add(t1, t2)
        t1 = f.sub(t1, t2)
        y3 = f.mul(b3, y3)

        X3 = f.sub(f.mul(t3, t1), f.mul(t4, y3))
        Y3 = f.add(f.mul(t1, z3), f.mul(t0, y3))
        Z3 = f.add(f.mul(z3, t4), f.mul(t0, t3))
        return self.pack(X3, Y3, Z3)

    def dbl(self, p):
        """Complete doubling (RCB alg 9, a=0). 6M + 2S."""
        f = self.fq
        b3 = jnp.asarray(self._b3)
        X, Y, Z = self.unpack(p)

        t0 = f.square(Y)
        z3 = f.double(f.double(f.double(t0)))    # 8 Y^2
        t1 = f.mul(Y, Z)
        t2 = f.mul(b3, f.square(Z))              # 3b Z^2
        X3 = f.mul(t2, z3)
        Y3 = f.add(t0, t2)
        Z3 = f.mul(t1, z3)
        t1 = f.double(t2)
        t2 = f.add(t1, t2)                       # 9b Z^2
        t0 = f.sub(t0, t2)                       # Y^2 - 9bZ^2
        Y3 = f.add(X3, f.mul(t0, Y3))
        X3 = f.double(f.mul(t0, f.mul(X, Y)))
        return self.pack(X3, Y3, Z3)

    # ------------------------------------------------------------- checks
    def on_curve(self, p):
        """Projective check: Y^2 Z == X^3 + b Z^3 (identity passes)."""
        f = self.fq
        X, Y, Z = self.unpack(p)
        # scale both sides by 3 so the precomputed 3b constant can be used:
        #   3 Y^2 Z == 3 X^3 + (3b) Z^3
        lhs = f.mul(f.square(Y), Z)
        lhs3 = f.add(f.double(lhs), lhs)
        x3 = f.mul(f.square(X), X)
        rhs3 = f.add(
            f.add(f.double(x3), x3),
            f.mul(jnp.asarray(self._b3), f.mul(f.square(Z), Z)),
        )
        return f.eq(lhs3, rhs3)

    # --------------------------------------------------------- conversions
    def to_affine(self, p):
        """Projective -> affine (..., 2, L); identity maps to (0, 0)."""
        f = self.fq
        X, Y, Z = self.unpack(p)
        zinv = f.inv(Z)
        ax = f.mul(X, zinv)
        ay = f.mul(Y, zinv)
        return jnp.stack([ax, ay], axis=-2)

    def from_affine(self, q_affine):
        """Affine (..., 2, L) -> projective with Z = 1 (Montgomery one)."""
        x = q_affine[..., 0, :]
        y = q_affine[..., 1, :]
        one = self.fq.one(x.shape[:-1])
        return self.pack(x, y, one)

    # -------------------------------------------------------- scalar mul
    def scalar_mul(self, p, k: int):
        """p * k for a python-int scalar (test/oracle use).

        Fixed-width double-and-add via fori_loop so the graph stays small
        (one dbl+add body) regardless of scalar size.
        """
        nbits = self.spec.fr.bits
        k %= self.spec.fr.p
        kbits = jnp.asarray(
            [(k >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.uint32
        )

        def body(i, acc):
            acc = self.dbl(acc)
            added = self.add(acc, p)
            take = jnp.broadcast_to(kbits[i] == 1, acc.shape[:-2])
            return self.select(take, added, acc)

        init = self.identity(p.shape[:-2])
        return jax.lax.fori_loop(0, nbits, body, init)
