"""Field-mul strategy microbenchmarks (run on the real chip).

Compares Montgomery-mul implementations for one field at a fixed batch to
pick the hot-path design:
  u32conv   — current: 16-bit limbs, uint32 lazy-carry convolution (VPU int)
  f32conv   — 8-bit limbs in float32, exact f32 multiply-accumulate (VPU fp)
  mxu       — batched a*b conv on VPU f32 + the two fixed-operand REDC
              convolutions (x N', x p) as constant-matrix f32 matmuls (MXU)

Usage: python -m blaze_tpu.bench.microbench [field] [log2 batch]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FIELDS, Field
from ..fields.spec import int_to_limbs


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "bls12_381_fq"
    logb = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 1 << logb
    spec = FIELDS[name]
    F = Field(spec)
    rng = np.random.default_rng(0)
    xs = [int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) % spec.p
          for _ in range(256)]
    a = F.from_int([xs[i % 256] for i in range(n)])
    b = F.from_int([xs[(i * 7 + 3) % 256] for i in range(n)])

    from .profile import bench_kernel, field_mul_traffic_bytes

    mul = jax.jit(F.mul)
    stats = bench_kernel(
        mul, (a, b), name=f"mont_mul[{name}]", reps=10,
        bytes_accessed=field_mul_traffic_bytes(n, spec.nlimbs),
    )
    t = stats.best_s
    print(stats.summary())
    print(f"u32conv  {name} batch 2^{logb}: {t*1e3:8.3f} ms  "
          f"{n/t/1e6:8.2f} Mmul/s")

    # correctness spot check
    got = F.to_int(mul(a, b))[:4]
    want = [(F.to_int(a[i:i+1])[0] * F.to_int(b[i:i+1])[0]) % spec.p
            for i in range(4)]
    assert got == want, "u32conv mismatch"


if __name__ == "__main__":
    main()
