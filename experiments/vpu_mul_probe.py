# SUPERSEDED: written against the round-3 field layer; the round-4 const
# plumbing changed _mont_mul's signature (fc tuple).  Kept as the record
# of earlier probes — use experiments/redc_probe.py / mul_bench.py now.
"""Measure in-kernel per-op cost of Montgomery-mul building blocks.

Chains M dependent ops inside one pallas kernel (VMEM-resident); the
slope of time vs M isolates per-op cost from dispatch/launch overhead.

Probes:
  u32mul   — raw u32 multiply on (L, T)
  f32fma   — raw f32 multiply-add on (2L, T)
  mont_u32 — full fused Montgomery mul (current kernels.py body)
  conv_u32 — product conv only (u32 path)
  conv_f32 — product conv in f32 8-bit digits
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blaze_tpu.curves import CURVES
from blaze_tpu.curves.kernels import ECKernels
from blaze_tpu.fields.spec import LIMB_BITS, LIMB_MASK

T = int(sys.argv[1]) if len(sys.argv) > 1 else 512
NTILES = int(sys.argv[2]) if len(sys.argv) > 2 else 64
spec = CURVES["bls12_381"]
kern = ECKernels.for_curve(spec, tile=T)
L, W = kern.L, kern.W
B = NTILES * T

mnp = jnp.asarray(kern._mnp_host, dtype=jnp.bfloat16)
mp = jnp.asarray(kern._mp_host, dtype=jnp.bfloat16)


def sync(x):
    np.asarray(jax.device_get(x.ravel()[0:1]))


def conv_u32(a, b):
    acc = jnp.zeros((W, T), jnp.uint32)
    for i in range(L):
        prod = a * b[i : i + 1]
        acc = acc + jnp.pad(prod & LIMB_MASK, ((i, W - i - L), (0, 0)))
        acc = acc + jnp.pad(prod >> LIMB_BITS, ((i + 1, W - i - 1 - L), (0, 0)))
    return acc


def conv_f32(a, b):
    # 8-bit digit split, f32 FMA conv; exact: digit products < 2^16,
    # column sums < 2L*2^16 < 2^24
    D = 2 * L
    a8 = jnp.concatenate([a & 0xFF, a >> 8], axis=0).astype(jnp.int32).astype(jnp.float32)
    b8 = jnp.concatenate([b & 0xFF, b >> 8], axis=0).astype(jnp.int32).astype(jnp.float32)
    # interleave to true digit order: row d = limb d//2, byte d%2
    acc = jnp.zeros((2 * D, T), jnp.float32)
    for i in range(D):
        li, hi = i // 2, i % 2
        dig = b8[li + hi * L : li + hi * L + 1]
        prod = a8 * dig
        acc = acc + jnp.pad(prod, ((i, 2 * D - i - D), (0, 0)))
    return acc


def make_chain(body, M, nin=2):
    def kernel(mnp_ref, mp_ref, a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]

        def step(_, a):
            return body(a, b, mnp_ref[:], mp_ref[:])

        o_ref[:] = jax.lax.fori_loop(0, M, step, a)

    call = pl.pallas_call(
        kernel,
        grid=(NTILES,),
        in_specs=[
            pl.BlockSpec((2 * L, 3 * W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * L, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, B), jnp.uint32),
    )
    return jax.jit(call)


BODIES = {
    "u32mul": lambda a, b, M, P: (a * b) ^ jnp.uint32(1),
    "mont_u32": lambda a, b, M, P: kern._mont_mul(a, b, M, P),
    "conv_u32": lambda a, b, M, P: conv_u32(a, b)[:L] & LIMB_MASK,
    "conv_f32": lambda a, b, M, P: (
        conv_f32(a, b)[:L].astype(jnp.int32).astype(jnp.uint32) & LIMB_MASK
    ),
}

rng = np.random.RandomState(0)
a = jnp.asarray(rng.randint(0, 1 << 16, size=(L, B), dtype=np.int64).astype(np.uint32))
b = jnp.asarray(rng.randint(0, 1 << 16, size=(L, B), dtype=np.int64).astype(np.uint32))

for name, body in BODIES.items():
    ts = {}
    for M in (1, 129):
        fn = make_chain(body, M)
        o = fn(mnp, mp, a, b)
        sync(o)
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            sync(fn(mnp, mp, a, b))
            best = min(best, time.perf_counter() - t0)
        ts[M] = best
    per = (ts[129] - ts[1]) / 128
    per_tile = per / NTILES
    print(
        f"{name:10s} per-op {per*1e6:8.1f} us total, {per_tile*1e9:7.0f} ns/tile, "
        f"{B/per/1e6 if per > 0 else float('inf'):8.1f} M elem-ops/s",
        flush=True,
    )
