"""Decompose the fused Montgomery-mul cost into its REDC components.

Times bodies chained in-kernel (M=1 vs M=129 slope isolates per-op cost)
against the CURRENT int8-REDC field layer (fields/kernel_ops.py):

  mont      full _mont_mul
  conv      u32 product convolution only
  ks_carry  one Kogge-Stone carry normalization of (L, T)
  mm_i8     the K-trimmed int8 m matmul (_dot_exact, (2L, 3L-1))
  qmm_i8    the int8 q matmul (_dot_exact, (4L, 2L))
  redc      full _redc on a synthetic (W, T) accumulator
  add_f     lazy field add (carry + cond-sub 2p)
  sub_f     field sub (borrow + conditional modulus add-back)

Usage: python experiments/redc_probe.py [T] [NTILES] [names_csv]
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
NC = 4  # field consts


def sync(x):
    np.asarray(jax.device_get(x.ravel()[0:1]))


def conv_u32(a, b):
    acc = jnp.zeros((W, a.shape[1]), jnp.uint32)
    for i in range(L):
        prod = a * b[i : i + 1]
        acc = acc + jnp.pad(prod & LIMB_MASK, ((i, W - i - L), (0, 0)))
        acc = acc + jnp.pad(prod >> LIMB_BITS, ((i + 1, W - i - 1 - L), (0, 0)))
    return acc


def make_chain(body, M):
    def kernel(*args):
        fc = kern.read_consts(args)
        a_ref, b_ref, o_ref = args[NC:]
        a = a_ref[:]
        b = b_ref[:]

        def step(_, x):
            return body(x, b, fc)

        o_ref[:] = jax.lax.fori_loop(0, M, step, a)

    call = pl.pallas_call(
        kernel,
        grid=(NTILES,),
        in_specs=kern.field_const_specs() + [
            pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, B), jnp.uint32),
    )
    fn = jax.jit(call)
    consts = kern.field_const_inputs()
    return lambda a, b: fn(*consts, a, b)


# --------------------------------------------------------------- bodies
def b_mont(x, b, fc):
    return kern._mont_mul(x, b, fc)


def b_conv(x, b, fc):
    return conv_u32(x, b)[:L] & LIMB_MASK


def b_ks(x, b, fc):
    out, over = kern._ks_carry(x + b)
    return out


def b_mm_i8(x, b, fc):
    t8 = jnp.concatenate(
        [x & 0xFF, (x >> 8) & 0xFF, x[: L - 1] >> 8], axis=0
    )
    mc = kern._dot_exact(fc[0], fc[1], t8)   # (2L, T)
    return (mc[:L] + mc[L:]) & LIMB_MASK


def b_qmm_i8(x, b, fc):
    m8 = jnp.concatenate([x & 0xFF, x >> 8], axis=0)
    qc = kern._dot_exact(fc[2], fc[3], m8)   # (4L, T)
    return (qc[:L] + qc[L : 2 * L]) & LIMB_MASK


def b_redc(x, b, fc):
    acc = jnp.pad(x + b, ((0, W - L), (0, 0)))
    return kern._redc(acc, fc)


def b_add(x, b, fc):
    return kern._add_f(x, b)


def b_sub(x, b, fc):
    return kern._sub_f(x, b)


BODIES = {
    "mont": b_mont,
    "conv": b_conv,
    "ks_carry": b_ks,
    "mm_i8": b_mm_i8,
    "qmm_i8": b_qmm_i8,
    "redc": b_redc,
    "add_f": b_add,
    "sub_f": b_sub,
}

rng = np.random.RandomState(0)
a = jnp.asarray(rng.randint(0, 1 << 16, size=(L, B), dtype=np.int64).astype(np.uint32))
b = jnp.asarray(rng.randint(0, 1 << 16, size=(L, B), dtype=np.int64).astype(np.uint32))

names = sys.argv[3].split(",") if len(sys.argv) > 3 else list(BODIES)
for name in names:
    body = BODIES[name]
    try:
        ts = {}
        for M in (1, 129):
            fn = make_chain(body, M)
            o = fn(a, b)
            sync(o)
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                sync(fn(a, b))
                best = min(best, time.perf_counter() - t0)
            ts[M] = best
        per = (ts[129] - ts[1]) / 128
        print(
            f"{name:10s} per-op {per*1e6:8.2f} us, {per/NTILES*1e9:7.1f} ns/tile, "
            f"{B/per/1e6 if per > 0 else float('inf'):9.1f} M elem-ops/s",
            flush=True,
        )
    except Exception as e:
        print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
