"""Decompose the fused Montgomery-mul cost into its REDC components.

vpu_mul_probe showed the a*b convolution is ~5% of the kernel (41 ns of
760 ns per tile); this probe times the REDC pieces the other 95% is made
of, chained in-kernel (M=1 vs M=129 slope isolates per-op cost):

  mont        full _mont_mul (baseline)
  conv        u32 product convolution only
  ks_carry    one Kogge-Stone carry normalization of (L, T)
  serial_c    24-step serial (1, T) carry fold (c1 candidate)
  fold1       single value fold of (W, T) columns
  split_bf16  3-plane byte split + i32->bf16 cast of (W, T)
  mm_bf16     the m matmul (2L, 3W) @ (3W, T) in bf16 + f32->u32 back
  mm_i8       same matmul with int8 operands + i32 accumulate
  qmm_bf16    the q matmul (4L, 2L) @ (2L, T) in bf16
  add_f       lazy field add (carry + cond-sub 2p)
  sub_f       field sub (borrow + conditional modulus add-back)

Usage: python experiments/redc_probe.py [T] [NTILES]
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

mnp_h = kern._mnp_host                   # (2L, 3W)
mp_h = kern._mp_host                     # (4L, 2L)


def sync(x):
    np.asarray(jax.device_get(x.ravel()[0:1]))


def conv_u32(a, b):
    acc = jnp.zeros((W, a.shape[1]), jnp.uint32)
    for i in range(L):
        prod = a * b[i : i + 1]
        acc = acc + jnp.pad(prod & LIMB_MASK, ((i, W - i - L), (0, 0)))
        acc = acc + jnp.pad(prod >> LIMB_BITS, ((i + 1, W - i - 1 - L), (0, 0)))
    return acc


def make_chain(body, M, i8=False):
    def kernel(mnp_ref, mp_ref, a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        mnp, mp = mnp_ref[:], mp_ref[:]

        def step(_, x):
            return body(x, b, mnp, mp)

        o_ref[:] = jax.lax.fori_loop(0, M, step, a)

    mdt = jnp.int8 if i8 else jnp.bfloat16
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
    mnp = jnp.asarray(
        (mnp_h - 128.0) if i8 else mnp_h, dtype=mdt
    )
    mp = jnp.asarray((mp_h - 128.0) if i8 else mp_h, dtype=mdt)
    fn = jax.jit(call)
    return lambda a, b: fn(mnp, mp, a, b)


# --------------------------------------------------------------- bodies
def b_mont(x, b, mnp, mp):
    return kern._mont_mul(x, b, mnp, mp)


def b_conv(x, b, mnp, mp):
    return conv_u32(x, b)[:L] & LIMB_MASK


def b_ks(x, b, mnp, mp):
    out, over = kern._ks_carry(x + b)
    return out


def b_serial(x, b, mnp, mp):
    c = jnp.zeros((1, x.shape[1]), jnp.uint32)
    for j in range(L):
        c = (x[j : j + 1] + c) >> LIMB_BITS
    return x + c


def b_fold1(x, b, mnp, mp):
    hi = x >> LIMB_BITS
    v = (x & LIMB_MASK) + jnp.pad(hi, ((1, 0), (0, 0)))[:L]
    return v


def b_split(x, b, mnp, mp):
    t8 = jnp.concatenate(
        [x & 0xFF, (x >> 8) & 0xFF, x >> 16], axis=0
    ).astype(jnp.int32).astype(jnp.bfloat16)
    return t8[:L].astype(jnp.int32).astype(jnp.uint32) + b


def b_mm_bf16(x, b, mnp, mp):
    t8 = jnp.concatenate(
        [x & 0xFF, (x >> 8) & 0xFF, x >> 16], axis=0
    ).astype(jnp.int32).astype(jnp.bfloat16)             # (3W->147, T)? (3L)
    # pad rows to 3W for the matmul input
    t8 = jnp.pad(t8, ((0, 3 * W - 3 * L), (0, 0)))
    m_cols = jnp.dot(mnp, t8, preferred_element_type=jnp.float32)
    mc = m_cols.astype(jnp.int32).astype(jnp.uint32)     # (2L, T)
    return mc[:L] + mc[L:]


def b_mm_i8(x, b, mnp, mp):
    # centered int8 operand + ones-row correction (exact i32 accumulation)
    t8 = (
        jnp.concatenate([x & 0xFF, (x >> 8) & 0xFF, x >> 16], axis=0)
        .astype(jnp.int32) - 128
    ).astype(jnp.int8)
    t8 = jnp.pad(t8, ((0, 3 * W - 3 * L), (0, 0)), constant_values=-128)
    m_cols = jnp.dot(mnp, t8, preferred_element_type=jnp.int32)
    mc = m_cols.astype(jnp.uint32)                       # (2L, T)
    return mc[:L] + mc[L:]


def b_qmm_bf16(x, b, mnp, mp):
    m8 = jnp.concatenate([x & 0xFF, x >> 8], axis=0).astype(
        jnp.int32).astype(jnp.bfloat16)                  # (2L, T)
    q_cols = jnp.dot(mp, m8, preferred_element_type=jnp.float32)
    qc = q_cols.astype(jnp.int32).astype(jnp.uint32)     # (4L, T)
    return qc[:L] + qc[L : 2 * L]


def b_add(x, b, mnp, mp):
    return kern._add_f(x, b)


def b_sub(x, b, mnp, mp):
    return kern._sub_f(x, b)


BODIES = {
    "mont": (b_mont, False),
    "conv": (b_conv, False),
    "ks_carry": (b_ks, False),
    "serial_c": (b_serial, False),
    "fold1": (b_fold1, False),
    "split_bf16": (b_split, False),
    "mm_bf16": (b_mm_bf16, False),
    "mm_i8": (b_mm_i8, True),
    "qmm_bf16": (b_qmm_bf16, False),
    "add_f": (b_add, False),
    "sub_f": (b_sub, False),
}

rng = np.random.RandomState(0)
a = jnp.asarray(rng.randint(0, 1 << 16, size=(L, B), dtype=np.int64).astype(np.uint32))
b = jnp.asarray(rng.randint(0, 1 << 16, size=(L, B), dtype=np.int64).astype(np.uint32))

names = sys.argv[3].split(",") if len(sys.argv) > 3 else list(BODIES)
for name in names:
    body, i8 = BODIES[name]
    try:
        ts = {}
        for M in (1, 129):
            fn = make_chain(body, M, i8)
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
