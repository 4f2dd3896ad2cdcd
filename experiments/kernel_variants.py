# SUPERSEDED: written against the round-3 field layer; the round-4 const
# plumbing changed _mont_mul's signature (fc tuple).  Kept as the record
# of earlier probes — use experiments/redc_probe.py / mul_bench.py now.
"""Isolate fused-EC-kernel cost: muls-only vs chained vs glue-only vs full."""
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
from blaze_tpu.fields.mont import Field

T = int(sys.argv[1]) if len(sys.argv) > 1 else 512
NTILES = int(sys.argv[2]) if len(sys.argv) > 2 else 256
spec = CURVES["bls12_381"]
kern = ECKernels.for_curve(spec, tile=T)
L, W = kern.L, kern.W
B = NTILES * T
print(f"L={L} T={T} tiles={NTILES} B={B}", flush=True)

f = Field(spec.fq)
rng = np.random.RandomState(3)
vals = [int(v) % spec.fq.p for v in rng.randint(1, 2**60, size=4)]
a = jnp.broadcast_to(f.from_int(vals[0], ())[:, None], (L, B)).astype(jnp.uint32)
b = jnp.broadcast_to(f.from_int(vals[1], ())[:, None], (L, B)).astype(jnp.uint32)
x = jnp.broadcast_to(f.from_int(vals[2], ())[:, None], (L, B)).astype(jnp.uint32)
y = jnp.broadcast_to(f.from_int(vals[3], ())[:, None], (L, B)).astype(jnp.uint32)

mnp = jnp.asarray(kern._mnp_host, dtype=jnp.bfloat16)
mp = jnp.asarray(kern._mp_host, dtype=jnp.bfloat16)


def make(body_fn, n_in=2):
    def kernel(mnp_ref, mp_ref, *refs):
        ins = [r[:] for r in refs[:n_in]]
        o_ref = refs[n_in]
        o_ref[:] = body_fn(ins, mnp_ref[:], mp_ref[:])

    call = pl.pallas_call(
        kernel,
        grid=(NTILES,),
        in_specs=[
            pl.BlockSpec((2 * L, 3 * W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * L, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM)
            for _ in range(n_in)
        ],
        out_specs=pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, B), jnp.uint32),
    )
    return jax.jit(call)


def sync(x):
    np.asarray(jax.device_get(x.ravel()[0:1]))


REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 20


def bench(name, fn, args, unit_count):
    out = fn(mnp, mp, *args)
    sync(out)
    # amortize tunnel round-trip: queue REPS async dispatches, sync once;
    # slope vs a 1-dispatch run isolates true kernel time
    best1 = bestk = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        sync(fn(mnp, mp, *args))
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        outs = [fn(mnp, mp, *args) for _ in range(REPS)]
        for o in outs:
            o.block_until_ready()
        sync(outs[-1])
        bestk = min(bestk, time.perf_counter() - t0)
    best = max((bestk - best1) / (REPS - 1), 1e-9)
    print(f"{name:26s} {best*1e3:8.2f} ms   "
          f"{unit_count/best/1e6:9.1f} M ops/s", flush=True)
    return out


mm = kern._mont_mul

# 1 mul
bench("mul x1", make(lambda ins, M, P: mm(ins[0], ins[1], M, P)), (a, b), B)

# 11 independent muls (same inputs; XLA may CSE -> use distinct pairs)
def muls11(ins, M, P):
    u, v = ins
    acc = None
    for i in range(11):
        r = mm(u + jnp.uint32(i), v, M, P)
        acc = r if acc is None else acc ^ r
    return acc
bench("mul x11 indep", make(muls11), (a, b), 11 * B)

# 11 chained muls
def chain11(ins, M, P):
    u, v = ins
    for _ in range(11):
        u = mm(u, v, M, P)
    return u
bench("mul x11 chained", make(chain11), (a, b), 11 * B)

# glue ops x15 (adds/subs)
def glue15(ins, M, P):
    u, v = ins
    for i in range(8):
        u = kern._add_f(u, v)
    for i in range(7):
        u = kern._sub_f(u, v)
    return u
bench("addf/subf x15", make(glue15), (a, b), 15 * B)

# full mixed-add body
def mixed(ins, M, P):
    X1, Y1 = ins[0], ins[1]
    Z1, X2 = ins[2], ins[3]
    X3, Y3, Z3 = kern._add_mixed_body(X1, Y1, Z1, X2, Y1, M, P)
    return X3 ^ Y3 ^ Z3
bench("mixed-add body", make(mixed, n_in=4), (a, b, x, y), B)
