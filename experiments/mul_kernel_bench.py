# SUPERSEDED: written against the round-3 field layer; the round-4 const
# plumbing changed _mont_mul's signature (fc tuple).  Kept as the record
# of earlier probes — use experiments/redc_probe.py / mul_bench.py now.
"""In-kernel field-op THROUGHPUT costs on TPU, by marginal slope.

The first version chained R dependent ops over 8K lanes — latency-bound:
every variant (full mul, conv alone, REDC alone, add alone) measured the
same ~0.85 ms/op because serial dependency + dispatch dominated.  Here:

  * S independent streams (ILP for the VLIW scheduler),
  * wide lanes (throughput regime),
  * cost = slope between R and R/2 repetitions (subtracts fixed overhead).

Variants: full (_mont_mul), conv (VPU limb conv only), redc (MXU REDC
only), addf (KS-carry field add), mulraw (conv+fold, no REDC).
Prints ns/element marginal cost per variant.

Env: BLZ_MB_LANES (default 32768), BLZ_MB_STREAMS (4), BLZ_MB_R (8).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blaze_tpu.fields import FIELDS
from blaze_tpu.fields.kernel_ops import PallasFieldOps
from blaze_tpu.fields.spec import LIMB_BITS, LIMB_MASK

assert jax.default_backend() == "tpu"

SPEC = FIELDS[os.environ.get("BLZ_MB_FIELD", "bls12_381_fr")]
LANES = int(os.environ.get("BLZ_MB_LANES", "32768"))
S = int(os.environ.get("BLZ_MB_STREAMS", "4"))
RMAX = int(os.environ.get("BLZ_MB_R", "8"))
ops = PallasFieldOps(SPEC, lazy=False)
L, W = ops.L, ops.W


def conv_loop(a, b):
    acc = jnp.zeros((W, a.shape[-1]), jnp.uint32)
    for i in range(L):
        prod = a[i : i + 1, :] * b
        acc = acc + jnp.pad(prod & LIMB_MASK, ((i, W - i - L), (0, 0)))
        acc = acc + jnp.pad(prod >> LIMB_BITS, ((i + 1, W - i - 1 - L), (0, 0)))
    return acc


def body(kind, x, y, mnp, mp):
    if kind == "full":
        return ops._mont_mul(x, y, mnp, mp)
    if kind == "conv":
        acc = conv_loop(x, y)
        return (acc[:L] + acc[L : 2 * L]) & LIMB_MASK
    if kind == "redc":
        acc = jnp.pad(x + y, ((0, W - L), (0, 0)))
        return ops._redc(acc, mnp, mp)
    if kind == "addf":
        return ops._add_f(x, y)
    raise ValueError(kind)


def make_fn(kind, R):
    def kernel(mnp_ref, mp_ref, x_ref, y_ref, o_ref):
        mnp, mp = mnp_ref[:], mp_ref[:]
        y = y_ref[:]
        xs = [x_ref[:, s * LANES : (s + 1) * LANES] for s in range(S)]
        for _ in range(R):
            xs = [body(kind, x, y[:, : x.shape[-1]], mnp, mp) for x in xs]
        o_ref[:] = jnp.concatenate(xs, axis=1)

    return jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, S * LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
    ))


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out[0, 0:1])
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[0, 0:1])
        best = min(best, time.perf_counter() - t0)
    return best


mnp = jnp.asarray(ops._mnp_host, dtype=jnp.bfloat16)
mp = jnp.asarray(ops._mp_host, dtype=jnp.bfloat16)
rng = np.random.default_rng(3)
x = jnp.asarray(rng.integers(0, 1 << 15, size=(L, S * LANES), dtype=np.uint32))
y = jnp.asarray(rng.integers(0, 1 << 15, size=(L, LANES), dtype=np.uint32))

for kind in ("full", "conv", "redc", "addf"):
    try:
        t_hi = timed(make_fn(kind, RMAX), mnp, mp, x, y)
        t_lo = timed(make_fn(kind, RMAX // 2), mnp, mp, x, y)
        slope = (t_hi - t_lo) / ((RMAX - RMAX // 2) * S * LANES)
        print(f"{kind:5s}: R={RMAX} {t_hi*1e3:7.2f} ms, R={RMAX//2} "
              f"{t_lo*1e3:7.2f} ms -> {slope*1e9:6.2f} ns/elem marginal "
              f"({1/slope/1e6:6.1f} M elem-ops/s)", flush=True)
    except Exception as e:
        print(f"{kind}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
