"""In-kernel Montgomery-mul cost breakdown + conv variants, on TPU.

Times chained in-kernel ops (R dependent iterations inside one
pallas_call) so dispatch overhead amortizes out:

  full    — current _mont_mul (pad/add conv + MXU REDC)
  conv0   — conv loop only (current)
  conv1   — shear-reshape conv (outer product + sublane shear)
  redc    — _redc only
  addf    — field add (KS carry) only

Prints ns/op per variant at wave = LANES lanes.
"""
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
from blaze_tpu.fields.spec import LIMB_BITS, LIMB_MASK, int_to_limbs

assert jax.default_backend() == "tpu"

SPEC = FIELDS["bls12_381_fr"]
L = SPEC.nlimbs
W = 2 * L + 1
LANES = 8192
R = 32
ops = PallasFieldOps(SPEC, lazy=False)


def conv_shear(a, b):
    """Outer product + sublane shear-reshape. a, b: (L, T) u32."""
    T = a.shape[-1]
    prod = a[:, None, :] * b[None, :, :]          # (La=i, Lb=j, T)
    lo = prod & LIMB_MASK
    hi = prod >> LIMB_BITS
    # row j gets lo at offset 0, hi at offset 1 along the i axis? shear
    # over j: column k = i + j. rows indexed by j, width along i.
    rows = jnp.pad(lo, ((0, 1), (0, 0), (0, 0))) + jnp.pad(
        hi, ((1, 0), (0, 0), (0, 0))
    )                                             # (L+1, L, T) over i'
    # shear along j: out[k] = sum_j rows[k - j, j]
    Wp = W + 1
    rows = jnp.pad(rows, ((0, Wp - (L + 1)), (0, 0), (0, 0)))  # (Wp, L, T)
    # transpose j to front: (L, Wp, T), flatten, truncate, reshape (L, W, T)
    rj = jnp.swapaxes(rows, 0, 1)                 # (L, Wp, T)
    flat = rj.reshape(L * Wp, T)[: L * W]
    sheared = flat.reshape(L, W, T)               # row j shifted by j
    return jnp.sum(sheared.astype(jnp.int32), axis=0).astype(jnp.uint32)


def conv_loop(a, b):
    T = a.shape[-1]
    acc = jnp.zeros((W, T), jnp.uint32)
    for i in range(L):
        prod = a[i : i + 1, :] * b
        acc = acc + jnp.pad(prod & LIMB_MASK, ((i, W - i - L), (0, 0)))
        acc = acc + jnp.pad(prod >> LIMB_BITS, ((i + 1, W - i - 1 - L), (0, 0)))
    return acc


def make_kernel(kind):
    def kernel(mnp_ref, mp_ref, x_ref, y_ref, o_ref):
        mnp, mp = mnp_ref[:], mp_ref[:]
        x = x_ref[:]
        y = y_ref[:]
        for _ in range(R):
            if kind == "full":
                x = ops._mont_mul(x, y, mnp, mp)
            elif kind == "conv0":
                acc = conv_loop(x, y)
                x = (acc[:L] + acc[L : 2 * L]) & LIMB_MASK
            elif kind == "conv1":
                acc = conv_shear(x, y)
                x = (acc[:L] + acc[L : 2 * L]) & LIMB_MASK
            elif kind == "redc":
                acc = jnp.pad(x + y, ((0, W - L), (0, 0)))
                x = ops._redc(acc, mnp, mp)
            elif kind == "addf":
                x = ops._add_f(x, y)
        o_ref[:] = x

    return kernel


def bench(kind):
    mnp = jnp.asarray(ops._mnp_host, dtype=jnp.bfloat16)
    mp = jnp.asarray(ops._mp_host, dtype=jnp.bfloat16)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 1 << 15, size=(L, LANES), dtype=np.uint32))
    y = jnp.asarray(rng.integers(0, 1 << 15, size=(L, LANES), dtype=np.uint32))
    fn = jax.jit(pl.pallas_call(
        make_kernel(kind),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    ))
    out = fn(mnp, mp, x, y)
    np.asarray(out[0, 0:1])  # sync
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(mnp, mp, x, y)
        np.asarray(out[0, 0:1])
        best = min(best, time.perf_counter() - t0)
    per_op = best / (R * LANES)
    print(f"{kind:6s}: {best*1e3:7.3f} ms total, {per_op*1e9:7.2f} ns/op-lane "
          f"-> {1/per_op/1e6:7.1f} M ops/s", flush=True)


for kind in ("full", "conv0", "conv1", "redc", "addf"):
    try:
        bench(kind)
    except Exception as e:
        print(f"{kind}: FAILED {type(e).__name__}: {str(e)[:200]}")
