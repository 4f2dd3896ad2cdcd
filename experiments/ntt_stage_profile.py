"""Per-stage timing of the fused NTT at big sizes: where do 2^26/2^27
lose ~45% per-element throughput vs 2^24?

Times, at one size, separate jits of:
  base0     — depth-0 base kernel alone (A-point NTTs over C lanes)
  twid0     — depth-0 inter-level twiddle application alone
  tposeA    — the (A, L, C) -> (C, L, A) inter-level transpose alone
  full      — ntt16b end to end

Env: BLZ_NTT_LOGN (default 26), BLZ_NTT_ITERS (default 3).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import jax.numpy as jnp

from blaze_tpu.fields import FIELDS
from blaze_tpu.ntt import FusedNTT
from blaze_tpu.utils.misc import hard_sync

assert jax.default_backend() == "tpu"

LOGN = int(os.environ.get("BLZ_NTT_LOGN", "26"))
ITERS = int(os.environ.get("BLZ_NTT_ITERS", "3"))
SPEC = FIELDS["bls12_381_fr"]
L = SPEC.nlimbs

fused = FusedNTT(SPEC, LOGN)
a = fused.parts[0]
A = 1 << a
C = fused.n >> a
print(f"2^{LOGN} parts={fused.parts} A={A} C={C}", flush=True)

rng = np.random.default_rng(1)
x = rng.integers(0, 1 << 16, size=(A, L, C), dtype=np.uint16)
x[:, -1, :] &= 0x3FFF


def bench(name, fn, *args):
    out = fn(*args)
    hard_sync(out)
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = fn(*args)
        hard_sync(out)
        best = min(best, time.perf_counter() - t0)
    n = fused.n
    print(f"{name}: {best*1e3:7.1f} ms  ({best/n*1e9:.2f} ns/elem)", flush=True)
    del out
    return best


xd = jnp.asarray(x)
hard_sync(xd)

base0 = jax.jit(lambda v: fused._base(v, a, False))
t_base = bench("base0 ", base0, xd)

twid0 = jax.jit(lambda v: fused._apply_twiddle(v, 0, 1, False))
t_twid = bench("twid0 ", twid0, xd)

tpose = jax.jit(
    lambda v: v.reshape(A, L, C, 1).transpose(2, 1, 0, 3).reshape(C, L, A)
)
t_tp = bench("tposeA", tpose, xd)

del xd
xb = jnp.asarray(
    rng.integers(0, 1 << 16, size=(fused.n // 128, L, 128), dtype=np.uint16)
)
# keep < p
full = fused.ntt16b
t_full = bench("full  ", full, xb)

lv = len(fused.parts)
print(f"\nmodel: {lv} levels; level0 base+twid+tpose = "
      f"{(t_base + t_twid + t_tp)*1e3:.0f} ms; "
      f"x{lv} ~= {(t_base + t_twid + t_tp)*lv*1e3:.0f} ms vs full "
      f"{t_full*1e3:.0f} ms", flush=True)
