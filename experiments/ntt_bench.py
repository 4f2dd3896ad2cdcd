"""Single-chip NTT throughput on TPU (criterion-loop analog,
/root/reference/benches/ntt_bench.rs:33-42)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from blaze_tpu.fields import FIELDS, Field
from blaze_tpu.ntt import make_ntt

name = sys.argv[1] if len(sys.argv) > 1 else "bn254_fr"
logn = int(sys.argv[2]) if len(sys.argv) > 2 else 20
n = 1 << logn
spec = FIELDS[name]
F = Field(spec)
plan = make_ntt(spec, logn)
print(f"{name} 2^{logn} plan={type(plan).__name__}", flush=True)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 65536, size=(n, spec.nlimbs)), dtype=jnp.uint32)
# not canonical field elements, but full-range limbs: fine for timing
x = jax.block_until_ready(x)


def sync(o):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[0:1]))


t0 = time.perf_counter()
out = plan.ntt(x)
sync(out)
print(f"compile+first: {time.perf_counter()-t0:.1f} s", flush=True)

best = 1e9
for _ in range(5):
    t0 = time.perf_counter()
    sync(plan.ntt(x))
    best = min(best, time.perf_counter() - t0)
print(f"fwd: {best*1e3:8.1f} ms  ({n/best/1e6:.2f} Melems/s)", flush=True)
