"""Window-size sweep for the fused MSM chunk (scan vs bucket-tail tradeoff)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from blaze_tpu.curves import CURVES, Curve
from blaze_tpu.msm import MSM, MSMConfig
from blaze_tpu.oracle import tiled_msm_instance

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
n = 1 << logn
spec = CURVES["bls12_381"]
curve = Curve(spec)

points, scalars, _, _ = tiled_msm_instance(spec, n, seed=3)
m = curve.fq.to_mont(jnp.asarray(points))
a = jnp.moveaxis(m, 0, -1)
pts = a[0] | (a[1] << 16)
scal = jnp.asarray(np.ascontiguousarray(np.asarray(scalars).T), jnp.uint16)


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1]))


msm = MSM(curve, MSMConfig(chunk_log2=max(logn, 20)))
for c in (14, 15, 16):
    fn = lambda p, s: msm._msm_fused_jit(p, s, c, None, True)
    sync(fn(pts, scal))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fn(pts, scal))
        best = min(best, time.perf_counter() - t0)
    print(f"c={c}: {best*1e3:8.1f} ms  ({n/best/1e6:.2f} Mpts/s)", flush=True)
