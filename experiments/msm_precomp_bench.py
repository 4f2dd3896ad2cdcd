"""Throughput of the precompute-x8 MSM mode vs the plain mode."""
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
from blaze_tpu.msm.precompute import precompute_points
from blaze_tpu.oracle import tiled_msm_instance

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 18
factor = int(sys.argv[2]) if len(sys.argv) > 2 else 8
n = 1 << logn
spec = CURVES["bls12_381"]
curve = Curve(spec)
msm = MSM(curve, MSMConfig(chunk_log2=max(logn + 3, 21)))

points, scalars, _, _ = tiled_msm_instance(spec, n, seed=123)
pts = curve.fq.to_mont(jnp.asarray(points))
scal = jnp.asarray(scalars)


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1]))


exp_pts = precompute_points(curve, pts, factor)
sync(exp_pts)
print(f"expanded: {exp_pts.shape} ({exp_pts.nbytes/1e6:.0f} MB)", flush=True)

t0 = time.perf_counter()
out = msm.msm_precomputed(exp_pts, scal, factor)
sync(out)
print(f"compile+run: {time.perf_counter()-t0:.1f} s", flush=True)

best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    out = msm.msm_precomputed(exp_pts, scal, factor)
    sync(out)
    best = min(best, time.perf_counter() - t0)
print(f"precomp x{factor} msm 2^{logn}: {best*1e3:.1f} ms  "
      f"{n/best/1e3:.1f} k pts/s")
