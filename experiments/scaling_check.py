"""Scaling-efficiency measurement surface: 1 -> 2 -> 4 -> 8 devices.

Runs the data-parallel MSM on growing virtual CPU meshes with a FIXED
total problem (strong scaling) and records throughput + efficiency
(bench/profile.py scaling_efficiency) to SCALING.json — the BASELINE
>= 80% multi-host target's measurement surface.  On the 1-vCPU box the
virtual devices timeshare one core, so the curve measures the sharding /
collective-layout overhead trend (what the layout adds as D grows), not
real silicon scaling — the same harness on a pod slice records the real
thing.  Timing itself rides bench_kernel (the criterion-loop analog).

Env: BLZ_SCALING_LOGN (default 10), BLZ_SCALING_WIDTHS (default 1,2,4,8).
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import jax.numpy as jnp

from blaze_tpu.bench.profile import bench_kernel, scaling_efficiency
from blaze_tpu.curves import CURVES, Curve
from blaze_tpu.dist import DistributedMSM, make_mesh
from blaze_tpu.fields.mxu import portable_only
from blaze_tpu.oracle import tiled_msm_instance

LOGN = int(os.environ.get("BLZ_SCALING_LOGN", "10"))
WIDTHS = [int(w) for w in os.environ.get("BLZ_SCALING_WIDTHS", "1,2,4,8").split(",")]
ART = "/root/repo/SCALING.json"

spec = CURVES["bn254"]
curve = Curve(spec)
n = 1 << LOGN
points, scalars, _, _ = tiled_msm_instance(spec, n, seed=5)
# 16-bit live scalars: 2 windows at c=8 — keeps the XLA:CPU compile of
# each mesh width tractable while every collective/layout op is real
scal = np.asarray(scalars).copy()
scal[:, 1:] = 0

with portable_only():
    pts_mont = jnp.asarray(np.asarray(curve.fq.to_mont(jnp.asarray(points))))

throughput = {}
stats = {}
for d in WIDTHS:
    mesh = make_mesh({"dp": d})
    dmsm = DistributedMSM(curve, mesh, axis="dp")

    def run(p, s):
        return dmsm(p, s, window_bits=8, scalar_bits=16)

    ks = bench_kernel(run, (pts_mont, jnp.asarray(scal)),
                      name=f"dp{d}", reps=5)
    throughput[d] = n / ks.best_s
    stats[d] = {"best_ms": round(ks.best_s * 1e3, 2),
                "median_ms": round(ks.median_s * 1e3, 2),
                "compile_s": round(ks.compile_s, 1)}
    print(f"dp={d}: {ks.summary()}", flush=True)

eff = scaling_efficiency(throughput)
out = {
    "platform": "cpu-virtual-8",
    "primitive": f"bn254_msm_2^{LOGN}_dp",
    "mode": "strong-scaling (fixed total problem)",
    "throughput_pts_per_s": {str(d): round(v, 1) for d, v in throughput.items()},
    "efficiency_vs_linear": {str(d): round(v, 4) for d, v in eff.items()},
    "per_width": {str(d): v for d, v in stats.items()},
    "note": (
        "virtual devices timeshare one physical core: the efficiency "
        "column measures sharding+collective layout overhead, not "
        "silicon scaling; the >=80% BASELINE target applies to this same "
        "harness on real multi-chip meshes"
    ),
}
with open(ART, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({"scaling": out["efficiency_vs_linear"]}))
