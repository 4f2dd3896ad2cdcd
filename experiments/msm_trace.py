"""Op-level trace of the fused MSM: capture a jax.profiler trace of one
_msm_fused_jit call and print per-op durations summed by fusion name."""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

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

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 18
n = 1 << logn
spec = CURVES["bls12_381"]
curve = Curve(spec)
msm = MSM(curve, MSMConfig(chunk_log2=max(logn, 20)))
points, scalars, _, _ = tiled_msm_instance(spec, n, seed=123)
pts = curve.fq.to_mont(jnp.asarray(points))
scal = jnp.asarray(scalars)


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1]))


out = msm(pts, scal)
sync(out)

tdir = "/tmp/msm_trace"
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    out = msm(pts, scal)
    sync(out)

# parse the trace
files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
assert files, os.listdir(tdir)
ev = json.load(gzip.open(files[0]))["traceEvents"]

# find TensorCore op events (pid/tid naming varies; take complete events
# with 'dur' on threads whose name mentions XLA/TensorCore Ops)
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        names[(e["pid"], e["tid"])] = e["args"]["name"]

bytime = defaultdict(float)
for e in ev:
    if e.get("ph") != "X":
        continue
    tname = names.get((e.get("pid"), e.get("tid")), "")
    if "XLA Op" in tname or "TensorCore" in tname or "Ops" in tname:
        bytime[(tname, e["name"])] += e.get("dur", 0)

rows = sorted(bytime.items(), key=lambda kv: -kv[1])
tot = sum(v for _, v in rows)
print(f"total traced op-us: {tot:.0f}")
for (tname, name), us in rows[:40]:
    print(f"{us/1e3:9.2f} ms  {us/tot*100:5.1f}%  [{tname}] {name[:110]}")

# persist the per-op breakdown as a committed artifact (the VERDICT ask:
# a captured trace explaining where device time goes)
art = {
    "platform": jax.default_backend(),
    "logn": logn,
    "total_op_us": round(tot, 1),
    "top_ops": [
        {"thread": tname, "op": name[:160], "ms": round(us / 1e3, 3),
         "pct": round(us / tot * 100, 2)}
        for (tname, name), us in rows[:40]
    ],
}
with open("/root/repo/TRACE_MSM.json", "w") as f:
    json.dump(art, f, indent=1)
print("wrote TRACE_MSM.json")
