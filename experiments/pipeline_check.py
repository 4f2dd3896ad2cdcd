"""Proof-gen pipeline on the real TPU: NTT 2^27 -> MSM 2^24 (config 5).

Delta-function coefficients make the flow oracle-checkable at full
scale: NTT(delta_1)[t] = W^t, so the MSM scalars are the geometric
sequence W^i and the expected point over period-tiled bases has a
closed form (blaze_tpu.pipeline.geometric_msm_oracle) — a 256-point
host MSM checks a 2^24-point device result.

The coefficient buffer is built ON DEVICE (a one-hot), so iteration
cost is pure pipeline: NTT (blocked u16, donated) -> spectral slice ->
lanes-major scalars -> chunked fused MSM, 2-deep across batches.

Writes PIPELINE_TPU.json.  Env: BLZ_PIPE_NTT (27), BLZ_PIPE_MSM (24),
BLZ_PIPE_BATCHES (3).
"""
import json
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

from blaze_tpu.curves import CURVES, Curve
from blaze_tpu.msm import MSMConfig, points_to_resident
from blaze_tpu.oracle import tiled_msm_instance
from blaze_tpu.pipeline import ProofPipeline, geometric_msm_oracle
from blaze_tpu.utils.misc import hard_sync

assert jax.default_backend() == "tpu", jax.default_backend()

NTT_LOGN = int(os.environ.get("BLZ_PIPE_NTT", "27"))
MSM_LOGN = int(os.environ.get("BLZ_PIPE_MSM", "24"))
BATCHES = int(os.environ.get("BLZ_PIPE_BATCHES", "3"))
ART = "/root/repo/PIPELINE_TPU.json"

spec = CURVES["bls12_381"]
curve = Curve(spec)
n_msm = 1 << MSM_LOGN

print(f"pipeline: NTT 2^{NTT_LOGN} -> MSM 2^{MSM_LOGN}, {BATCHES} batches",
      flush=True)

# ---- bases: period-256 tiling (the reference's own large-size trick)
points, _, _, dbg = tiled_msm_instance(spec, 256, seed=123)
idx = np.arange(n_msm) % 256
pts_res = points_to_resident(curve, jnp.asarray(points[idx]))
hard_sync(pts_res)
print("bases resident", flush=True)

# chunk 2^19 by default: the 2-deep pipeline holds TWO 4 GiB NTT
# buffers in flight next to one MSM chunk's transients and the 1.6 GiB
# base residency — a 2^20 chunk's ~4 GiB transients push the peak past
# a 16 GiB chip (measured RESOURCE_EXHAUSTED)
CHUNK = int(os.environ.get("BLZ_PIPE_CHUNK", "19"))
pipe = ProofPipeline(curve, NTT_LOGN, MSM_LOGN,
                     config=MSMConfig(chunk_log2=CHUNK))
L = spec.fr.nlimbs
rows = (1 << NTT_LOGN) // 128


@jax.jit
def make_delta():
    # delta at element index 1 -> blocked[0, limb 0, lane 1] = 1
    z = jnp.zeros((rows, L, 128), jnp.uint16)
    return z.at[0, 0, 1].set(1)


def batches():
    for _ in range(BATCHES):
        yield make_delta()


t0 = time.perf_counter()
outs = []
stamps = []
for out in pipe.run_batches(batches(), pts_res):
    stamps.append(time.perf_counter() - t0)
    outs.append(np.asarray(out))
total = time.perf_counter() - t0
per_batch = (stamps[-1] - stamps[0]) / max(len(stamps) - 1, 1) \
    if len(stamps) > 1 else total

# ---- oracle
w = spec.fr.root_of_unity(NTT_LOGN)
expected = geometric_msm_oracle(spec, 256, n_msm, w, dbg["points"])
ok = True
for i, o in enumerate(outs):
    aff = curve.to_affine(jnp.asarray(o)[None])[0]
    got = (curve.fq.to_int(aff[0]), curve.fq.to_int(aff[1]))
    if got != expected:
        ok = False
        print(f"batch {i}: MISMATCH {got} != {expected}", flush=True)
if ok:
    print(f"all {len(outs)} batch results oracle-exact", flush=True)


def _git_rev():
    import subprocess
    try:
        return subprocess.run(
            ["git", "-C", "/root/repo", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        return "unknown"

rec = {
    "git_rev": _git_rev(),
    "ntt_logn": NTT_LOGN,
    "msm_logn": MSM_LOGN,
    "batches": BATCHES,
    "total_s": round(total, 3),
    "steady_s_per_batch": round(per_batch, 3),
    "batch_stamps_s": [round(s, 3) for s in stamps],
    "oracle": "exact" if ok else "MISMATCH",
    "curve": spec.name,
}
old = {}
if os.path.exists(ART):
    try:
        old = json.load(open(ART))
    except Exception:
        old = {}
old[f"ntt2^{NTT_LOGN}_msm2^{MSM_LOGN}"] = rec
with open(ART, "w") as f:
    json.dump(old, f, indent=1)
print(json.dumps(rec), flush=True)
sys.exit(0 if ok else 1)
