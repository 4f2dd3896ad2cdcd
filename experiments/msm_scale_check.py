"""MSM at reference-max scale on the real TPU: 2^24 and 2^26 (the
reference's largest tested size, integration_msm.rs:389,574), lanes-major
residency, fused path, ORACLE-EXACT — the tiled-instance trick makes the
expected value cheap at any size (tests/msm/mod.rs:23-31).

Writes MSM_TPU.json (driver-visible artifact).

Env: BLZ_MSM_SIZES (csv logn, default "24,26"), BLZ_MSM_ITERS (default 2),
BLZ_MSM_CURVE (default bls12_381).
"""
import gc
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
from blaze_tpu.msm import MSM, MSMConfig, points_to_resident, scalars_to_resident
from blaze_tpu.oracle import tiled_msm_instance
from blaze_tpu.utils.misc import hard_sync

assert jax.default_backend() == "tpu", jax.default_backend()

SIZES = [int(s) for s in os.environ.get("BLZ_MSM_SIZES", "24,26").split(",")]
ITERS = int(os.environ.get("BLZ_MSM_ITERS", "2"))
CURVE = os.environ.get("BLZ_MSM_CURVE", "bls12_381")

ART = "/root/repo/MSM_TPU.json"

def _git_rev():
    import subprocess
    try:
        return subprocess.run(
            ["git", "-C", "/root/repo", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        return "unknown"

results = {"curve": CURVE, "git_rev": _git_rev(), "runs": {}}
if os.path.exists(ART):
    try:
        old = json.load(open(ART))
        if old.get("curve") == CURVE:
            results["runs"] = old.get("runs", {})
    except Exception:
        pass

spec = CURVES[CURVE]
curve = Curve(spec)
fails = 0


def save():
    with open(ART, "w") as f:
        json.dump(results, f, indent=1)


def stage_points(curve, points):
    """Residency staging bounded to ~one slice of transient HBM: a
    preallocated (L, N) u32 buffer filled by donated dynamic updates (the
    naive concat doubles the 6 GiB footprint at 2^26 -> ResourceExhausted)."""
    from blaze_tpu.msm.residency import _SLICE, _conv_fn

    conv = _conv_fn(curve, False)
    n = points.shape[0]
    L = curve.nlimbs
    buf = jnp.zeros((L, n), jnp.uint32)

    upd = jax.jit(
        lambda b, part, lo: jax.lax.dynamic_update_slice(b, part, (0, lo)),
        donate_argnums=0,
    )
    for lo in range(0, n, _SLICE):
        part = conv(jnp.asarray(points[lo : lo + _SLICE]))
        buf = upd(buf, part, jnp.int32(lo))
    return buf


def run_size(logn):
    global fails
    n = 1 << logn
    # chunk 2^19 above 2^24: the per-chunk gather/emit transients of a
    # 2^20 chunk (~8 GiB) plus 8 GiB of 2^26 residency exceed v5e HBM
    msm = MSM(curve, MSMConfig(chunk_log2=min(logn, 20 if logn <= 24 else 19)))
    print(f"2^{logn}: generating tiled instance...", flush=True)
    points, scalars, exp_aff, _ = tiled_msm_instance(spec, n, seed=1000 + logn)
    print(f"2^{logn}: staging residency...", flush=True)
    pts = stage_points(curve, points)
    scal = jnp.asarray(scalars_to_resident(scalars))
    del points, scalars
    gc.collect()
    hard_sync((pts, scal))

    print(f"2^{logn}: warmup/compile...", flush=True)
    out = msm(pts, scal)
    hard_sync(out)

    # correctness: fold result vs the tiled oracle expectation
    aff = curve.to_affine(out[None])[0]
    got = (curve.fq.to_int(aff[0]), curve.fq.to_int(aff[1]))
    ok = got == exp_aff and bool(np.asarray(curve.on_curve(out[None]))[0])
    fails += not ok
    print(f"2^{logn}: oracle {'OK' if ok else 'FAIL'}", flush=True)

    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = msm(pts, scal)
        hard_sync(out)
        best = min(best, time.perf_counter() - t0)
    pps = n / best
    results["runs"][f"2^{logn}"] = {
        "points_per_s": round(pps, 1),
        "ms": round(best * 1e3, 2),
        "oracle_exact": ok,
    }
    save()
    print(f"2^{logn}: {best*1e3:.0f} ms = {pps/1e6:.3f} M pts/s", flush=True)
    del pts, scal, out
    gc.collect()


for logn in SIZES:
    # one size failing (e.g. full residency exceeding this chip's HBM at
    # 2^26) must not take down the others or the streamed pass below
    try:
        run_size(logn)
    except Exception as e:
        fails += 1
        results["runs"][f"2^{logn}"] = {"error": f"{type(e).__name__}: {e}"[:300]}
        save()
        print(f"2^{logn}: FAILED {type(e).__name__}", flush=True)
        gc.collect()

# ---- streamed-client pass at the largest size (msm_api.rs:156-217
# parity: the task is queued first, then 2^20-point chunks are staged and
# consumed as they arrive).  Two wins over full residency: the
# host->device copy of chunk k+1 overlaps compute of chunk k, and the
# full operand set is never resident — so the efficient 2^20 chunk fits
# at 2^26 (full residency forced chunk_log2=19 there: the 1.33 -> 1.16
# M pts/s drop).  Timed region INCLUDES all staging: this is end-to-end
# client throughput.
def run_streamed(logn):
    global fails
    from blaze_tpu.runtime.clients import MSMClient, MSMInit, MSMInput, MSMParams
    n = 1 << logn
    chunk = 1 << 20
    print(f"stream 2^{logn}: generating tiled instance...", flush=True)
    points, scalars, exp_aff, _ = tiled_msm_instance(spec, n, seed=1000 + logn)
    cl = MSMClient(MSMInit(curve=CURVE),
                   config=MSMConfig(chunk_log2=20))
    cl.initialize(MSMParams(nof_elements=n))

    def run_stream():
        t0 = time.perf_counter()
        cl.start_process()
        for lo in range(0, n, chunk):
            cl.set_data(MSMInput(scalars=scalars[lo : lo + chunk],
                                 points=points[lo : lo + chunk]))
        cl.wait_result()
        return time.perf_counter() - t0

    dt = run_stream()                     # warmup/compile
    res = cl.result()
    from blaze_tpu.curves import decode_projective_result
    from blaze_tpu.fields import limbs_to_int

    proj = decode_projective_result(res.result, spec)
    x, y, z = (limbs_to_int(proj[i]) for i in range(3))
    zinv = pow(z, -1, spec.fq.p)
    got = (x * zinv % spec.fq.p, y * zinv % spec.fq.p)
    ok = got == exp_aff
    fails += not ok
    print(f"stream 2^{logn}: oracle {'OK' if ok else 'FAIL'} "
          f"(warm {dt:.1f}s)", flush=True)
    best = float("inf")
    for _ in range(ITERS):
        dt = run_stream()
        cl.result()
        best = min(best, dt)
    results["runs"][f"2^{logn}_streamed"] = {
        "points_per_s": round(n / best, 1),
        "ms": round(best * 1e3, 2),
        "oracle_exact": ok,
        "chunk_log2": 20,
        "staging": "in-band (overlapped)",
    }
    save()
    print(f"stream 2^{logn}: {best*1e3:.0f} ms = {n/best/1e6:.3f} M pts/s",
          flush=True)

if os.environ.get("BLZ_MSM_STREAM", "1") == "1":
    try:
        run_streamed(max(SIZES))
    except Exception as e:
        fails += 1
        results["runs"][f"2^{max(SIZES)}_streamed"] = {
            "error": f"{type(e).__name__}: {e}"[:300]
        }
        save()
        print(f"stream: FAILED {type(e).__name__}", flush=True)

results["ok"] = fails == 0
with open(ART, "w") as f:
    json.dump(results, f, indent=1)
print("ALL-OK" if fails == 0 else f"FAILURES: {fails}")
sys.exit(1 if fails else 0)
