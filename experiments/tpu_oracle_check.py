"""Correctness check of the fused TPU MSM path against the CPU oracle.

Small-N end-to-end checks across window widths, exercising every fused
kernel (scan, reduce, dbl_n, fold_horner) plus the precompute mode, for
all three reference curves (msm_cfg.rs:44-92).  Writes ORACLE_TPU.json
(driver-visible artifact proving the fused path was green this round).
"""
import json
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

assert jax.default_backend() == "tpu", jax.default_backend()


def affine_of(curve, result):
    got_aff = curve.to_affine(result[None])[0]
    if np.asarray(curve.is_identity(result[None]))[0]:
        return None
    assert np.asarray(curve.on_curve(result[None]))[0], "off curve!"
    return (curve.fq.to_int(got_aff[0]), curve.fq.to_int(got_aff[1]))


fails = 0
cases = []


def record(name, ok):
    global fails
    cases.append({"case": name, "ok": bool(ok)})
    fails += not ok
    print(f"{name}: {'OK' if ok else 'FAIL'}", flush=True)


for curve_name in ("bls12_381", "bls12_377", "bn254"):
    spec = CURVES[curve_name]
    curve = Curve(spec)
    for n, c in ((64, 4), (256, 8), (1024, 15)):
        msm = MSM(curve, MSMConfig(fused="on"))
        points, scalars, exp_aff, _ = tiled_msm_instance(spec, n, seed=n + c)
        pts = curve.fq.to_mont(jnp.asarray(points))
        out = msm(pts, jnp.asarray(scalars), window_bits=c)
        record(f"{curve_name} n={n} c={c}", affine_of(curve, out) == exp_aff)

# precompute mode (factor 8) on the fused path
spec = CURVES["bls12_381"]
curve = Curve(spec)
msm = MSM(curve, MSMConfig(fused="on"))
n = 128
points, scalars, exp_aff, _ = tiled_msm_instance(spec, n, seed=99)
pts = curve.fq.to_mont(jnp.asarray(points))
exp_pts = precompute_points(curve, pts, 8)
out = msm.msm_precomputed(exp_pts, jnp.asarray(scalars), 8)
record(f"bls12_381 precompute8 n={n}", affine_of(curve, out) == exp_aff)

# lanes-major xy-packed residency (the bench layout): (L, N) u32 points,
# (Ls, N) u16 scalars, including the chunked-accumulation path
for curve_name in ("bls12_381", "bls12_377", "bn254"):
    spec = CURVES[curve_name]
    curve = Curve(spec)
    L = spec.fq.nlimbs
    for n, c, chunk in ((256, 8, 20), (1024, 15, 20), (1024, 8, 8)):
        msm = MSM(curve, MSMConfig(fused="on", chunk_log2=chunk))
        points, scalars, exp_aff, _ = tiled_msm_instance(spec, n, seed=n + c)
        m = curve.fq.to_mont(jnp.asarray(points))
        a = jnp.moveaxis(m, 0, -1)
        pts_lm = a[0] | (a[1] << 16)                     # (L, N) u32
        scal_lm = jnp.asarray(
            np.ascontiguousarray(np.asarray(scalars).T), dtype=jnp.uint16
        )
        out = msm(pts_lm, scal_lm, window_bits=c)
        record(f"{curve_name} lanes-major n={n} c={c} chunk=2^{chunk}",
               affine_of(curve, out) == exp_aff)

with open("/root/repo/ORACLE_TPU.json", "w") as f:
    json.dump({"backend": jax.default_backend(),
               "device": str(jax.devices()[0].device_kind),
               "when": time.strftime("%Y-%m-%d %H:%M:%S"),
               "cases": cases, "ok": fails == 0}, f, indent=1)
print("ALL-OK" if fails == 0 else f"FAILURES: {fails}")
sys.exit(1 if fails else 0)
