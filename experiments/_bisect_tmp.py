"""Bisect the distinct-scalar MSM mismatch on chip.

Configs sweep size and scalar family; every expected value is computed
with ECOracle over the 256 point classes with DIRECT coefficient sums
(no closed form), so the oracle itself is beyond doubt.
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np
import jax.numpy as jnp

from blaze_tpu.curves import CURVES, Curve
from blaze_tpu.msm import MSM, MSMConfig, points_to_resident, scalars_to_resident
from blaze_tpu.oracle import ECOracle, tiled_msm_instance

spec = CURVES["bls12_381"]
curve = Curve(spec)
fr = spec.fr
L = fr.nlimbs
oracle = ECOracle(spec)

points, _, _, dbg = tiled_msm_instance(spec, 256, seed=123)
upoints = dbg["points"]
w = fr.root_of_unity(24)


def scal_limbs(vals):
    out = np.zeros((len(vals), L), np.uint32)
    for i, v in enumerate(vals):
        for l in range(L):
            out[i, l] = (v >> (16 * l)) & 0xFFFF
    return out


def expected_for(vals):
    coeffs = [0] * 256
    for i, v in enumerate(vals):
        coeffs[i % 256] = (coeffs[i % 256] + v) % fr.p
    return oracle.msm(upoints, coeffs)


def run(tag, logn, chunk_log2, vals):
    n = len(vals)
    idx = np.arange(n) % 256
    pts_res = points_to_resident(curve, jnp.asarray(points[idx]))
    s = jnp.asarray(scalars_to_resident(scal_limbs(vals)))
    msm = MSM(curve, MSMConfig(chunk_log2=chunk_log2))
    out = msm(pts_res, s)
    aff = curve.to_affine(out[None])[0]
    got = (curve.fq.to_int(aff[0]), curve.fq.to_int(aff[1]))
    exp = expected_for(vals)
    print(f"{tag} n=2^{logn} chunk=2^{chunk_log2}:",
          "OK" if got == exp else "MISMATCH", flush=True)
    return got == exp


import random

rng = random.Random(7)
for logn, ch in [(16, 19), (18, 19), (20, 19), (22, 19)]:
    n = 1 << logn
    wvals = [pow(w, i, fr.p) for i in range(n)]
    run("w^i   ", logn, ch, wvals)
    rvals = [rng.randrange(fr.p) for _ in range(n)]
    run("random", logn, ch, rvals)
EOF_MARKER_NOT_USED = None
