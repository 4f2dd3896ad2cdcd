"""Break down MSM time by phase on the TPU (new grouped-window engine)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from blaze_tpu.curves import CURVES, Curve
from blaze_tpu.msm import MSM, MSMConfig
from blaze_tpu.oracle import tiled_msm_instance


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1]))


def timeit(fn, *args, iters=3):
    out = fn(*args); sync(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args); sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


logn = int(sys.argv[1]) if len(sys.argv) > 1 else 18
c = int(sys.argv[2]) if len(sys.argv) > 2 else 0
n = 1 << logn
spec = CURVES["bls12_381"]
curve = Curve(spec)
cfg = MSMConfig(chunk_log2=max(logn, 19))
msm = MSM(curve, cfg)
points, scalars, _, _ = tiled_msm_instance(spec, n, seed=123)
pts = curve.fq.to_mont(jnp.asarray(points))
scal = jnp.asarray(scalars)
sync((pts, scal))

from blaze_tpu.msm.pippenger import default_window_bits
c = c or min(cfg.window_bits, default_window_bits(n))
nwin = -(-spec.fr.bits // c)
ngroups = -(-nwin // cfg.group_windows)
G = -(-nwin // ngroups)
print(f"n=2^{logn} c={c} nwin={nwin} groups={ngroups}x{G}")

t0 = time.perf_counter()
out = msm(pts, scal, window_bits=c)
sync(out)
print(f"first call (compile) {time.perf_counter()-t0:9.1f} s")

t = timeit(lambda p, s: msm(p, s, window_bits=c), pts, scal)
print(f"full msm          {t*1e3:9.1f} ms   {n/t/1e3:8.1f} k pts/s")

# phases
digits = msm._digits_jit(scal, c, nwin)
wpad = ngroups * G
if wpad > nwin:
    digits = jnp.pad(digits, ((0, wpad - nwin), (0, 0)))
sync(digits)
t = timeit(lambda s: msm._digits_jit(s, c, nwin), scal)
print(f"digits            {t*1e3:9.1f} ms")

dg = digits[:G]
t = timeit(lambda p, d: msm._scan_phase_jit(p, d, c), pts, dg)
print(f"scan_phase x{ngroups}    {t*1e3:9.1f} ms  (= {t*ngroups*1e3:.0f} total)")

cg, lc, _ = msm._scan_phase_jit(pts, dg, c)
sync((cg, lc))
t = timeit(lambda a, b: msm._bucket_phase_jit(a, b, c), cg, lc)
print(f"bucket_phase x{ngroups}  {t*1e3:9.1f} ms  (= {t*ngroups*1e3:.0f} total)")

wsums = jnp.concatenate(
    [msm._bucket_phase_jit(*msm._scan_phase_jit(pts, digits[g * G:(g + 1) * G], c)[:2], c)
     for g in range(ngroups)], axis=0)[:nwin]
sync(wsums)
t = timeit(lambda w: msm._fold_jit(w, c), wsums)
print(f"fold              {t*1e3:9.1f} ms")
