"""Break down MSM 2^18 time by phase on the TPU."""
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
lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 0
n = 1 << logn
spec = CURVES["bls12_381"]
curve = Curve(spec)
msm = MSM(curve, MSMConfig(chunk_log2=max(logn, 20), scan_lanes=lanes))
points, scalars, _, _ = tiled_msm_instance(spec, n, seed=123)
pts = curve.fq.to_mont(jnp.asarray(points))
scal = jnp.asarray(scalars)
sync((pts, scal))

c = 16
nwin = -(-255 // c)
print(f"n=2^{logn} c={c} nwin={nwin} lanes={lanes or 'auto'}")

# full
t = timeit(jax.jit(lambda p, s: msm._msm_jit(p, s, c, None)), pts, scal)
print(f"full msm          {t*1e3:9.1f} ms   {n/t/1e3:8.1f} k pts/s")

# digits only
dig = jax.jit(lambda s: msm._digits(s, c, nwin))
t = timeit(dig, scal)
print(f"digits            {t*1e3:9.1f} ms")
digits = dig(scal)

# sort + gather per window
@jax.jit
def sort_take(p, d):
    def per(_, dw):
        order = jnp.argsort(dw)
        sd = jnp.take(dw, order)
        sp = jnp.take(p, order, axis=0)
        return None, (sd[0], sp[0, 0, 0])
    _, o = jax.lax.scan(per, None, d)
    return o

t = timeit(sort_take, pts, digits)
print(f"sort+gather x{nwin} {t*1e3:9.1f} ms")

# lane scan only (no sort): scan add_mixed over the raw points
@jax.jit
def scan_only(p, d):
    def per(_, dw):
        t = msm._lane_scan_with_boundaries(
            p, jnp.arange(1 << c, dtype=jnp.int32))
        return None, t[0, 0, 0]
    _, o = jax.lax.scan(per, None, d)
    return o

t = timeit(scan_only, pts, digits)
print(f"lane-scan  x{nwin} {t*1e3:9.1f} ms")

# single window_sum
@jax.jit
def one_window(p, dw):
    return msm._window_sum(p, dw, c)

t = timeit(one_window, pts, digits[0])
print(f"one window_sum    {t*1e3:9.1f} ms  (x{nwin} = {t*nwin*1e3:.0f})")

# fold
wsums = jax.jit(lambda p, s: msm.msm_chunk(p, s, c, None))(pts, scal)
sync(wsums)
t = timeit(jax.jit(lambda w: msm.fold_windows(w, c)), wsums)
print(f"fold              {t*1e3:9.1f} ms")
