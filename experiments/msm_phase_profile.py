"""Phase-level timing of the fused MSM at bench shapes.

Runs each pipeline stage as its own jit (same shapes/dtypes as the fused
path) so per-phase cost is visible despite the single-dispatch design.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from blaze_tpu.curves import CURVES, Curve
from blaze_tpu.curves.kernels import ECKernels
from blaze_tpu.msm import MSM, MSMConfig
from blaze_tpu.msm.pippenger import _ceil_pow2, default_window_bits
from blaze_tpu.oracle import tiled_msm_instance
import math

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 18
n = 1 << logn
spec = CURVES["bls12_381"]
curve = Curve(spec)
cfg = MSMConfig(chunk_log2=max(logn, 20))
msm = MSM(curve, cfg)
kern = ECKernels.for_curve(spec, tile=cfg.kernel_tile)
L = curve.nlimbs

points, scalars, _, _ = tiled_msm_instance(spec, n, seed=3)
pts = curve.fq.to_mont(jnp.asarray(points))
scal = jnp.asarray(scalars)

c = min(cfg.window_bits, default_window_bits(n))
nwin = -(-spec.fr.bits // c)
G, B = nwin, 1 << c
R = cfg.scan_lanes or _ceil_pow2(int(math.sqrt(n)))
C = -(-n // R)
print(f"n=2^{logn} c={c} nwin={nwin} R={R} C={C}", flush=True)


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1]))


def bench(name, fn, *args):
    o = fn(*args)
    sync(o)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:8.1f} ms", flush=True)
    return o


digits_j = jax.jit(lambda s: msm._digits(s, c, nwin))
digits = bench("digits", digits_j, scal)


@jax.jit
def sort_phase(digits, pts):
    order = jnp.argsort(digits, axis=-1)
    pts16 = pts.reshape(n, 2 * L).astype(jnp.uint16)
    sp = jnp.take(pts16, order, axis=0)
    lo_bits = min(c, 8)
    lo_n = 1 << lo_bits
    hi_n = max(B >> lo_bits, 1)

    def hist_one(d):
        dh = (d >> lo_bits).astype(jnp.int32)
        dl = (d & (lo_n - 1)).astype(jnp.int32)
        A = (dh[:, None] == jnp.arange(hi_n, dtype=jnp.int32)).astype(jnp.bfloat16)
        Bm = (dl[:, None] == jnp.arange(lo_n, dtype=jnp.int32)).astype(jnp.bfloat16)
        h = jax.lax.dot_general(A, Bm, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return h.reshape(B).astype(jnp.int32)

    hist = jax.lax.map(hist_one, digits)
    bounds = jnp.cumsum(hist, axis=-1) - 1
    return sp, bounds


sp, bounds = bench("argsort+gather+bounds", sort_phase, digits, pts)


@jax.jit
def layout_phase(sp):
    pad = R * C - n
    if pad:
        last = jnp.broadcast_to(sp[:, -1:], (G, pad, 2 * L))
        sp = jnp.concatenate([sp, last], axis=1)
    rows = jnp.moveaxis(sp.reshape(G, R, C, 2 * L), 2, 0)
    return jnp.moveaxis(rows, -1, 1).reshape(C, 2 * L, G * R)


rows = bench("layout transpose", layout_phase, sp)

scan_j = jax.jit(lambda r: kern.scan_mixed(r))
emitted, tot = bench("fused scan kernel", scan_j, rows)


@jax.jit
def fixup_phase(tot, emitted, bounds):
    lane_tot = msm._canon(jnp.moveaxis(tot.reshape(3, L, G, R), (0, 1), (2, 3)))
    lane_tot = jnp.moveaxis(lane_tot, 1, 0)
    lane_prefix = msm._proj_scan(lane_tot)
    ident = curve.identity()
    excl = jnp.concatenate(
        [jnp.broadcast_to(ident, (1, G, 3, L)), lane_prefix[:-1]], axis=0
    )
    safe = jnp.maximum(bounds, 0)
    lane_idx = safe // C
    col_idx = safe % C
    gidx = jnp.arange(G, dtype=jnp.int32)[:, None]
    flat_lane = gidx * R + lane_idx
    local16 = emitted[col_idx, :, flat_lane]
    local = msm._canon(local16.reshape(G, B, 3, L).astype(jnp.uint32))
    carry_g = excl[lane_idx, gidx]
    valid = bounds >= 0
    identb = jnp.broadcast_to(ident, local.shape)
    local = curve.select(valid, local, identb)
    carry_g = curve.select(valid, carry_g, identb)
    return carry_g, local


carry_g, local = bench("lane fixup + boundary gather", fixup_phase, tot, emitted, bounds)


@jax.jit
def bucket_phase(carry_g, local):
    cv = curve
    total = cv.add(carry_g[:, B - 1], local[:, B - 1])
    shifted = jax.lax.fori_loop(0, c, lambda _, a: cv.dbl(a), total)
    acc = cv.add(shifted, cv.neg(total))
    rest = jnp.concatenate([carry_g[:, : B - 1], local[:, : B - 1]], axis=1)
    partial = msm._fused_reduce_rows(rest, kern)
    return cv.add(acc, cv.neg(partial))


wsums = bench("bucket phase (fused reduce)", bucket_phase, carry_g, local)

fold_j = jax.jit(lambda w: msm.fold_windows(w, c))
bench("horner fold", fold_j, wsums)
