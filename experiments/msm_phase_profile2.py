"""Phase-level timing of the lanes-major fused MSM at bench chunk shapes.

Each stage runs as its own jit with the same shapes/dtypes as
MSM._fused_chunk so per-phase cost is visible.
"""
import math
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

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
n = 1 << logn
spec = CURVES["bls12_381"]
curve = Curve(spec)
cfg = MSMConfig(chunk_log2=max(logn, 20))
msm = MSM(curve, cfg)
kern = ECKernels.for_curve(spec, tile=cfg.kernel_tile)
L = curve.nlimbs

points, scalars, _, _ = tiled_msm_instance(spec, n, seed=3)


@jax.jit
def to_mont_lm(blk):
    m = curve.fq.to_mont(blk)
    return jnp.moveaxis(m, 0, -1).reshape(2 * L, -1).astype(jnp.uint16)


pts = to_mont_lm(jnp.asarray(points))                      # (2L, N) u16
scal = jnp.asarray(np.ascontiguousarray(np.asarray(scalars).T),
                   dtype=jnp.uint16)                       # (Ls, N) u16

c = min(cfg.window_bits, default_window_bits(n))
nwin = -(-spec.fr.bits // c)
G, B = nwin, 1 << c
R = cfg.scan_lanes or _ceil_pow2(int(math.sqrt(n)))
R = min(R, n)
C = -(-n // R)
print(f"n=2^{logn} c={c} nwin={nwin} R={R} C={C} tile={cfg.kernel_tile}",
      flush=True)


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1]))


def bench(name, fn, *args, iters=3):
    o = fn(*args)
    sync(o)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:8.1f} ms", flush=True)
    return o


digits_j = jax.jit(lambda s: msm._digits_lm(s.astype(jnp.uint32), c, nwin))
digits = bench("digits_lm", digits_j, scal)

order = bench("argsort", jax.jit(lambda d: jnp.argsort(d, axis=-1)), digits)


@jax.jit
def hist_phase(digits):
    lo_bits = min(c, 8)
    lo_n = 1 << lo_bits
    hi_n = max(B >> lo_bits, 1)
    Ns = min(n, 1 << 15)
    S = -(-n // Ns)
    dpad = jnp.pad(digits, ((0, 0), (0, S * Ns - n)), constant_values=B)
    dh = jnp.moveaxis((dpad >> lo_bits).astype(jnp.int32).reshape(G, S, Ns), 1, 0)
    dl = jnp.moveaxis((dpad & (lo_n - 1)).astype(jnp.int32).reshape(G, S, Ns), 1, 0)

    def slab(acc, args):
        dhs, dls = args
        A = (dhs[..., None] == jnp.arange(hi_n, dtype=jnp.int32)).astype(jnp.int8)
        Bm = (dls[..., None] == jnp.arange(lo_n, dtype=jnp.int32)).astype(jnp.int8)
        h = jax.lax.dot_general(A, Bm, (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.int32)
        return acc + h, None

    hist0 = jnp.zeros((G, hi_n, lo_n), jnp.int32)
    hist, _ = jax.lax.scan(slab, hist0, (dh, dl))
    return jnp.cumsum(hist.reshape(G, B), axis=-1) - 1


bounds = bench("hist+bounds", hist_phase, digits)


@jax.jit
def gather_phase(pts, order):
    sp = jnp.take(pts, order, axis=1)                     # (2L, G, N)
    pad = R * C - n
    if pad:
        last = jnp.broadcast_to(sp[:, :, -1:], (2 * L, G, pad))
        sp = jnp.concatenate([sp, last], axis=2)
    rows = jnp.moveaxis(sp.reshape(2 * L, G, R, C), 3, 0)
    return rows.reshape(C, 2 * L, G * R)


rows = bench("gather+layout", gather_phase, pts, order)

emitted, tot = bench("scan_mixed kernel", kern.scan_mixed, rows)

excl = bench("ks_lane_prefix",
             jax.jit(lambda t: msm._ks_lane_prefix(t, G, R, kern)), tot)


@jax.jit
def tail_phase(emitted, excl16, bounds):
    cv = curve
    safe = jnp.maximum(bounds, 0)
    lane_idx = safe // C
    col_idx = safe % C
    gidx = jnp.arange(G, dtype=jnp.int32)[:, None]
    flat_lane = gidx * R + lane_idx
    local16 = emitted[col_idx, :, flat_lane].reshape(G, B, 3, L)
    carry16 = excl16[lane_idx, gidx]
    valid = bounds[..., None, None] >= 0
    ident16 = jnp.broadcast_to(cv.identity().astype(jnp.uint16), local16.shape)
    local16 = jnp.where(valid, local16, ident16)
    carry16 = jnp.where(valid, carry16, ident16)
    total = cv.add(
        msm._canon(carry16[:, B - 1].astype(jnp.uint32)),
        msm._canon(local16[:, B - 1].astype(jnp.uint32)),
    )
    tot_lm = jnp.moveaxis(total, 0, -1).reshape(3 * L, G)
    shifted_lm = kern.dbl_n(tot_lm, c)
    shifted = msm._canon(jnp.moveaxis(shifted_lm.reshape(3, L, G), -1, 0))
    acc = cv.add(shifted, cv.neg(total))
    rest = jnp.concatenate([carry16[:, : B - 1], local16[:, : B - 1]], axis=1)
    partial = msm._fused_reduce_rows(rest, kern)
    return cv.add(acc, cv.neg(partial))


wsums = bench("boundary+bucket tail", tail_phase, emitted, excl, bounds)

full = bench("FULL _msm_fused_jit",
             lambda p, s: msm._msm_fused_jit(p, s, c, None, True), pts, scal)
print("done", flush=True)
