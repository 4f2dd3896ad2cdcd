"""Correctness + throughput check of the fused Pallas EC kernels vs the
wave-batched XLA path (curves/ops.py)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from blaze_tpu.curves import CURVES, Curve
from blaze_tpu.curves.kernels import ECKernels, kernels_available
from blaze_tpu.oracle import tiled_msm_instance


def sync(x):
    jax.block_until_ready(x)


def timeit(fn, *args, iters=5):
    sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


logc = int(sys.argv[1]) if len(sys.argv) > 1 else 7     # scan steps C
logb = int(sys.argv[2]) if len(sys.argv) > 2 else 13    # lanes B
C, B = 1 << logc, 1 << logb
spec = CURVES["bls12_381"]
curve = Curve(spec)
L = spec.fq.nlimbs
print(f"kernels_available={kernels_available()}  C={C} B={B}", flush=True)

points, _, _, _ = tiled_msm_instance(spec, 256, seed=7)
pts = curve.fq.to_mont(jnp.asarray(points))             # (256, 2, L)
idx = np.random.RandomState(0).randint(0, 256, size=C * B)
aff = jnp.take(pts, jnp.asarray(idx), axis=0).reshape(C, B, 2, L)

kern = ECKernels.for_curve(spec)
rows = jnp.moveaxis(aff, 1, -1).reshape(C, 2 * L, B)

t0 = time.perf_counter()
emitted, tot = kern.scan_mixed(rows)
sync((emitted, tot))
print(f"fused scan compile+run {time.perf_counter()-t0:.1f} s", flush=True)

t = timeit(lambda r: kern.scan_mixed(r), rows)
adds = C * B
print(f"fused scan   {t*1e3:9.2f} ms  {adds/t/1e6:8.2f} M mixed-adds/s",
      flush=True)

# --- batched full add kernel vs XLA add
p3 = tot  # (3L, B) valid projective points
q3 = jnp.roll(p3, 7, axis=-1)
t0 = time.perf_counter()
out_k = kern.add(p3, q3)
sync(out_k)
print(f"fused add compile+run {time.perf_counter()-t0:.1f} s", flush=True)
pn = jnp.moveaxis(p3.reshape(3, L, B), -1, 0)
qn = jnp.moveaxis(q3.reshape(3, L, B), -1, 0)
addj = curve.jit_op("add")
out_ref = addj(pn, qn)
sync(out_ref)
ok_add = bool(jnp.array_equal(out_k, jnp.moveaxis(out_ref, 0, -1).reshape(3 * L, B)))
print(f"correct: full-add={ok_add}", flush=True)
t = timeit(lambda a, b: kern.add(a, b), p3, q3)
print(f"fused add    {t*1e3:9.2f} ms  {B/t/1e6:8.2f} M adds/s", flush=True)
t = timeit(addj, pn, qn)
print(f"xla add      {t*1e3:9.2f} ms  {B/t/1e6:8.2f} M adds/s", flush=True)

# --- XLA mixed-add throughput on one big batch (scan-step shape analog)
amj = jax.jit(curve.add_mixed)
proj = jnp.moveaxis(tot.reshape(3, L, B), -1, 0)
affb = aff[0]
sync(amj(proj, affb))
t = timeit(amj, proj, affb)
print(f"xla add_mixed {t*1e3:8.2f} ms  {B/t/1e6:8.2f} M adds/s", flush=True)

# --- small-C correctness vs XLA scan
Cs = 8
aff_s = aff[:Cs]
def xla_scan(a):
    def body(carry, row):
        nxt = curve.add_mixed(carry, row)
        return nxt, nxt
    init = jnp.broadcast_to(curve.identity(), (B, 3, L))
    return jax.lax.scan(body, init, a)

carry_ref, emitted_ref = jax.jit(xla_scan)(aff_s)
sync(carry_ref)
em_k, tot_k = kern.scan_mixed(rows[:Cs])
tot_ref = jnp.moveaxis(carry_ref, 0, -1).reshape(3 * L, B)
em_ref = jnp.moveaxis(emitted_ref, 1, -1).reshape(Cs, 3 * L, B).astype(jnp.uint16)
print(f"correct(C={Cs}): tot={bool(jnp.array_equal(tot_k, tot_ref))} "
      f"emitted={bool(jnp.array_equal(em_k, em_ref))}", flush=True)
