"""Verify the fused scan at full length + honest timing via device_get."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from blaze_tpu.curves import CURVES, Curve
from blaze_tpu.curves.kernels import ECKernels
from blaze_tpu.oracle import tiled_msm_instance

logc = int(sys.argv[1]) if len(sys.argv) > 1 else 7
logb = int(sys.argv[2]) if len(sys.argv) > 2 else 13
C, B = 1 << logc, 1 << logb
spec = CURVES["bls12_381"]
curve = Curve(spec)
L = spec.fq.nlimbs
print(f"dev={jax.devices()}  C={C} B={B}", flush=True)

points, _, _, _ = tiled_msm_instance(spec, 256, seed=7)
pts = curve.fq.to_mont(jnp.asarray(points))
idx = np.random.RandomState(0).randint(0, 256, size=C * B)
aff = jnp.take(pts, jnp.asarray(idx), axis=0).reshape(C, B, 2, L)
kern = ECKernels.for_curve(spec)
rows = jnp.moveaxis(aff, 1, -1).reshape(C, 2 * L, B)

emitted, tot = kern.scan_mixed(rows)
jax.block_until_ready((emitted, tot))

# timing with forced host fetch of a checksum
def run():
    em, tt = kern.scan_mixed(rows)
    return int(jax.device_get(jnp.sum(tt.astype(jnp.uint64)))) \
        + int(jax.device_get(jnp.sum(em[-1].astype(jnp.uint64))))

run()
best = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    run()
    best = min(best, time.perf_counter() - t0)
adds = C * B
print(f"fused scan (checksummed) {best*1e3:9.2f} ms  "
      f"{adds/best/1e6:8.2f} M mixed-adds/s", flush=True)

# chain spot-checks: emitted[c] == add_mixed(emitted[c-1], rows[c])
amj = jax.jit(curve.add_mixed)
ok = True
for c in [1, C // 3, C // 2, C - 1]:
    prev = jnp.moveaxis(
        emitted[c - 1].astype(jnp.uint32).reshape(3, L, B), -1, 0
    )
    step = amj(prev, aff[c])
    want = jnp.moveaxis(step, 0, -1).reshape(3 * L, B).astype(jnp.uint16)
    good = bool(jnp.array_equal(emitted[c], want))
    ok &= good
    print(f"step {c}: {good}", flush=True)

# final total matches last emitted (mod u16 compression) + on-curve
last = emitted[C - 1].astype(jnp.uint32)
print(f"tot==emitted[-1] (u16): "
      f"{bool(jnp.array_equal(last, tot & 0xFFFF))}", flush=True)
proj = jnp.moveaxis(tot.reshape(3, L, B), -1, 0)
oc = jax.jit(curve.on_curve)(proj)
print(f"on-curve: {bool(jnp.all(oc))}  overall={ok}", flush=True)
