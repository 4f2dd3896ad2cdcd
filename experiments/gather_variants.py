"""Gather+layout strategy bench: sorted-point materialization for the scan.

Target output: rows (C, 2L, G*R) u16 with n = r*C + c lane order, from
points (2L, N) u16 lanes-major resident layout + order (G, N) indices.
"""
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
N = 1 << logn
L = 24
G = 16
R = 1 << ((logn + 1) // 2)
C = N // R

rng = np.random.default_rng(0)
pts = jnp.asarray(rng.integers(0, 65536, size=(2 * L, N)), dtype=jnp.uint16)
# realistic order: argsort of random 16-bit digits (what Pippenger feeds)
digits = jnp.asarray(rng.integers(0, 65536, size=(G, N)), dtype=jnp.uint32)
order = jax.jit(lambda d: jnp.argsort(d, axis=-1))(digits)
order = jax.block_until_ready(order)


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
    print(f"{name:36s} {best*1e3:8.1f} ms", flush=True)
    return o


@jax.jit
def v1_lane_gather(pts, order):
    sp = jnp.take(pts, order, axis=1)                    # (2L, G, N)
    rows = jnp.moveaxis(sp.reshape(2 * L, G, R, C), 3, 0)
    return rows.reshape(C, 2 * L, G * R)


@jax.jit
def v2_packed_lane_gather(pts, order):
    # pack limb pairs into u32 lanes: halves the gathered element count
    p32 = pts.reshape(L, 2, N)
    packed = p32[:, 0].astype(jnp.uint32) | (p32[:, 1].astype(jnp.uint32) << 16)
    sp = jnp.take(packed, order, axis=1)                 # (L, G, N) u32
    rows = jnp.moveaxis(sp.reshape(L, G, R, C), 3, 0)    # (C, L, G*R) u32
    lo = (rows & 0xFFFF).astype(jnp.uint16)
    hi = (rows >> 16).astype(jnp.uint16)
    out = jnp.stack([lo, hi], axis=2).reshape(C, 2 * L, G * R)
    return out


@jax.jit
def v3_sublane_gather(pts, order):
    pm = pts.T                                           # (N, 2L) u16
    sp = jnp.take(pm, order, axis=0)                     # (G, N, 2L)
    rows = jnp.moveaxis(sp.reshape(G, R, C, 2 * L), 2, 0)
    return jnp.moveaxis(rows, -1, 1).reshape(C, 2 * L, G * R)


@jax.jit
def v4_sublane_packed(pts, order):
    p32 = pts.reshape(L, 2, N)
    packed = (p32[:, 0].astype(jnp.uint32)
              | (p32[:, 1].astype(jnp.uint32) << 16)).T  # (N, L) u32
    sp = jnp.take(packed, order, axis=0)                 # (G, N, L) u32
    rows = jnp.moveaxis(sp.reshape(G, R, C, L), 2, 0)    # (C, G, R, L)
    rows = jnp.moveaxis(rows, -1, 1).reshape(C, L, G * R)
    lo = (rows & 0xFFFF).astype(jnp.uint16)
    hi = (rows >> 16).astype(jnp.uint16)
    return jnp.stack([lo, hi], axis=2).reshape(C, 2 * L, G * R)


o1 = bench("v1 lane gather (current)", v1_lane_gather, pts, order)
o2 = bench("v2 packed-u32 lane gather", v2_packed_lane_gather, pts, order)
o3 = bench("v3 sublane gather (points-major)", v3_sublane_gather, pts, order)
o4 = bench("v4 sublane packed u32", v4_sublane_packed, pts, order)

# packed variants reconstruct the original limb-row order exactly
assert jnp.array_equal(o1, o3), "v3 mismatch"
assert jnp.array_equal(o1, o2), "v2 mismatch"
assert jnp.array_equal(o1, o4), "v4 mismatch"
print("all variants bit-identical")


@jax.jit
def v6_packed_no_unpack(pts, order):
    # kernel-ready (C, L, G*R) u32 packed rows (kernel unpacks in VMEM)
    p32 = pts.reshape(L, 2, N)
    packed = p32[:, 0].astype(jnp.uint32) | (p32[:, 1].astype(jnp.uint32) << 16)
    sp = jnp.take(packed, order, axis=1)                 # (L, G, N) u32
    rows = jnp.moveaxis(sp.reshape(L, G, R, C), 3, 0)    # (C, L, G, R)
    return rows.reshape(C, L, G * R)


@jax.jit
def v7_premuted_gather(pts, order):
    # C-major index permutation: gather directly into (L, C, G, R)
    p32 = pts.reshape(L, 2, N)
    packed = p32[:, 0].astype(jnp.uint32) | (p32[:, 1].astype(jnp.uint32) << 16)
    o = jnp.moveaxis(order.reshape(G, R, C), 2, 0)       # (C, G, R)
    sp = jnp.take(packed, o, axis=1)                     # (L, C, G, R)
    return jnp.moveaxis(sp, 1, 0).reshape(C, L, G * R)


o6 = bench("v6 packed u32, kernel-ready", v6_packed_no_unpack, pts, order)
o7 = bench("v7 premuted C-major gather", v7_premuted_gather, pts, order)
assert jnp.array_equal(o6, o7), "v7 mismatch"
print("v6 == v7 ok")
