"""Probe primitive op throughput on the attached TPU with reliable syncs.

Two axon-tunnel gotchas:
  * block_until_ready returns early -> sync via 1-element host transfer;
  * ~32 ms fixed round-trip latency -> make each dispatch do >= O(1 s) of
    work via fori_loop chains and subtract a measured empty-call baseline.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def timeit(fn, *args, iters=3):
    out = fn(*args); sync(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args); sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


LAT = 0.0


def report(name, seconds, work, unit):
    s = max(seconds - LAT, 1e-9)
    print(f"{name:36s} {seconds*1e3:9.1f} ms   {work/s/1e9:10.2f} G{unit}/s")


def chain(body, r):
    """fori_loop wrapper: x -> body applied r times (data-dependent)."""
    def fn(x, y):
        return jax.lax.fori_loop(0, r, lambda i, x: body(x, y), x)
    return jax.jit(fn)


def main():
    global LAT
    rng = np.random.default_rng(0)

    # latency baseline: trivial kernel
    tiny = jnp.zeros((8, 128), jnp.float32)
    LAT = timeit(jax.jit(lambda x: x + 1.0), tiny)
    print(f"round-trip latency baseline: {LAT*1e3:.1f} ms")

    N, K = 1 << 12, 1 << 10   # 4M elements, 16MB f32
    E = N * K
    R = 2048

    xf = jnp.asarray(rng.random((N, K), dtype=np.float32))
    yf = jnp.asarray(rng.random((N, K), dtype=np.float32))
    xi = jnp.asarray(rng.integers(0, 1 << 16, (N, K)), dtype=jnp.uint32)
    yi = jnp.asarray(rng.integers(0, 1 << 16, (N, K)), dtype=jnp.uint32)

    report("f32 fma", timeit(chain(lambda x, y: x * y + y, R), xf, yf),
           R * E * 2, "flop")
    report("u32 mul16+mask",
           timeit(chain(lambda x, y: (x * y) & jnp.uint32(0xFFFF), R), xi, yi),
           R * E, "op")
    report("u32 add/shift/and",
           timeit(chain(lambda x, y: ((x + y) >> 1) & jnp.uint32(0xFFFF), R),
                  xi, yi), R * E * 3, "op")
    report("u16 mul (uint16 in/out)",
           timeit(chain(lambda x, y: x * y, R),
                  xi.astype(jnp.uint16), yi.astype(jnp.uint16)), R * E, "op")

    # matmuls: x <- clip(x @ b) chained
    M, RM = 4096, 64
    bf = jnp.asarray(rng.random((M, M), dtype=np.float32))

    for dt, name in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
        a = jnp.asarray(rng.random((M, M), dtype=np.float32)).astype(dt)
        b = bf.astype(dt)

        def body(x, y, dt=dt):
            return jnp.dot(x, y, preferred_element_type=jnp.float32).astype(dt) * dt(1e-3)

        report(f"{name} matmul {M}", timeit(chain(body, RM), a, b),
               RM * 2 * M**3, "flop")

    a8 = jnp.asarray(rng.integers(-4, 4, (M, M)), dtype=jnp.int8)
    b8 = jnp.asarray(rng.integers(-4, 4, (M, M)), dtype=jnp.int8)

    def body8(x, y):
        acc = jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc & 7).astype(jnp.int8)

    report("int8 matmul 4096", timeit(chain(body8, RM), a8, b8),
           RM * 2 * M**3, "op")

    # HBM bandwidth: chained big stream (read+write 256MB per iter)
    big = jnp.asarray(rng.random((1 << 26,), dtype=np.float32))
    report("hbm stream", timeit(chain(lambda x, y: x * 1.0001 + y, 64),
                                big, big), 64 * big.size * 12, "B")


if __name__ == "__main__":
    main()
