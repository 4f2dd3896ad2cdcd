#!/usr/bin/env python
"""Headline benchmark: BLS12-381 MSM throughput (points/sec) on one chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md: its README benchmark link
is an unfilled placeholder and CI never touches hardware), so vs_baseline
is measured against the recorded value of the previous round when present
(BENCH_PREV.json), else 1.0.

Env knobs: BLZ_BENCH_LOGN (default 18), BLZ_BENCH_CURVE (bls12_381),
BLZ_BENCH_ITERS (default 3).
"""
import json
import os
import sys
import time


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import numpy as np
    import jax.numpy as jnp

    from blaze_tpu.curves import CURVES, Curve
    from blaze_tpu.msm import MSM, MSMConfig

    logn = int(os.environ.get("BLZ_BENCH_LOGN", "18"))
    curve_name = os.environ.get("BLZ_BENCH_CURVE", "bls12_381")
    iters = int(os.environ.get("BLZ_BENCH_ITERS", "3"))
    n = 1 << logn

    spec = CURVES[curve_name]
    curve = Curve(spec)
    msm = MSM(curve, MSMConfig(chunk_log2=max(logn, 20)))

    # Synthetic but valid inputs: tile a small set of real curve points
    # (the reference's own trick, tests/msm/mod.rs:23-31) — throughput does
    # not depend on point values.
    from blaze_tpu.oracle import tiled_msm_instance

    points, scalars, _, _ = tiled_msm_instance(spec, n, seed=123)
    pts = curve.fq.to_mont(jnp.asarray(points))
    scal = jnp.asarray(scalars)

    def sync(x):
        # block_until_ready can return before execution completes on
        # tunneled platforms; a 1-element device_get is a true barrier.
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1]))

    sync((pts, scal))

    # warmup / compile
    out = msm(pts, scal)
    sync(out)

    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = msm(pts, scal)
        sync(out)
        best = min(best, time.perf_counter() - t0)

    pps = n / best

    prev = None
    prev_path = os.path.join(os.path.dirname(__file__) or ".", "BENCH_PREV.json")
    if os.path.exists(prev_path):
        try:
            prev = json.load(open(prev_path)).get("value")
        except Exception:
            prev = None
    vs = pps / prev if prev else 1.0

    rec = {
        "metric": f"{curve_name}_msm_2^{logn}",
        "value": round(pps, 1),
        "unit": "points/sec",
        "vs_baseline": round(vs, 3),
    }
    print(json.dumps(rec))
    try:
        json.dump(rec, open(prev_path, "w"))
    except Exception:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
