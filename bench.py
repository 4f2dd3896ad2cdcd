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

    logn = int(os.environ.get("BLZ_BENCH_LOGN", "22"))
    curve_name = os.environ.get("BLZ_BENCH_CURVE", "bls12_381")
    iters = int(os.environ.get("BLZ_BENCH_ITERS", "3"))
    n = 1 << logn

    spec = CURVES[curve_name]
    curve = Curve(spec)
    # chunk at 2^20 points per device pass: the sorted/emitted u16 scan
    # arrays of one pass fill ~4 GiB of HBM at that size; larger inputs
    # stream chunks and accumulate per-window partials (msm_api.rs:156
    # chunking analog).
    msm = MSM(curve, MSMConfig(chunk_log2=min(logn, 20)))

    # Synthetic but valid inputs: tile a small set of real curve points
    # (the reference's own trick, tests/msm/mod.rs:23-31) — throughput does
    # not depend on point values.
    from blaze_tpu.oracle import tiled_msm_instance

    points, scalars, _, _ = tiled_msm_instance(spec, n, seed=123)
    if jax.default_backend() == "tpu":
        # Lanes-major xy-packed residency (msm/residency.py) — the same
        # conversion MSMClient.set_data performs on TPU.
        from blaze_tpu.msm import points_to_resident, scalars_to_resident

        pts = points_to_resident(curve, points)
        scal = jnp.asarray(scalars_to_resident(scalars))
    else:
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

    metric = f"{curve_name}_msm_2^{logn}"
    prev_path = os.path.join(os.path.dirname(__file__) or ".", "BENCH_PREV.json")
    hist = {}
    if os.path.exists(prev_path):
        try:
            hist = json.load(open(prev_path))
            if "metric" in hist:        # legacy single-record format
                hist = {hist["metric"]: hist.get("value")}
        except Exception:
            hist = {}
    prev = hist.get(metric)
    # points/sec is scale-free: fall back to any recorded size of the same
    # curve so round-over-round comparisons survive a headline-size bump.
    if not prev:
        for k, v in hist.items():
            if k.startswith(f"{curve_name}_msm") and v:
                prev = v
                break
    vs = pps / prev if prev else 1.0

    rec = {
        "metric": metric,
        "value": round(pps, 1),
        "unit": "points/sec",
        "vs_baseline": round(vs, 3),
    }
    print(json.dumps(rec))
    # BENCH_PREV is the round-over-round baseline: only update it when
    # explicitly recording (end-of-round), so local tuning runs can't
    # erase the previous round's value and fake vs_baseline = 1.0.
    if os.environ.get("BLZ_BENCH_RECORD"):
        try:
            hist[metric] = rec["value"]
            json.dump(hist, open(prev_path, "w"))
        except Exception:
            pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
