#!/usr/bin/env python
"""Headline benchmark: all three primitives on one chip.

Prints exactly one JSON line.  The headline metric is the BLS12-381 MSM
(points/sec); the `extra` field carries the NTT and Poseidon metrics and
per-metric HBM speed-of-light fractions (bench/profile.py), mirroring the
reference's perf-counter surface (msm_hw_code.rs:35-54) and its criterion
NTT bench (benches/ntt_bench.rs:33-42):

  {"metric": "bls12_381_msm_2^24", "value": N, "unit": "points/sec",
   "vs_baseline": N, "extra": {"ntt_2^24": {...}, "poseidon_2^14": {...}}}

The reference publishes no numbers (BASELINE.md: its README benchmark link
is an unfilled placeholder and CI never touches hardware), so vs_baseline
is measured against the recorded value of the previous round when present
(BENCH_PREV.json, updated only under BLZ_BENCH_RECORD=1), else 1.0.

Env knobs: BLZ_BENCH_LOGN (default 24), BLZ_BENCH_CURVE (bls12_381),
BLZ_BENCH_ITERS (default 3), BLZ_BENCH_NTT_LOGN (default 27 on TPU — the
reference's fixed size, ntt_data.rs:65 — else 20), BLZ_BENCH_POSEIDON_LOGL
(default 15, leaves = 2^15 = 8^5), BLZ_BENCH_ONLY (csv of
msm,ntt,poseidon to restrict).
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
PREV_PATH = os.path.join(HERE, "BENCH_PREV.json")


def _probe_backend() -> str:
    """Name of the usable default backend, probing in a SUBPROCESS first.

    A registered-but-unreachable TPU plugin (dead tunnel relay) raises from
    the first in-process `jax.default_backend()` and would take the whole
    bench down (the BENCH_r04 rc=1 failure).  Probe out-of-process; on any
    failure force this process onto CPU via JAX_PLATFORMS before jax is
    imported, so every later backend query is safe.  Same fallback as
    __graft_entry__.dryrun_multichip (commit 8e4bf28)."""
    import subprocess

    backend = ""
    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=300,
        )
        if out.returncode == 0 and out.stdout.strip():
            backend = out.stdout.strip().splitlines()[-1]
    except Exception:
        pass
    if not backend or backend == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        backend = "cpu"
    return backend


def _sync(x):
    # block_until_ready can return before execution completes on
    # tunneled platforms; a 1-element device_get is a true barrier.
    import jax
    import numpy as np

    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1]))


def bench_msm(logn: int, curve_name: str, iters: int) -> dict:
    import jax
    import jax.numpy as jnp

    from blaze_tpu.bench.profile import speed_of_light
    from blaze_tpu.curves import CURVES, Curve
    from blaze_tpu.msm import MSM, MSMConfig
    from blaze_tpu.oracle import tiled_msm_instance

    n = 1 << logn
    spec = CURVES[curve_name]
    curve = Curve(spec)
    # chunk at 2^20 points per device pass: the sorted/emitted u16 scan
    # arrays of one pass fill ~4 GiB of HBM at that size; larger inputs
    # stream chunks and accumulate per-window partials (msm_api.rs:156
    # chunking analog).
    msm = MSM(curve, MSMConfig(
        chunk_log2=min(logn, 20),
        signed_digits=os.environ.get("BLZ_MSM_SIGNED") == "1",
    ))

    # Synthetic but valid inputs: tile a small set of real curve points
    # (the reference's own trick, tests/msm/mod.rs:23-31) — throughput does
    # not depend on point values.
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
    _sync((pts, scal))

    out = msm(pts, scal)  # warmup / compile
    _sync(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = msm(pts, scal)
        _sync(out)
        best = min(best, time.perf_counter() - t0)

    # Speed-of-light: the minimum HBM traffic of an MSM is one read of the
    # resident operands (xy-packed points + u16 scalar limbs); everything
    # else (sort, scan emissions) is algorithmic overhead this fraction
    # charges against.
    fq_l, fr_l = spec.fq.nlimbs, spec.fr.nlimbs
    min_bytes = n * (fq_l * 4 + fr_l * 2)
    sol = (min_bytes / best) / (speed_of_light().hbm_gbps * 1e9)
    # Compute-utilization view (the MSM is compute-bound; HBM sol alone
    # reads ~0 forever): achieved field muls/s from the dominant cost —
    # the per-window mixed-add scan (11 muls each, curves/kernels.py
    # RCB alg 8) — and the fraction of the measured standalone mul-kernel
    # ceiling (experiments/redc_probe.py, T=1024) it reaches.
    c = min(msm.config.window_bits, 16)
    nwin = -(-spec.fr.bits // c)
    muls = nwin * n * 11
    mul_rate = muls / best
    kernel_ceiling = 7.71e8  # measured muls/s (MULBENCH.json, this chip)
    return {
        "metric": f"{curve_name}_msm_2^{logn}",
        "value": round(n / best, 1),
        "unit": "points/sec",
        "ms": round(best * 1e3, 2),
        "sol_fraction": round(sol, 4),
        "field_muls_per_sec": round(mul_rate / 1e6, 1),
        "mul_kernel_fraction": round(mul_rate / kernel_ceiling, 3),
    }


def bench_ntt(logn: int, iters: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from blaze_tpu.bench.profile import speed_of_light
    from blaze_tpu.fields import FIELDS
    from blaze_tpu.ntt import make_ntt

    spec = FIELDS["bls12_381_fr"]
    n = 1 << logn
    plan = make_ntt(spec, logn)
    rng = np.random.default_rng(7)
    x16 = rng.integers(0, 1 << 16, size=(n, spec.nlimbs), dtype=np.uint16)
    x16[:, -1] &= 0x3FFF  # < p

    use16 = hasattr(plan, "ntt16") and jax.default_backend() == "tpu"
    if use16 and plan.ntt_blocked_available():
        # zero-padding blocked boundary layout (flat (n, 16) u16 is
        # 8x-padded by the TPU tiling — OOM at 2^26)
        fn = plan.ntt16b
        xb = plan.to_blocked(x16)
        make_in = lambda: jnp.asarray(xb)
    elif use16:
        fn = plan.ntt16          # donated u16 in/out — the 4 GiB/buffer path
        make_in = lambda: jnp.asarray(x16)
    else:
        fn = plan.ntt
        xdev = jnp.asarray(x16.astype(np.uint32))
        make_in = lambda: xdev

    out = fn(make_in())  # warmup/compile
    _sync(out)
    del out
    best = float("inf")
    for _ in range(iters):
        xd = make_in()
        _sync(xd)
        t0 = time.perf_counter()
        out = fn(xd)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
        del out

    # SOL: minimum traffic = read + write of the n * 32 B buffer once.
    min_bytes = 2 * n * spec.nbytes
    sol = (min_bytes / best) / (speed_of_light().hbm_gbps * 1e9)
    return {
        "metric": f"ntt_2^{logn}",
        "value": round(n / best, 1),
        "unit": "elems/sec",
        "ms": round(best * 1e3, 2),
        "sol_fraction": round(sol, 4),
    }


def bench_poseidon(logl: int, iters: int) -> dict:
    """Merkle-tree build throughput at 2^logl leaves, TreeC mode, driven
    through the CLIENT lifecycle (initialize / batched set_data /
    start_process / wait_result — the reference streams elements and
    drains records through exactly this surface,
    integration_poseidon.rs:151-155 + poseidon_api.rs:128-145).  Timed
    region: start_process -> wait_result (the engine), with the batched
    element staging outside it like the reference's criterion NTT loop.
    logl must be a multiple of 3 (8-ary base layer, utils.rs:12-14)."""
    if logl % 3:
        raise ValueError(f"8-ary tree base must be a power of 8 (logl={logl})")
    import numpy as np

    from blaze_tpu.bench.profile import speed_of_light
    from blaze_tpu.fields import FIELDS
    from blaze_tpu.hash.tree import LEAF_ARITY, TreeMode, num_tree_nodes
    from blaze_tpu.runtime.clients import (
        PoseidonClient,
        PoseidonInitializeParameters,
    )

    spec = FIELDS["bls12_381_fr"]
    nleaves = 1 << logl
    rng = np.random.default_rng(9)
    elems = rng.integers(
        0, 1 << 16, size=(nleaves * LEAF_ARITY, spec.nlimbs), dtype=np.uint16
    ).astype(np.uint32)
    elems[..., -1] &= 0x3FFF
    # height: full 8-ary tree over nleaves (8^(h-1) = nleaves)
    height = 1 + (logl + 2) // 3
    assert 8 ** (height - 1) == nleaves

    cl = PoseidonClient(spec)
    cl.initialize(PoseidonInitializeParameters(
        tree_height=height, tree_mode=TreeMode.TREE_C))
    cl.set_data(elems)                       # one batched staging call
    cl.start_process()                       # warmup/compile
    cl.wait_result()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        cl.start_process()
        cl.wait_result()
        best = min(best, time.perf_counter() - t0)
    raw = cl.result_raw()                    # array-speed record drain
    assert len(raw) == 64 * num_tree_nodes(height)

    min_bytes = nleaves * (LEAF_ARITY + 1) * spec.nbytes  # read cols, write leaf
    sol = (min_bytes / best) / (speed_of_light().hbm_gbps * 1e9)
    return {
        "metric": f"poseidon_2^{logl}_leaves",
        "value": round(nleaves / best, 1),
        "unit": "leaves/sec",
        "ms": round(best * 1e3, 2),
        "sol_fraction": round(sol, 4),
        "via": "client",
    }


def bench_pipeline(ntt_logn: int, msm_logn: int, iters: int) -> dict:
    """Config-5 proof-gen pipeline: NTT 2^ntt_logn feeding a BLS12-381
    MSM 2^msm_logn as scalars, 2-deep across primitives
    (blaze_tpu/pipeline.py), oracle-checked via the closed-form
    geometric MSM (delta coefficients -> scalars are W^i)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() != "tpu":
        raise RuntimeError("pipeline bench needs the TPU blocked NTT path")
    from blaze_tpu.curves import CURVES, Curve
    from blaze_tpu.msm import MSMConfig, points_to_resident
    from blaze_tpu.oracle import tiled_msm_instance
    from blaze_tpu.pipeline import ProofPipeline, geometric_msm_oracle

    spec = CURVES["bls12_381"]
    curve = Curve(spec)
    n_msm = 1 << msm_logn
    points, _, _, dbg = tiled_msm_instance(spec, 256, seed=123)
    idx = np.arange(n_msm) % 256
    pts_res = points_to_resident(curve, jnp.asarray(points[idx]))
    _sync(pts_res)
    pipe = ProofPipeline(curve, ntt_logn, msm_logn,
                         config=MSMConfig(chunk_log2=20))
    L = spec.fr.nlimbs
    rows = (1 << ntt_logn) // 128

    import functools

    @jax.jit
    def make_delta():
        z = jnp.zeros((rows, L, 128), jnp.uint16)
        return z.at[0, 0, 1].set(1)

    nb = max(iters, 2) + 1
    t0 = time.perf_counter()
    stamps, outs = [], []
    for out in pipe.run_batches((make_delta() for _ in range(nb)), pts_res):
        stamps.append(time.perf_counter() - t0)
        outs.append(out)
    per_batch = (stamps[-1] - stamps[0]) / (len(stamps) - 1)
    w = spec.fr.root_of_unity(ntt_logn)
    expected = geometric_msm_oracle(spec, 256, n_msm, w, dbg["points"])
    aff = curve.to_affine(outs[-1][None])[0]
    got = (curve.fq.to_int(aff[0]), curve.fq.to_int(aff[1]))
    if got != expected:
        raise AssertionError("pipeline result diverges from oracle")
    return {
        "metric": f"pipeline_ntt2^{ntt_logn}_msm2^{msm_logn}",
        "value": round(1.0 / per_batch, 3),
        "unit": "proofs/sec",
        "ms": round(per_batch * 1e3, 2),
        "oracle": "exact",
    }


def _history() -> dict:
    if not os.path.exists(PREV_PATH):
        return {}
    try:
        hist = json.load(open(PREV_PATH))
        if "metric" in hist:        # legacy single-record format
            hist = {hist["metric"]: hist.get("value")}
        return hist
    except Exception:
        return {}


def _vs_baseline(hist: dict, metric: str, value: float) -> float:
    prev = hist.get(metric)
    if not prev:
        # scale-free fallback: any recorded size of the same family, so
        # round-over-round comparisons survive a headline-size bump
        fam = metric.rsplit("_2^", 1)[0]
        for k, v in hist.items():
            if k.rsplit("_2^", 1)[0] == fam and v:
                prev = v
                break
    return round(value / prev, 3) if prev else 1.0


def main():
    backend = _probe_backend()    # MUST run before the in-process jax import
    on_tpu = backend == "tpu"
    import jax

    if not on_tpu:
        # The container's sitecustomize can override JAX_PLATFORMS from the
        # environment; pin the platform through jax.config too (the same
        # belt-and-braces conftest.py uses).
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    # CPU-tier sizes on fallback: a parseable (small) record beats an rc=1.
    logn = int(os.environ.get("BLZ_BENCH_LOGN", "24" if on_tpu else "14"))
    curve_name = os.environ.get("BLZ_BENCH_CURVE", "bls12_381")
    iters = int(os.environ.get("BLZ_BENCH_ITERS", "3"))

    ntt_default = "27" if on_tpu else "16"
    ntt_logn = int(os.environ.get("BLZ_BENCH_NTT_LOGN", ntt_default))
    pos_logl = int(
        os.environ.get("BLZ_BENCH_POSEIDON_LOGL", "15" if on_tpu else "9"))
    pipe_on = os.environ.get(
        "BLZ_BENCH_PIPELINE", "1" if on_tpu else "0"
    ) == "1"
    default_set = "msm,ntt,poseidon" + (",pipeline" if pipe_on else "")
    only = set(
        s for s in os.environ.get("BLZ_BENCH_ONLY", default_set).split(",")
        if s
    )

    hist = _history()
    recs = []
    errors = {}
    for name, runner in (
        ("msm", lambda: bench_msm(logn, curve_name, iters)),
        ("ntt", lambda: bench_ntt(ntt_logn, iters)),
        ("poseidon", lambda: bench_poseidon(pos_logl, iters)),
        ("pipeline", lambda: bench_pipeline(ntt_logn, logn, iters)),
    ):
        if name not in only:
            continue
        try:
            rec = runner()
            rec["vs_baseline"] = _vs_baseline(hist, rec["metric"], rec["value"])
            recs.append(rec)
        except Exception as e:  # one primitive failing must not hide the rest
            errors[name] = f"{type(e).__name__}: {e}"

    if not recs:
        print(json.dumps({"metric": "error", "value": 0, "unit": "none",
                          "vs_baseline": 0, "errors": errors}))
        return 1

    head = recs[0]
    out = {
        "metric": head["metric"],
        "value": head["value"],
        "unit": head["unit"],
        "vs_baseline": head["vs_baseline"],
        "extra": {r["metric"]: {k: v for k, v in r.items() if k != "metric"}
                  for r in recs[1:]},
    }
    for k, v in head.items():
        out.setdefault(k, v)
    if not on_tpu:
        out["backend"] = backend    # make a tunnel-outage fallback visible
    if errors:
        out["errors"] = errors
    print(json.dumps(out))

    # BENCH_PREV is the round-over-round baseline: only update it when
    # explicitly recording (end-of-round), so local tuning runs can't
    # erase the previous round's value and fake vs_baseline = 1.0.
    if os.environ.get("BLZ_BENCH_RECORD"):
        try:
            for r in recs:
                hist[r["metric"]] = r["value"]
            json.dump(hist, open(PREV_PATH, "w"))
        except Exception:
            pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
