"""Montgomery-mul kernel ceiling: the committed microbench artifact.

Measures the fused in-kernel chained mul (the exact body every EC/NTT/
Poseidon kernel runs) per tile size and writes MULBENCH.json.  Round-3
baseline: ~397 M muls/s (bf16 REDC, T=512).  This round: int8 K-trimmed
REDC matmuls + larger tiles.

Usage: python experiments/mul_bench.py [tiles_csv]
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

TILES = [int(t) for t in (sys.argv[1] if len(sys.argv) > 1 else "512,1024").split(",")]
ART = "/root/repo/MULBENCH.json"

rows = {}
for t in TILES:
    ntiles = max(1, (1 << 15) // t)
    out = subprocess.run(
        [sys.executable, "/root/repo/experiments/redc_probe.py",
         str(t), str(ntiles), "mont"],
        capture_output=True, text=True, timeout=2400,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("mont")]
    print(out.stdout.strip(), flush=True)
    if not line:
        print(out.stderr[-2000:], flush=True)
        continue
    # "mont       per-op    29.36 us,   917.5 ns/tile,  1116.1 M elem-ops/s"
    mps = float(line[0].split(",")[-1].strip().split()[0])
    rows[t] = mps

best = max(rows.values()) if rows else 0.0

def _git_rev():
    import subprocess
    try:
        return subprocess.run(
            ["git", "-C", "/root/repo", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        return "unknown"

rec = {
    "git_rev": _git_rev(),
    "field": "bls12_381_fq (L=24)",
    "kernel": "fused VPU conv + int8 K-trimmed MXU REDC (fields/kernel_ops.py)",
    "muls_per_sec_by_tile": {str(t): round(v * 1e6, 0) for t, v in rows.items()},
    "best_muls_per_sec": round(best * 1e6, 0),
    "round3_baseline_muls_per_sec": 397e6,
    "speedup_vs_round3": round(best * 1e6 / 397e6, 2),
}
with open(ART, "w") as f:
    json.dump(rec, f, indent=1)
print(json.dumps(rec), flush=True)
