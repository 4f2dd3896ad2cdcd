"""Distribution-layer tests, isolated in a subprocess.

The actual cases live in dist_cases.py (not collected by the default
test_*.py glob).  Rationale: XLA:CPU executables that contain collectives
(shard_map / all_gather / all_to_all on the 8-virtual-device mesh) corrupt
the process heap in jax 0.9.0 — the damage detonates later, typically
inside persistent-cache deserialization (zstd) of an unrelated executable,
segfaulting the whole pytest run (reproduced: any mesh-using test followed
by warm-cache reads).  Running every mesh-using test in its own process
contains the blast radius at zero coverage cost; the child shares the
persistent compile cache, so warm runs stay fast.
"""
import os
import subprocess
import sys

import pytest


def test_distributed_suite_subprocess():
    cases = os.path.join(os.path.dirname(__file__), "dist_cases.py")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", cases, "-q", "--no-header",
         "-p", "no:cacheprovider", "-o", "addopts="],
        capture_output=True,
        text=True,
        timeout=3000,
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    if proc.returncode != 0:
        print(proc.stdout[-4000:])
        print(proc.stderr[-4000:])
    assert proc.returncode == 0, "distributed cases failed (see output)"
