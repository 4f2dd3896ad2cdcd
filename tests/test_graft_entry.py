"""Execute the driver entry points, mesh work isolated in a subprocess.

Running `dryrun_multichip(8)` here has a second job beyond coverage: the
suite shares the persistent XLA compilation cache with the driver's own
dry-run invocation (same 8-virtual-CPU-device environment, same shapes),
so the driver sees warm-cache compile times instead of cold single-vCPU
XLA:CPU compiles.

The dry run creates a mesh and runs collectives; those executables corrupt
the XLA:CPU process heap (see tests/test_dist.py docstring), so it runs in
a child process — which also matches how the driver invokes it.
"""
import os
import subprocess
import sys


def test_dryrun_multichip_8():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the child pins itself (conftest-free)
    # a CPU-only child must not register the axon TPU plugin at all: with
    # the tunnel relay down, plugin discovery hangs/errors before
    # JAX_PLATFORMS=cpu is even consulted
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as ge; ge.dryrun_multichip(8)"],
        capture_output=True,
        text=True,
        timeout=2400,
        cwd=os.path.dirname(os.path.dirname(__file__)),
        env=env,
    )
    if proc.returncode != 0:
        print(proc.stdout[-4000:])
        print(proc.stderr[-4000:])
    assert proc.returncode == 0, "dryrun_multichip(8) failed (see output)"
    assert "dryrun_multichip OK" in proc.stdout
