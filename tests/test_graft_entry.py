"""Execute the driver entry points on the CI mesh.

Running `dryrun_multichip(8)` here has a second job beyond coverage: the
suite shares the persistent XLA compilation cache with the driver's own
dry-run invocation (same 8-virtual-CPU-device environment, same shapes),
so the driver sees warm-cache compile times instead of cold single-vCPU
XLA:CPU compiles.
"""
import jax
import pytest

import __graft_entry__ as ge

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)
