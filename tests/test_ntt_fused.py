"""Fused-kernel NTT (ntt/kernels.py, ntt/fused.py) vs the portable plan.

Runs the Pallas kernels in interpreter mode so the fused path — the one
the TPU executes — is covered by the hardware-free suite (the reference
can't do this at all: its kernel is an opaque bitstream,
`/root/reference/src/ingo_ntt/ntt_api.rs:58-70`).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from blaze_tpu.fields import FIELDS
from blaze_tpu.fields.spec import int_to_limbs
from blaze_tpu.ntt import FusedNTT, NTTKernels, NTTPlan, split_parts

SPEC = FIELDS["bn254_fr"]
L = SPEC.nlimbs


def rand_mont(n, seed=5):
    rng = np.random.default_rng(seed)
    vals = [int(rng.integers(0, 1 << 62)) * 982451653 % SPEC.p for _ in range(n)]
    return np.stack([int_to_limbs((v * SPEC.r) % SPEC.p, L) for v in vals])


def test_split_parts():
    assert split_parts(27, 9) == [9, 9, 9]
    assert split_parts(22, 9) == [8, 7, 7]
    assert split_parts(9, 9) == [9]
    assert split_parts(4, 9) == [4]


def test_mul_lm_matches_field():
    kern = NTTKernels.for_spec(SPEC, interpret=True)
    f = NTTPlan(SPEC, 1).field
    a, b, c = rand_mont(8, 1), rand_mont(8, 2), rand_mont(8, 3)
    alm = jnp.moveaxis(jnp.asarray(a), 0, 1)[None]
    blm = jnp.moveaxis(jnp.asarray(b), 0, 1)[None]
    clm = jnp.moveaxis(jnp.asarray(c), 0, 1)[None]
    got2 = np.moveaxis(np.asarray(kern.mul_lm(alm, blm), np.uint32)[0], 0, 1)
    assert (got2 == np.asarray(f.mul(jnp.asarray(a), jnp.asarray(b)))).all()
    got3 = np.moveaxis(
        np.asarray(kern.mul_lm(alm, blm, clm), np.uint32)[0], 0, 1
    )
    want3 = f.mul(f.mul(jnp.asarray(a), jnp.asarray(b)), jnp.asarray(c))
    assert (got3 == np.asarray(want3)).all()


@pytest.mark.parametrize("logn,klog", [(4, 9), (6, 3)])
def test_fused_matches_portable(logn, klog):
    n = 1 << logn
    x = rand_mont(n, seed=logn)
    plan = NTTPlan(SPEC, logn)
    fused = FusedNTT(SPEC, logn, klog=klog, interpret=True)
    assert (
        np.asarray(fused.ntt(jnp.asarray(x)))
        == np.asarray(plan.ntt(jnp.asarray(x)))
    ).all()
    assert (
        np.asarray(fused.intt(jnp.asarray(x)))
        == np.asarray(plan.intt(jnp.asarray(x)))
    ).all()


@pytest.mark.slow
def test_fused_three_level_roundtrip():
    # parts [3, 2, 2]: exercises depth-2 recursion + both twiddle nodes
    logn = 7
    x = rand_mont(1 << logn, seed=99)
    fused = FusedNTT(SPEC, logn, klog=3, interpret=True)
    assert fused.parts == [3, 2, 2]
    rt = np.asarray(fused.intt(fused.ntt(jnp.asarray(x))))
    assert (rt == x).all()


@pytest.mark.slow
def test_blocked_layout_roundtrip_and_match():
    # blocked boundary layout (block=8 so interpreter sizes stay tiny):
    # must be bit-identical to the flat u16 path and roundtrip exactly
    logn = 7
    x = rand_mont(1 << logn, seed=101).astype(np.uint16)
    fused = FusedNTT(SPEC, logn, klog=3, interpret=True, block=8)
    assert fused.ntt_blocked_available()
    xb = fused.to_blocked(x)
    assert (fused.from_blocked(xb) == x).all()

    got = fused.from_blocked(np.asarray(fused.ntt16b(jnp.asarray(xb))))
    want = np.asarray(fused.ntt16(jnp.asarray(x)))
    assert (got == want).all()

    rt = fused.from_blocked(
        np.asarray(fused.intt16b(fused.ntt16b(jnp.asarray(xb))))
    )
    assert (rt == x).all()


def test_twiddle_mul_kernel_path_matches_portable():
    """Force the block-indexed twiddle kernel (no gathers) under the
    interpreter at small sizes covering BOTH branches: B == 1 (depth-0
    S-cells) and B > 1 (deeper levels), vs the portable plan."""
    import numpy as np
    import jax.numpy as jnp

    from blaze_tpu.fields import FIELDS
    from blaze_tpu.ntt import FusedNTT, NTTPlan

    spec = FIELDS["bls12_381_fr"]
    logn = 9
    fused = FusedNTT(spec, logn, klog=3, interpret=True)  # parts [3,3,3]
    fused._TWMUL_MIN_LANES = 1        # always take the kernel path
    plan = NTTPlan(spec, logn)
    rng = np.random.default_rng(11)
    x = rng.integers(0, 1 << 14, size=(1 << logn, spec.nlimbs),
                     dtype=np.uint16).astype(np.uint32)
    xd = jnp.asarray(x)
    assert np.array_equal(np.asarray(fused.ntt(xd)), np.asarray(plan.ntt(xd)))
    assert np.array_equal(np.asarray(fused.intt(xd)),
                          np.asarray(plan.intt(xd)))
