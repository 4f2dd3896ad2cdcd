"""Fused Poseidon permutation kernel (hash/kernels.py) vs the oracle.

Interpreter-mode run of the exact kernel the TPU executes — full rounds,
partial rounds, byte-matrix MDS, group splitting (t = 12 exercises the
8+4 two-group path; t = 9 the 8+1 path).
"""
import random

import numpy as np
import pytest

import jax.numpy as jnp

from blaze_tpu.fields import FIELDS
from blaze_tpu.hash.kernels import PoseidonKernels
from blaze_tpu.hash.params import generate_params
from blaze_tpu.oracle.poseidon_ref import poseidon_permutation_ref

SPEC = FIELDS["bls12_381_fr"]
L = SPEC.nlimbs


def _to_mont_limbs(v):
    from blaze_tpu.fields.spec import int_to_limbs

    return int_to_limbs((v * SPEC.r) % SPEC.p, L)


def _from_mont_int(limbs):
    from blaze_tpu.fields.spec import limbs_to_int

    return (limbs_to_int(limbs) * pow(SPEC.r, -1, SPEC.p)) % SPEC.p


def _check_t(t, batch=3, seed=77):
    params = generate_params(SPEC, t)
    kern = PoseidonKernels.for_params(params, interpret=True)
    rng = random.Random(seed)
    states = [[rng.randrange(SPEC.p) for _ in range(t)] for _ in range(batch)]
    mont = np.stack(
        [np.stack([_to_mont_limbs(v) for v in s]) for s in states]
    ).astype(np.uint32)                                   # (B, t, L)
    lm = jnp.moveaxis(jnp.asarray(mont), 0, -1)           # (t, L, B)
    out = np.asarray(kern.permute_lm(lm))                 # (t, L, B)
    for bi, s in enumerate(states):
        want = poseidon_permutation_ref(params, s)
        got = [_from_mont_int(out[i, :, bi]) for i in range(t)]
        assert got == want, f"t={t} batch row {bi}"


@pytest.mark.slow
def test_fused_permutation_t12():
    _check_t(12)


def test_fused_permutation_t9():
    _check_t(9)


def test_permute_pm_adapter():
    params = generate_params(SPEC, 3)
    kern = PoseidonKernels.for_params(params, interpret=True)
    rng = random.Random(5)
    s = [rng.randrange(SPEC.p) for _ in range(3)]
    mont = np.stack([_to_mont_limbs(v) for v in s]).astype(np.uint32)
    out = np.asarray(kern.permute_pm(jnp.asarray(mont)[None])[0])
    want = poseidon_permutation_ref(params, s)
    assert [_from_mont_int(out[i]) for i in range(3)] == want


def test_convert_in_matches_explicit_mont():
    """permute_lm(convert_in=True) on CANONICAL input must equal the
    permutation of the explicitly Montgomery-converted state (the
    in-kernel R^2 fold that replaces the standalone to_mont pass)."""
    t = 9
    params = generate_params(SPEC, t)
    kern = PoseidonKernels.for_params(params, interpret=True)
    rng = random.Random(5)
    states = [[rng.randrange(SPEC.p) for _ in range(t)] for _ in range(2)]
    from blaze_tpu.fields.spec import int_to_limbs

    canon = np.stack(
        [np.stack([int_to_limbs(v, L) for v in s]) for s in states]
    ).astype(np.uint32)
    mont = np.stack(
        [np.stack([_to_mont_limbs(v) for v in s]) for s in states]
    ).astype(np.uint32)
    lm_c = jnp.moveaxis(jnp.asarray(canon), 0, -1)
    lm_m = jnp.moveaxis(jnp.asarray(mont), 0, -1)
    got = np.asarray(kern.permute_lm(lm_c, convert_in=True))
    want = np.asarray(kern.permute_lm(lm_m))
    assert np.array_equal(got, want)
