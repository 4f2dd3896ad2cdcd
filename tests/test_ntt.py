"""NTT correctness: naive-DFT oracle, roundtrip, four-step equivalence.

Replaces the reference's file-driven byte-golden strategy
(/root/reference/tests/integration_ntt.rs:6-60) with a self-contained
oracle; byte-level golden vectors are exercised in test_runtime.py.
"""
import random

import numpy as np
import pytest

import jax.numpy as jnp

from blaze_tpu.fields import FIELDS, Field, int_to_limbs
from blaze_tpu.ntt import NTTPlan, FourStepNTT


def naive_ntt(vals, w, p):
    n = len(vals)
    return [
        sum(vals[i] * pow(w, i * k, p) for i in range(n)) % p for k in range(n)
    ]


def to_mont_dev(F, xs):
    return F.from_int(xs, mont=True)


@pytest.mark.parametrize("field_name", ["bn254_fr", "bls12_381_fr", "bls12_377_fr"])
def test_ntt_matches_naive_dft(field_name):
    spec = FIELDS[field_name]
    plan = NTTPlan(spec, 4)
    F = plan.field
    rng = random.Random(20)
    xs = [rng.randrange(spec.p) for _ in range(16)]
    got = F.to_int(plan.ntt(to_mont_dev(F, xs)))
    assert got == naive_ntt(xs, plan.w, spec.p)


def test_ntt_roundtrip():
    spec = FIELDS["bls12_381_fr"]
    plan = NTTPlan(spec, 8)
    F = plan.field
    rng = random.Random(21)
    xs = [rng.randrange(spec.p) for _ in range(256)]
    dev = to_mont_dev(F, xs)
    assert F.to_int(plan.intt(plan.ntt(dev))) == xs


def test_ntt_linearity_and_convolution():
    # NTT(a) * NTT(b) pointwise == NTT(cyclic_conv(a, b))
    spec = FIELDS["bn254_fr"]
    plan = NTTPlan(spec, 3)
    F = plan.field
    rng = random.Random(22)
    n, p = 8, spec.p
    a = [rng.randrange(p) for _ in range(n)]
    b = [rng.randrange(p) for _ in range(n)]
    conv = [
        sum(a[i] * b[(k - i) % n] for i in range(n)) % p for k in range(n)
    ]
    fa, fb = plan.ntt(to_mont_dev(F, a)), plan.ntt(to_mont_dev(F, b))
    prod = F.mul(fa, fb)
    assert F.to_int(plan.intt(prod)) == conv


def test_four_step_matches_single_pass():
    spec = FIELDS["bls12_381_fr"]
    single = NTTPlan(spec, 8)
    four = FourStepNTT(spec, 8, logn1=3)  # uneven split 8 = 3 + 5
    F = single.field
    rng = random.Random(23)
    xs = [rng.randrange(spec.p) for _ in range(256)]
    dev = to_mont_dev(F, xs)
    want = F.to_int(single.ntt(dev))
    assert F.to_int(four.ntt(dev)) == want
    assert F.to_int(four.intt(four.ntt(dev))) == xs


def test_batched_ntt():
    spec = FIELDS["bn254_fr"]
    plan = NTTPlan(spec, 4)
    F = plan.field
    rng = random.Random(24)
    batch = [[rng.randrange(spec.p) for _ in range(16)] for _ in range(3)]
    dev = jnp.stack([to_mont_dev(F, row) for row in batch])
    got = plan.ntt(dev)
    for i, row in enumerate(batch):
        assert F.to_int(got[i]) == naive_ntt(row, plan.w, spec.p)
