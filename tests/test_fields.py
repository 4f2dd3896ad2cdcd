"""Field arithmetic vs python-int oracle (every supported field)."""
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blaze_tpu.fields import (
    FIELDS,
    Field,
    bytes_to_limbs,
    limbs_to_bytes,
    int_to_limbs,
    limbs_to_int,
)

BATCH = 17  # deliberately non-aligned


def rand_ints(p, n, rng):
    return [rng.randrange(p) for _ in range(n)]


@pytest.fixture(params=sorted(FIELDS), ids=sorted(FIELDS))
def field(request):
    return Field(FIELDS[request.param])


def to_dev(F, xs):
    return F.from_int(xs, mont=True)


def test_limb_roundtrip():
    rng = random.Random(0)
    for name, spec in FIELDS.items():
        for _ in range(5):
            x = rng.randrange(spec.p)
            assert limbs_to_int(int_to_limbs(x, spec.nlimbs)) == x


def test_mont_roundtrip(field):
    rng = random.Random(1)
    xs = rand_ints(field.spec.p, BATCH, rng)
    assert field.to_int(to_dev(field, xs)) == xs


def test_add_sub_neg(field):
    rng = random.Random(2)
    p = field.spec.p
    xs, ys = rand_ints(p, BATCH, rng), rand_ints(p, BATCH, rng)
    a, b = to_dev(field, xs), to_dev(field, ys)
    assert field.to_int(field.add(a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert field.to_int(field.sub(a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert field.to_int(field.neg(a)) == [(-x) % p for x in xs]
    zero = field.zeros((2,))
    assert field.to_int(field.neg(zero)) == [0, 0]


def test_mul(field):
    rng = random.Random(3)
    p = field.spec.p
    xs, ys = rand_ints(p, BATCH, rng), rand_ints(p, BATCH, rng)
    # include adversarial values
    xs[0], ys[0] = p - 1, p - 1
    xs[1], ys[1] = 0, p - 1
    xs[2], ys[2] = 1, 1
    a, b = to_dev(field, xs), to_dev(field, ys)
    got = field.to_int(field.mul(a, b))
    assert got == [(x * y) % p for x, y in zip(xs, ys)]


def test_mul_jit_and_broadcast(field):
    rng = random.Random(4)
    p = field.spec.p
    xs, y = rand_ints(p, BATCH, rng), rng.randrange(p)
    a = to_dev(field, xs)
    b = to_dev(field, [y])  # (1, L) broadcasts against (BATCH, L)
    got = field.to_int(jax.jit(field.mul)(a, b))
    assert got == [(x * y) % p for x in xs]


def test_square_pow_inv(field):
    rng = random.Random(5)
    p = field.spec.p
    xs = rand_ints(p, 5, rng)
    a = to_dev(field, xs)
    assert field.to_int(field.square(a)) == [x * x % p for x in xs]
    assert field.to_int(field.pow(a, 5)) == [pow(x, 5, p) for x in xs]
    inv = field.inv(a)
    assert field.to_int(field.mul(a, inv)) == [1] * 5
    # inv(0) == 0
    assert field.to_int(field.inv(field.zeros((1,)))) == [0]


def test_codec_roundtrip(field):
    rng = random.Random(6)
    spec = field.spec
    xs = rand_ints(spec.p, BATCH, rng)
    limbs = np.stack([int_to_limbs(x, spec.nlimbs) for x in xs])
    raw = limbs_to_bytes(limbs, spec)
    assert len(raw) == BATCH * spec.nbytes
    back = bytes_to_limbs(raw, spec)
    assert [limbs_to_int(r) for r in back] == xs


def test_scalar_wire_width():
    # contract from the reference: all scalars are 32 B LE
    # (/root/reference/src/ingo_msm/msm_cfg.rs scalar_size: 32)
    for name in ("bn254_fr", "bls12_381_fr", "bls12_377_fr"):
        assert FIELDS[name].nbytes == 32
    # BLS base-field coords 48 B, BN254 coords 32 B
    assert FIELDS["bls12_381_fq"].nbytes == 48
    assert FIELDS["bls12_377_fq"].nbytes == 48
    assert FIELDS["bn254_fq"].nbytes == 32


def test_root_of_unity():
    for name in ("bn254_fr", "bls12_381_fr", "bls12_377_fr"):
        spec = FIELDS[name]
        w = spec.root_of_unity(10)
        assert pow(w, 1 << 10, spec.p) == 1
        assert pow(w, 1 << 9, spec.p) != 1
