"""Pippenger MSM vs the python oracle (the reference's integration-test
role, cf. /root/reference/tests/integration_msm.rs)."""
import numpy as np
import pytest

import jax.numpy as jnp

from blaze_tpu.curves import CURVES, Curve
from blaze_tpu.msm import MSM, MSMConfig
from blaze_tpu.oracle import ECOracle, random_msm_instance, tiled_msm_instance


def run_msm(curve_name, n, seed, window_bits=None, tiled=False, config=None):
    spec = CURVES[curve_name]
    curve = Curve(spec)
    gen = tiled_msm_instance if tiled else random_msm_instance
    points, scalars, expected, _ = gen(spec, n, seed)
    # canonical -> Montgomery on device
    pts = curve.fq.to_mont(jnp.asarray(points))
    msm = MSM(curve, config or MSMConfig())
    result = msm(pts, jnp.asarray(scalars), window_bits=window_bits)
    got_aff = curve.to_affine(result[None])[0]
    if np.asarray(curve.is_identity(result[None]))[0]:
        got = None
    else:
        got = (curve.fq.to_int(got_aff[0]), curve.fq.to_int(got_aff[1]))
    assert np.asarray(curve.on_curve(result[None]))[0]
    assert got == expected, f"{curve_name} n={n}"


def test_msm_bn254_small():
    # minimum end-to-end slice: BN254 2^10 (BASELINE.json config 1)
    run_msm("bn254", 1 << 10, seed=1, window_bits=8)


def test_msm_bn254_tiny_edge():
    run_msm("bn254", 3, seed=2, window_bits=4)


def test_msm_bls12_381():
    run_msm("bls12_381", 257, seed=3, window_bits=8)


@pytest.mark.slow
def test_msm_bls12_377():
    run_msm("bls12_377", 64, seed=4, window_bits=8)


@pytest.mark.slow
def test_msm_tiled_large():
    # the reference's tiled-generation trick for big-N oracle checks
    run_msm("bn254", 1 << 12, seed=5, window_bits=8, tiled=True)


@pytest.mark.slow
def test_msm_chunked():
    # force multiple chunks through the accumulation path
    run_msm(
        "bn254",
        1 << 10,
        seed=6,
        window_bits=8,
        tiled=True,
        config=MSMConfig(chunk_log2=8),
    )


def test_msm_zero_and_dup_scalars():
    spec = CURVES["bn254"]
    curve = Curve(spec)
    oracle = ECOracle(spec)
    import random

    rng = random.Random(7)
    pts = [oracle.random_point(rng) for _ in range(8)]
    pts[3] = pts[2]                      # duplicate point
    scalars = [0, 1, 2, spec.fr.p - 1, 7, 7, 0, 12345]
    expected = oracle.msm(pts, scalars)

    from blaze_tpu.fields.spec import int_to_limbs

    parr = np.stack(
        [
            np.stack([int_to_limbs(x, spec.fq.nlimbs), int_to_limbs(y, spec.fq.nlimbs)])
            for x, y in pts
        ]
    )
    sarr = np.stack([int_to_limbs(s, spec.fr.nlimbs) for s in scalars])
    msm = MSM(curve)
    res = msm(curve.fq.to_mont(jnp.asarray(parr)), jnp.asarray(sarr), window_bits=4)
    aff = curve.to_affine(res[None])[0]
    got = (curve.fq.to_int(aff[0]), curve.fq.to_int(aff[1]))
    assert got == expected


def test_fused_msm_interpret_matches_oracle():
    """The COMPLETE fused-kernel MSM path (digits -> sort -> MXU hist ->
    Pallas scan -> fused bucket reduction -> Horner fold) under the
    Pallas interpreter on CPU, vs the host oracle — the chip path's
    full-algorithm CPU validation."""
    import jax.numpy as jnp
    import numpy as np

    from blaze_tpu.curves import CURVES, Curve
    from blaze_tpu.msm import MSM, MSMConfig
    from blaze_tpu.oracle import tiled_msm_instance

    spec = CURVES["bn254"]
    curve = Curve(spec)
    msm = MSM(curve, MSMConfig(fused="on", interpret=True, kernel_tile=128))
    n, c = 128, 6
    points, scalars, exp_aff, _ = tiled_msm_instance(spec, n, seed=31)
    # few live bits: the interpreter executes every lane serially
    scal = np.asarray(scalars).copy()
    scal[:, 0] &= 0xFFF
    scal[:, 1:] = 0
    from blaze_tpu.oracle import ECOracle

    pts_int = [
        (
            int(sum(int(v) << (16 * i) for i, v in enumerate(p[0]))),
            int(sum(int(v) << (16 * i) for i, v in enumerate(p[1]))),
        )
        for p in np.asarray(points)
    ]
    expected = ECOracle(spec).msm(pts_int, [int(s[0]) for s in scal])

    pts = curve.fq.to_mont(jnp.asarray(points))
    out = msm(pts, jnp.asarray(scal), window_bits=c, scalar_bits=12)
    aff = curve.to_affine(out[None])[0]
    got = (curve.fq.to_int(aff[0]), curve.fq.to_int(aff[1]))
    assert got == expected


def test_signed_recode_exact():
    """Balanced digits reconstruct the scalar exactly: sum of
    (-1)^sign * mag * 2^(c*w) == scalar, mags <= 2^(c-1), incl. the
    all-ones top-edge scalar."""
    import numpy as np
    import jax.numpy as jnp

    from blaze_tpu.msm import MSM
    from blaze_tpu.curves import CURVES, Curve

    msm = MSM(Curve(CURVES["bn254"]))
    c, nwin, bits = 8, 4, 31
    rng = np.random.default_rng(2)
    vals = [int(v) for v in rng.integers(0, 1 << bits, size=64)]
    vals += [0, 1, (1 << bits) - 1, (1 << (bits - 1))]
    digits = np.stack(
        [np.array([(v >> (c * w)) & ((1 << c) - 1) for v in vals],
                  dtype=np.uint32) for w in range(nwin)]
    )
    mag, sgn = msm._signed_recode(jnp.asarray(digits), c)
    mag, sgn = np.asarray(mag, dtype=np.int64), np.asarray(sgn)
    assert mag.max() <= 1 << (c - 1)
    for i, v in enumerate(vals):
        got = sum(
            int(mag[w, i]) * (-1 if sgn[w, i] else 1) * (1 << (c * w))
            for w in range(nwin)
        )
        assert got == v, (i, v, got)


def test_fused_msm_interpret_signed_digits():
    """Signed-digit (balanced-window) fused MSM under the interpreter vs
    the host oracle — halved buckets, in-kernel Y negation."""
    import jax.numpy as jnp
    import numpy as np

    from blaze_tpu.curves import CURVES, Curve
    from blaze_tpu.msm import MSM, MSMConfig
    from blaze_tpu.oracle import ECOracle, tiled_msm_instance

    spec = CURVES["bn254"]
    curve = Curve(spec)
    msm = MSM(curve, MSMConfig(fused="on", interpret=True, kernel_tile=128,
                               signed_digits=True))
    n, c = 128, 6
    points, scalars, _, _ = tiled_msm_instance(spec, n, seed=53)
    scal = np.asarray(scalars).copy()
    scal[:, 0] &= 0x7FF                       # 11 live bits <= c*nwin - 1
    scal[:, 1:] = 0
    pts_int = [
        (
            int(sum(int(v) << (16 * i) for i, v in enumerate(p[0]))),
            int(sum(int(v) << (16 * i) for i, v in enumerate(p[1]))),
        )
        for p in np.asarray(points)
    ]
    expected = ECOracle(spec).msm(pts_int, [int(s[0]) for s in scal])
    pts = curve.fq.to_mont(jnp.asarray(points))
    out = msm(pts, jnp.asarray(scal), window_bits=c, scalar_bits=12)
    aff = curve.to_affine(out[None])[0]
    got = (curve.fq.to_int(aff[0]), curve.fq.to_int(aff[1]))
    assert got == expected
