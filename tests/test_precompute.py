"""Precomputed-multiples MSM mode — the reference's 8x precompute sweep
(/root/reference/tests/integration_msm.rs precompute tests; oracle
expansion /root/reference/tests/msm/mod.rs:360-380) with the RunResults
timing surface (integration_msm.rs:265-282)."""
import random

import numpy as np
import pytest

import jax.numpy as jnp

from blaze_tpu.curves import CURVES, Curve, encode_affine_points, encode_scalars
from blaze_tpu.fields import int_to_limbs, limbs_to_int
from blaze_tpu.msm import MSM
from blaze_tpu.msm.precompute import precompute_points, split_scalars, shift_bits_for
from blaze_tpu.oracle import ECOracle, random_msm_instance
from blaze_tpu.runtime import MSMClient, MSMInit, MSMInput, MSMParams


def test_shift_bits_reference_geometry():
    # 256-bit scalars / factor 8 -> 32-bit windows: the reference's exact
    # geometry (msm_api.rs:39-40 + tests/msm/mod.rs:360-380)
    assert shift_bits_for(256, 8) == 32
    assert shift_bits_for(255, 8) == 32


def test_split_scalars_reassembles():
    spec = CURVES["bn254"]
    rng = random.Random(60)
    vals = [rng.randrange(spec.fr.p) for _ in range(5)]
    scal = jnp.asarray(np.stack([int_to_limbs(v, spec.fr.nlimbs) for v in vals]))
    sliced, bits = split_scalars(scal, 8, spec.fr.bits)
    assert bits == 32
    arr = np.asarray(sliced).reshape(8, 5, -1)
    for n, v in enumerate(vals):
        total = 0
        for i in range(8):
            total += limbs_to_int(arr[i, n]) << (32 * i)
        assert total == v


def test_msm_precomputed_matches_plain():
    spec = CURVES["bn254"]
    curve = Curve(spec)
    n = 8
    points, scalars, expected, _ = random_msm_instance(spec, n, seed=61)
    pts = curve.fq.to_mont(jnp.asarray(points))
    scal = jnp.asarray(scalars)
    msm = MSM(curve)

    expanded = precompute_points(curve, pts, 8)
    assert expanded.shape[0] == 8 * n
    res = msm.msm_precomputed(expanded, scal, 8, window_bits=8)
    aff = curve.to_affine(res[None])[0]
    got = (curve.fq.to_int(aff[0]), curve.fq.to_int(aff[1]))
    assert got == expected


@pytest.mark.slow
def test_msm_client_precompute_sweep_with_timings():
    """Client-level sweep over precompute factors, recording the
    set_data/wait/total surface (RunResults, integration_msm.rs:265-282).
    Wire order is point-major: each base followed by its multiples."""
    spec = CURVES["bn254"]
    curve = Curve(spec)
    oracle = ECOracle(spec)
    n = 8
    points, scalars, expected, _ = random_msm_instance(spec, n, seed=62)

    runs = {}
    for factor in (1, 8):
        if factor == 1:
            praw = encode_affine_points(points, spec)
        else:
            # expand host-side exactly like the reference oracle:
            # multiples by 2^(32*i), i = 0..7, point-major on the wire
            shift = shift_bits_for(spec.fr.bits, factor)
            expanded = []
            for (x, y) in (tuple(map(limbs_to_int, p)) for p in points):
                cur = (x, y)
                expanded.append(cur)
                for _ in range(factor - 1):
                    cur = oracle.mul(cur, 1 << shift)
                    expanded.append(cur)
            arr = np.stack(
                [
                    np.stack([int_to_limbs(x, spec.fq.nlimbs),
                              int_to_limbs(y, spec.fq.nlimbs)])
                    for x, y in expanded
                ]
            )
            praw = encode_affine_points(arr, spec)
        sraw = encode_scalars(scalars, spec)

        client = MSMClient(
            MSMInit(curve="bn254", precompute_factor=factor)
        )
        client.initialize(MSMParams(nof_elements=n))
        client.set_data(MSMInput(scalars=sraw, points=praw))
        client.start_process()
        client.wait_result()
        res = client.result()

        from blaze_tpu.curves import decode_projective_result

        proj = decode_projective_result(res.result, spec)
        x, y, z = (limbs_to_int(proj[i]) for i in range(3))
        p = spec.fq.p
        zinv = pow(z, -1, p)
        assert (x * zinv % p, y * zinv % p) == expected, f"factor={factor}"

        t = client.timings
        assert t.total_s > 0 and t.set_data_s >= 0 and t.wait_s >= 0
        runs[factor] = t

    # both factors produced a full timing record (the logged sweep surface)
    assert set(runs) == {1, 8}
