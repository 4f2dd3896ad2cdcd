"""Distribution layer on the 8-device virtual CPU mesh: sharded MSM and
four-step NTT with all_to_all must match single-device results — the
multi-device coverage the reference cannot have (single-card only)."""
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blaze_tpu.curves import CURVES, Curve
from blaze_tpu.dist import DistributedMSM, DistributedNTT, make_mesh
from blaze_tpu.fields import FIELDS, Field
from blaze_tpu.msm import MSM
from blaze_tpu.ntt import NTTPlan
from blaze_tpu.oracle import random_msm_instance

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_distributed_msm_matches_oracle():
    spec = CURVES["bn254"]
    curve = Curve(spec)
    mesh = make_mesh({"dp": 8})
    n = 64
    points, scalars, expected, _ = random_msm_instance(spec, n, seed=60)
    pts = curve.fq.to_mont(jnp.asarray(points))
    dmsm = DistributedMSM(curve, mesh, axis="dp")
    res = dmsm(pts, jnp.asarray(scalars), window_bits=4)
    aff = curve.to_affine(res[None])[0]
    got = (curve.fq.to_int(aff[0]), curve.fq.to_int(aff[1]))
    assert got == expected


def test_distributed_ntt_roundtrip_and_match():
    spec = FIELDS["bls12_381_fr"]
    F = Field(spec)
    mesh = make_mesh({"sp": 8})
    logn = 8
    dntt = DistributedNTT(spec, logn, mesh, axis="sp", logn1=4)
    rng = random.Random(61)
    xs = [rng.randrange(spec.p) for _ in range(1 << logn)]
    dev = F.from_int(xs)

    spec_out = dntt.ntt(dev)
    natural = dntt.spectral_to_natural(spec_out)
    single = NTTPlan(spec, logn)
    want = F.to_int(single.ntt(dev))
    assert F.to_int(natural) == want

    back = dntt.intt(spec_out)
    assert F.to_int(back) == xs


def test_distributed_msm_scalar_bits():
    """The masked-scalar short-window path the dry run uses (scalar_bits=8)
    must agree with an oracle MSM of the same masked scalars."""
    from blaze_tpu.oracle import ECOracle

    spec = CURVES["bn254"]
    curve = Curve(spec)
    mesh = make_mesh({"dp": 8})
    n = 64
    points, scalars, _, _ = random_msm_instance(spec, n, seed=63)
    masked = np.asarray(scalars).copy()
    masked[:, 0] &= 0xFF
    masked[:, 1:] = 0
    oracle = ECOracle(spec)
    pts_int = [
        (
            int(sum(int(v) << (16 * i) for i, v in enumerate(p[0]))),
            int(sum(int(v) << (16 * i) for i, v in enumerate(p[1]))),
        )
        for p in np.asarray(points)
    ]
    expected = oracle.msm(pts_int, [int(s[0]) for s in masked])

    pts = curve.fq.to_mont(jnp.asarray(points))
    dmsm = DistributedMSM(curve, mesh, axis="dp")
    res = dmsm(pts, jnp.asarray(masked), window_bits=4, scalar_bits=8)
    aff = curve.to_affine(res[None])[0]
    got = (curve.fq.to_int(aff[0]), curve.fq.to_int(aff[1]))
    assert got == expected


def test_distributed_msm_2d_mesh():
    # MSM on the dp axis of a 2D mesh (the dryrun_multichip layout)
    spec = CURVES["bn254"]
    curve = Curve(spec)
    mesh = make_mesh({"dp": 4, "sp": 2})
    n = 32
    points, scalars, expected, _ = random_msm_instance(spec, n, seed=62)
    pts = curve.fq.to_mont(jnp.asarray(points))
    dmsm = DistributedMSM(curve, mesh, axis="dp")
    res = dmsm(pts, jnp.asarray(scalars), window_bits=4)
    aff = curve.to_affine(res[None])[0]
    got = (curve.fq.to_int(aff[0]), curve.fq.to_int(aff[1]))
    assert got == expected


def test_pipeline_dist_ntt_feeds_msm():
    """BASELINE config 5 composition on a mesh: the sharded NTT's
    spectral output becomes the dp-sharded MSM's scalars, end to end in
    one flow, oracle-checked (delta input -> scalars are W^i)."""
    from blaze_tpu.oracle import ECOracle, tiled_msm_instance
    from blaze_tpu.pipeline import ProofPipeline

    spec = CURVES["bn254"]
    curve = Curve(spec)
    mesh = make_mesh({"dp": 2, "sp": 4})
    ntt_logn, msm_logn = 6, 5
    n_msm = 1 << msm_logn

    pipe = ProofPipeline(curve, ntt_logn, msm_logn, mesh=mesh)

    # delta_1 coefficients -> NTT gives W^t in natural order
    F = Field(spec.fr)
    coeffs = np.zeros((1 << ntt_logn,), dtype=object)
    ints = [0] * (1 << ntt_logn)
    ints[1] = 1
    x = F.from_int(ints)

    points, _, _, dbg = tiled_msm_instance(spec, n_msm, seed=77)
    pts_mont = curve.fq.to_mont(jnp.asarray(points))

    mask = np.zeros(spec.fr.nlimbs, np.uint32)
    mask[0] = 0xFF                         # 8 live scalar bits
    out = pipe.run_dist(x, pts_mont, window_bits=4, scalar_bits=8,
                        scalar_mask=mask)
    jax.block_until_ready(out)

    aff = curve.to_affine(out[None])[0]
    got = (curve.fq.to_int(aff[0]), curve.fq.to_int(aff[1]))

    w = spec.fr.root_of_unity(ntt_logn)
    p = spec.fr.p
    scalars = [pow(w, i, p) & 0xFF for i in range(n_msm)]
    expected = ECOracle(spec).msm(dbg["points"][:n_msm], scalars)
    assert got == expected
