"""Fused-kernel path on real TPU hardware (skipped elsewhere).

Run with `BLZ_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_fused.py`
(conftest.py pins the rest of the suite to virtual CPU devices).  Covers
every fused Pallas kernel — scan_mixed / reduce_cols / dbl_n / fold_horner
against the portable group law, the lanes-major MSM end to end vs the CPU
oracle for all three reference curves (msm_cfg.rs:44-92, incl. bls12_377),
the fused NTT vs the portable plan, and the fused Poseidon permutation vs
the host oracle.  The driver-visible artifacts ORACLE_TPU.json /
NTT_TPU.json record the larger-scale equivalents (experiments/).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU backend"
)

CURVE_NAMES = ("bls12_381", "bls12_377", "bn254")


def _curve(name):
    from blaze_tpu.curves import CURVES, Curve

    return Curve(CURVES[name])


def _affine_of(curve, result):
    aff = curve.to_affine(result[None])[0]
    if np.asarray(curve.is_identity(result[None]))[0]:
        return None
    assert np.asarray(curve.on_curve(result[None]))[0], "off curve"
    return (curve.fq.to_int(aff[0]), curve.fq.to_int(aff[1]))


def _canon(curve, x):
    return curve.fq._cond_sub_p(
        jnp.asarray(x, jnp.uint32), jnp.zeros(np.asarray(x).shape[:-1],
                                              jnp.uint32)
    )


# ------------------------------------------------------------ end to end
@pytest.mark.parametrize("curve_name", CURVE_NAMES)
def test_fused_msm_matches_oracle(curve_name):
    from blaze_tpu.msm import MSM, MSMConfig
    from blaze_tpu.oracle import tiled_msm_instance

    curve = _curve(curve_name)
    msm = MSM(curve, MSMConfig(fused="on"))
    n, c = 256, 8
    points, scalars, exp_aff, _ = tiled_msm_instance(curve.spec, n, seed=41)
    pts = curve.fq.to_mont(jnp.asarray(points))
    out = msm(pts, jnp.asarray(scalars), window_bits=c)
    assert _affine_of(curve, out) == exp_aff


@pytest.mark.parametrize("curve_name", CURVE_NAMES)
def test_fused_msm_lanes_major(curve_name):
    """The xy-packed residency layout (what MSMClient stages on TPU)."""
    from blaze_tpu.msm import MSM, MSMConfig, points_to_resident
    from blaze_tpu.msm.residency import scalars_to_resident
    from blaze_tpu.oracle import tiled_msm_instance

    curve = _curve(curve_name)
    msm = MSM(curve, MSMConfig(fused="on"))
    n, c = 512, 8
    points, scalars, exp_aff, _ = tiled_msm_instance(curve.spec, n, seed=43)
    pts_lm = points_to_resident(curve, jnp.asarray(points))
    scal_lm = jnp.asarray(scalars_to_resident(np.asarray(scalars)))
    out = msm(pts_lm, scal_lm, window_bits=c)
    assert _affine_of(curve, out) == exp_aff


# ------------------------------------------------------- kernel-by-kernel
def _rand_points_mont(curve, n, seed):
    from blaze_tpu.oracle import tiled_msm_instance

    points, _, _, _ = tiled_msm_instance(curve.spec, n, seed=seed)
    return curve.fq.to_mont(jnp.asarray(points))        # (n, 2, L) affine


def test_scan_mixed_matches_portable():
    from blaze_tpu.curves.kernels import ECKernels

    curve = _curve("bls12_381")
    kern = ECKernels.for_curve(curve.spec, tile=512)
    L = curve.nlimbs
    C, B = 5, 256
    pts = _rand_points_mont(curve, C * B, seed=11).reshape(C, B, 2, L)

    rows = jnp.moveaxis(pts.reshape(C, B, 2 * L), -1, 1).astype(jnp.uint16)
    emitted, tot = kern.scan_mixed(rows)                # (C,3L,B) u16, (3L,B)

    acc = jnp.broadcast_to(curve.identity(), (B, 3, L))
    for i in range(C):
        acc = curve.add_mixed(acc, pts[i])
        got = _canon(
            curve,
            jnp.moveaxis(emitted[i].reshape(3, L, B), -1, 0),
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(acc))
    got_tot = _canon(curve, jnp.moveaxis(tot.reshape(3, L, B), -1, 0))
    np.testing.assert_array_equal(np.asarray(got_tot), np.asarray(acc))


def test_reduce_cols_matches_portable():
    from blaze_tpu.curves.kernels import ECKernels

    curve = _curve("bls12_381")
    kern = ECKernels.for_curve(curve.spec, tile=512)
    L = curve.nlimbs
    C, B = 7, 128
    aff = _rand_points_mont(curve, C * B, seed=13).reshape(C, B, 2, L)
    one = curve.fq.from_int([1])[0]
    proj = jnp.concatenate(
        [aff, jnp.broadcast_to(one, (C, B, 1, L))], axis=2
    )                                                    # (C, B, 3, L)

    rows = jnp.moveaxis(proj.reshape(C, B, 3 * L), -1, 1).astype(jnp.uint16)
    tot = kern.reduce_cols(rows)                         # (3L, B)

    want = proj[0]
    for i in range(1, C):
        want = curve.add(want, proj[i])
    got = _canon(curve, jnp.moveaxis(tot.reshape(3, L, B), -1, 0))
    # Projective representatives are not unique (the kernel's fold starts
    # from the identity, which λ-scales the RCB output) — compare affine.
    np.testing.assert_array_equal(
        np.asarray(curve.to_affine(got)), np.asarray(curve.to_affine(want))
    )


def test_dbl_n_matches_portable():
    from blaze_tpu.curves.kernels import ECKernels

    curve = _curve("bls12_381")
    kern = ECKernels.for_curve(curve.spec, tile=512)
    L = curve.nlimbs
    B, k = 64, 6
    aff = _rand_points_mont(curve, B, seed=17)
    one = curve.fq.from_int([1])[0]
    proj = jnp.concatenate([aff, jnp.broadcast_to(one, (B, 1, L))], axis=1)

    lm = jnp.moveaxis(proj, 0, -1).reshape(3 * L, B)
    out = kern.dbl_n(lm, k)

    want = proj
    for _ in range(k):
        want = curve.dbl(want)
    got = _canon(curve, jnp.moveaxis(out.reshape(3, L, B), -1, 0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fold_horner_matches_portable():
    from blaze_tpu.curves.kernels import ECKernels
    from blaze_tpu.msm import MSM

    curve = _curve("bls12_381")
    kern = ECKernels.for_curve(curve.spec, tile=512)
    msm = MSM(curve)
    L = curve.nlimbs
    W, c = 9, 5
    aff = _rand_points_mont(curve, W, seed=19)
    one = curve.fq.from_int([1])[0]
    wsums = jnp.concatenate([aff, jnp.broadcast_to(one, (W, 1, L))], axis=1)

    lm = jnp.moveaxis(wsums, 0, -1).reshape(3 * L, W)
    out = kern.fold_horner(lm, c)                        # (3L,)
    got = _canon(curve, out.reshape(3, L))
    want = msm.fold_windows(wsums, c)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# ----------------------------------------------------------- NTT/Poseidon
def test_fused_ntt_vs_portable():
    from blaze_tpu.fields import FIELDS
    from blaze_tpu.ntt import FusedNTT, NTTPlan

    spec = FIELDS["bls12_381_fr"]
    logn = 12
    rng = np.random.default_rng(23)
    x16 = rng.integers(0, 1 << 16, size=(1 << logn, spec.nlimbs),
                       dtype=np.uint16)
    x16[:, -1] &= 0x3FFF
    x = jnp.asarray(x16.astype(np.uint32))
    fused = FusedNTT(spec, logn)
    plan = NTTPlan(spec, logn)
    np.testing.assert_array_equal(np.asarray(fused.ntt(x)),
                                  np.asarray(plan.ntt(x)))
    np.testing.assert_array_equal(np.asarray(fused.intt(x)),
                                  np.asarray(plan.intt(x)))


def test_fused_poseidon_vs_oracle():
    import random

    from blaze_tpu.fields import FIELDS
    from blaze_tpu.hash.kernels import PoseidonKernels
    from blaze_tpu.hash.params import generate_params
    from blaze_tpu.fields.spec import int_to_limbs, limbs_to_int
    from blaze_tpu.oracle.poseidon_ref import poseidon_permutation_ref

    spec = FIELDS["bls12_381_fr"]
    L = spec.nlimbs
    for t in (12, 9):
        params = generate_params(spec, t)
        kern = PoseidonKernels.for_params(params)        # real kernel, no interpret
        rng = random.Random(29 + t)
        state = [rng.randrange(spec.p) for _ in range(t)]
        mont = np.stack(
            [int_to_limbs((v * spec.r) % spec.p, L) for v in state]
        ).astype(np.uint32)
        out = np.asarray(kern.permute_lm(jnp.asarray(mont)[..., None]))[..., 0]
        want = poseidon_permutation_ref(params, state)
        rinv = pow(spec.r, -1, spec.p)
        got = [(limbs_to_int(out[i]) * rinv) % spec.p for i in range(t)]
        assert got == want, f"t={t}"


def test_dist_fused_single_device_mesh():
    """DistributedMSM routes shards through the fused Pallas chunk path on
    a TPU mesh (msm_dist.py: fused=True under shard_map) — verified
    oracle-exact on a 1-device mesh (multi-chip isn't available here; the
    8-virtual-device CPU dryrun covers the collective layout)."""
    from jax.sharding import Mesh

    from blaze_tpu.dist import DistributedMSM
    from blaze_tpu.msm import MSMConfig
    from blaze_tpu.oracle import tiled_msm_instance

    curve = _curve("bls12_381")
    mesh = Mesh(np.array(jax.devices()[:1]), ("dp",))
    dmsm = DistributedMSM(curve, mesh, axis="dp",
                          config=MSMConfig(fused="on"))
    n = 256
    points, scalars, exp_aff, _ = tiled_msm_instance(curve.spec, n, seed=47)
    pts = curve.fq.to_mont(jnp.asarray(points))
    out = dmsm(pts, jnp.asarray(scalars), window_bits=8)
    assert _affine_of(curve, out) == exp_aff


def test_ntt_client_blocked_lifecycle():
    """The client lifecycle IS the at-scale NTT interface (the reference
    runs its fixed 2^27 through set_data/start/wait/result,
    ntt_api.rs:72-125).  At logn=16 the blocked u16 residency engages
    (parts [8, 8] -> A = C = 256): canonical wire bytes in, canonical
    bytes out with no Montgomery passes, checked against the fused plan
    driven explicitly through to_mont/from_mont, plus a bit-exact
    inverse round-trip."""
    from blaze_tpu.fields import FIELDS
    from blaze_tpu.runtime.clients import NTTClient, NTTInit, NTTInput

    spec = FIELDS["bls12_381_fr"]
    logn, n = 16, 1 << 16
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 16, size=(n, spec.nlimbs), dtype=np.uint16)
    vals[:, -1] &= 0x3FFF                     # keep < p (255-bit field)
    data = vals.astype("<u2").tobytes()

    cl = NTTClient(NTTInit(field=spec, logn=logn))
    assert cl._blocked, "blocked residency should engage on TPU at 2^16"
    cl.set_data(NTTInput(data=data))
    cl.start_process()
    cl.wait_result()
    out = cl.result()

    # independent reference: the same plan driven mont-explicitly
    f = cl.plan.field
    x = jnp.asarray(vals.astype(np.uint32))
    ref = np.asarray(f.from_mont(cl.plan.ntt(f.to_mont(x))))
    got = np.frombuffer(out, dtype="<u2").reshape(n, spec.nlimbs)
    assert np.array_equal(got.astype(np.uint32), ref)

    inv = NTTClient(NTTInit(field=spec, logn=logn), inverse=True)
    inv.set_data(NTTInput(data=out))
    inv.start_process()
    inv.wait_result()
    assert inv.result() == data


def test_poseidon_client_tree_vs_host_oracle():
    """The staged lanes-major tree path (client lifecycle) against a
    pure-python Poseidon computed from the same parameters: leaf sponge
    [tag, 11 cols] -> row 1, then 8-ary node layers (the value-level
    check the reference never does, SURVEY §4.3)."""
    from blaze_tpu.fields import FIELDS
    from blaze_tpu.fields.spec import int_to_limbs, limbs_to_int
    from blaze_tpu.hash.params import generate_params
    from blaze_tpu.hash.tree import LEAF_ARITY, TreeMode, num_tree_nodes
    from blaze_tpu.oracle.poseidon_ref import poseidon_permutation_ref
    from blaze_tpu.runtime.clients import (
        PoseidonClient,
        PoseidonInitializeParameters,
    )

    spec = FIELDS["bls12_381_fr"]
    h = 2
    nleaves = 8
    rng = np.random.default_rng(3)
    vals = [int(v) for v in rng.integers(1, 1 << 60, size=nleaves * LEAF_ARITY)]

    cl = PoseidonClient(spec)
    cl.initialize(PoseidonInitializeParameters(tree_height=h,
                                               tree_mode=TreeMode.TREE_C))
    elems = np.stack([int_to_limbs(v, spec.nlimbs) for v in vals]).astype(
        np.uint32)
    cl.set_data(elems)
    cl.start_process()
    cl.wait_result()
    layers = cl.result_arrays()
    assert sum(a.shape[0] for _, a in layers) == num_tree_nodes(h)

    # host oracle
    lp = generate_params(spec, LEAF_ARITY + 1)
    np_ = generate_params(spec, 9)
    leaf_hashes = [
        poseidon_permutation_ref(lp, [0] + vals[i * 11 : (i + 1) * 11])[1]
        for i in range(nleaves)
    ]
    root = poseidon_permutation_ref(np_, [0] + leaf_hashes)[1]
    got_leaves = [limbs_to_int(r) for r in layers[0][1]]
    assert got_leaves == leaf_hashes
    assert limbs_to_int(layers[1][1][0]) == root


@pytest.mark.parametrize("mode", ["dma", "hbm_reuse"])
def test_msm_client_lifecycle_resident(mode):
    """MSMClient on the TPU fused path: wire bytes through the full
    lifecycle land in the lanes-major residency (msm/residency.py), and
    the scalars-only HBM-reuse mode (msm_api.rs:144-153) reuses cached
    points — both oracle-exact."""
    from blaze_tpu.oracle import tiled_msm_instance
    from blaze_tpu.runtime.clients import (
        MSMClient,
        MSMInit,
        MSMInput,
        MSMParams,
    )

    curve = _curve("bls12_381")
    spec = curve.spec
    n = 256
    points, scalars, exp_aff, _ = tiled_msm_instance(spec, n, seed=97)
    fb = spec.fq.nbytes
    pts_bytes = b"".join(
        int(sum(int(v) << (16 * i) for i, v in enumerate(p[0]))).to_bytes(fb, "little")
        + int(sum(int(v) << (16 * i) for i, v in enumerate(p[1]))).to_bytes(fb, "little")
        for p in np.asarray(points)
    )
    sc_bytes = b"".join(
        int(sum(int(v) << (16 * i) for i, v in enumerate(s))).to_bytes(
            spec.fr.nbytes, "little")
        for s in np.asarray(scalars)
    )
    cl = MSMClient(MSMInit(curve="bls12_381"))
    assert cl._resident(), "fused residency should engage on TPU"
    if mode == "dma":
        cl.initialize(MSMParams(nof_elements=n))
        cl.set_data(MSMInput(scalars=sc_bytes, points=pts_bytes))
    else:
        cl.initialize(MSMParams(nof_elements=n, hbm_point_addr="bank0"))
        cl.set_data(MSMInput(scalars=sc_bytes, points=pts_bytes,
                             params=MSMParams(n, "bank0")))
        # scalars-only reuse round (mode 3)
        cl.set_data(MSMInput(scalars=sc_bytes,
                             params=MSMParams(n, "bank0")))
    cl.start_process()
    cl.wait_result()
    res = cl.result()
    zb = int.from_bytes(res.result[:fb], "little")
    yb = int.from_bytes(res.result[fb : 2 * fb], "little")
    xb = int.from_bytes(res.result[2 * fb : 3 * fb], "little")
    p = spec.fq.p
    zi = pow(zb, -1, p)
    assert (xb * zi % p, yb * zi % p) == exp_aff


def test_ntt_client_blocked_pipelined_double_buffer():
    """The reference's 2-deep pipelined flow (integration_ntt.rs:103-136)
    on the blocked residency: alternate host/kernel buffers across 3
    vectors, every result checked against its own input via the inverse
    client."""
    from blaze_tpu.fields import FIELDS
    from blaze_tpu.runtime.clients import NTTClient, NTTInit, NTTInput

    spec = FIELDS["bls12_381_fr"]
    logn, n = 16, 1 << 16
    rng = np.random.default_rng(5)
    vecs = []
    for _ in range(3):
        v = rng.integers(0, 1 << 16, size=(n, spec.nlimbs), dtype=np.uint16)
        v[:, -1] &= 0x3FFF
        vecs.append(v.astype("<u2").tobytes())

    fwd = NTTClient(NTTInit(field=spec, logn=logn))
    inv = NTTClient(NTTInit(field=spec, logn=logn), inverse=True)
    assert fwd._blocked
    outs = {}
    # software pipeline: result(buf_host) drains while buf_kernel runs
    fwd.set_data(NTTInput(data=vecs[0], buf_host=0))
    fwd.start_process(0)
    for i in range(1, 3):
        buf_host, buf_kernel = i % 2, (i - 1) % 2
        fwd.set_data(NTTInput(data=vecs[i], buf_host=buf_host))
        fwd.start_process(buf_host)
        fwd.wait_result(buf_kernel)
        outs[i - 1] = fwd.result(buf_kernel)
    fwd.wait_result(0 if 2 % 2 == 0 else 1)
    outs[2] = fwd.result(2 % 2)

    for i in range(3):
        inv.set_data(NTTInput(data=outs[i]))
        inv.start_process()
        inv.wait_result()
        assert inv.result() == vecs[i], f"vector {i} roundtrip"
