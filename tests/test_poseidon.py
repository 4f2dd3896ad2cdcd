"""Poseidon kernel + Merkle tree vs the python oracle."""
import random

import numpy as np
import pytest

import jax.numpy as jnp

from blaze_tpu.fields import FIELDS, int_to_limbs
from blaze_tpu.hash import (
    MerkleTreeBuilder,
    Poseidon,
    TreeMode,
    generate_params,
    num_tree_nodes,
    base_layer_size,
)
from blaze_tpu.oracle.poseidon_ref import (
    merkle_tree_ref,
    poseidon_hash_ref,
    poseidon_permutation_ref,
)

SPEC = FIELDS["bls12_381_fr"]


def test_grain_constants_deterministic():
    p1 = generate_params(SPEC, 3)
    p2 = generate_params(SPEC, 3)
    assert p1.round_constants == p2.round_constants
    assert p1.mds == p2.mds
    assert all(0 <= c < SPEC.p for c in p1.round_constants)
    # different t -> different constants
    p3 = generate_params(SPEC, 4)
    assert p3.round_constants[:4] != p1.round_constants[:4]


@pytest.mark.parametrize("t", [9, 12])
def test_grain_constants_vs_independent_fixture(t):
    """hash/params.py vs the committed constants from the stdlib-only
    generator (scripts/gen_poseidon_goldens.py) — a third implementation
    of the published Grain procedure in a different style (integer
    register vs bit list, Fermat vs extended-gcd inversion).  The oracle
    (poseidon_ref.py) reuses params.py's constants, so this fixture is
    the only derivation-independent check; no vetted third-party vector
    is available offline (the reference ships none — its constants are an
    opaque user CSV, poseidon_api.rs:205-243)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(__file__), "fixtures", "poseidon_constants.json"
    )
    with open(path) as f:
        fix = json.load(f)[f"bls12_381_fr_t{t}"]
    params = generate_params(SPEC, t)
    assert params.r_f == fix["r_f"] and params.r_p == fix["r_p"]
    assert [hex(c) for c in params.round_constants] == fix["rc_hex"]
    assert [[hex(v) for v in row] for row in params.mds] == fix["mds_hex"]


@pytest.mark.parametrize("t", [3, 9, 12])
def test_permutation_matches_oracle(t):
    params = generate_params(SPEC, t)
    kernel = Poseidon(params)
    rng = random.Random(30 + t)
    batch = 5
    states = [[rng.randrange(SPEC.p) for _ in range(t)] for _ in range(batch)]
    dev = kernel.field.from_int([x for s in states for x in s]).reshape(
        batch, t, SPEC.nlimbs
    )
    got = kernel.permute(dev)
    for i, s in enumerate(states):
        want = poseidon_permutation_ref(params, s)
        assert kernel.field.to_int(got[i]) == want, f"t={t} row {i}"


def test_hash_matches_oracle():
    params = generate_params(SPEC, 9)
    kernel = Poseidon(params)
    rng = random.Random(40)
    inputs = [rng.randrange(SPEC.p) for _ in range(8)]
    dev = kernel.field.from_int(inputs).reshape(1, 8, SPEC.nlimbs)
    got = kernel.field.to_int(kernel.hash(dev, kernel.domain_tag(0)))
    assert got == [poseidon_hash_ref(params, inputs)]


def test_tree_shape_reference_contract():
    # height 4 -> 585 nodes, 512 base leaves (integration_poseidon.rs:23,165)
    assert num_tree_nodes(4) == 585
    assert base_layer_size(4) == 512


def test_merkle_tree_matches_oracle():
    height = 2  # 8 leaves — small enough for the python oracle
    builder = MerkleTreeBuilder(SPEC)
    rng = random.Random(41)
    nleaves = base_layer_size(height)
    cols = [[rng.randrange(SPEC.p) for _ in range(11)] for _ in range(nleaves)]
    arr = np.stack(
        [
            np.stack([int_to_limbs(v, SPEC.nlimbs) for v in col])
            for col in cols
        ]
    )
    result = builder.build(arr, height, TreeMode.TREE_C)
    assert len(result) == num_tree_nodes(height)

    want_layers = merkle_tree_ref(
        builder.leaf_params, builder.node_params, cols, height
    )
    from blaze_tpu.fields.spec import limbs_to_int

    for lid, want in enumerate(want_layers):
        got = [limbs_to_int(h) for h in result.layers[lid]]
        assert got == want, f"layer {lid}"

    # record stream parity with PoseidonResult parsing (ids per layer)
    recs = result.records()
    assert len(recs) == num_tree_nodes(height)
    assert recs[0][1:] == (0, 0)
    assert recs[-1][1:] == (height - 1, 0)


def test_tree_d_mode():
    height = 2
    builder = MerkleTreeBuilder(SPEC)
    rng = random.Random(42)
    leaves = [rng.randrange(SPEC.p) for _ in range(8)]
    arr = np.stack([int_to_limbs(v, SPEC.nlimbs) for v in leaves])
    result = builder.build(arr, height, TreeMode.TREE_D)
    want = poseidon_hash_ref(builder.node_params, leaves)
    from blaze_tpu.fields.spec import limbs_to_int

    assert limbs_to_int(result.root) == want
