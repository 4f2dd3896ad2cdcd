"""8-ary Poseidon Merkle tree builder.

Behavioral parity with the reference's tree engine:
  * 8-ary tree of the given height; base layer has 8^(height-1) nodes and
    the total is sum_i 8^i, i < height — 585 nodes for height 4
    (`/root/reference/src/ingo_hash/utils.rs:2-14`,
    `tests/integration_poseidon.rs:23,165`);
  * TreeC mode column-hashes 11 input elements per leaf (the 11-element
    feed loop at integration_poseidon.rs:151-155; t=12 sponge), TreeD mode
    takes leaves directly (`utils.rs:16-30` TreeMode);
  * results are (hash, layer_id, hash_id) records mirroring
    PoseidonResult::parse_poseidon_hash_results (poseidon_api.rs:42-71).

Unlike the reference, hash values here are oracle-checked (tests) — blaze
never validates them (SURVEY §4.3).
"""
from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.spec import FieldSpec
from .params import PoseidonParams, generate_params
from .poseidon import Poseidon

ARITY = 8
LEAF_ARITY = 11  # elements column-hashed into one leaf (TreeC)


class TreeMode(enum.IntEnum):
    # values match the reference's start-layer encoding (utils.rs:16-30)
    TREE_C = 0
    TREE_D = 1


def num_tree_nodes(height: int) -> int:
    """Sum of 8^i for i < height (utils.rs:2-10)."""
    return sum(ARITY**i for i in range(height))


def base_layer_size(height: int) -> int:
    """8^(height-1) (utils.rs:12-14)."""
    return ARITY ** (height - 1)


class TreeResult:
    """All tree nodes, leaf layer first; mirrors the drained result records.

    Layers are DEVICE arrays until drained: building is async (JAX
    dispatch), like the reference's streaming engine that emits internal
    layers while leaves are still being fed (integration_poseidon.rs:81-119).
    `records()`/`root` force the transfer; `block_until_ready()` is the
    wait_result hook.

    The fused lanes-major build keeps layers as (L, B) Montgomery device
    arrays and materializes the canonical points-major view lazily at
    drain time (the hot loop never pays conversion/transpose passes).
    """

    def __init__(self, layers: list | None = None,
                 layers_lm_mont: list | None = None, field=None):
        self._layers = layers
        self._lm = layers_lm_mont
        self._field = field

    @property
    def layers(self):
        """(count, L) canonical limbs per layer, leaf layer first."""
        if self._layers is None:
            f = self._field
            self._layers = [
                f.jit_op("from_mont")(jnp.swapaxes(l, 0, 1))
                for l in self._lm
            ]
        return self._layers

    def block_until_ready(self):
        from ..utils.misc import hard_sync

        hard_sync(self._lm[-1] if self._lm is not None else self.layers[-1])

    def records(self):
        """(hash_limbs, layer_id, hash_id) triples, streaming order."""
        out = []
        for layer_id, layer in enumerate(self.layers):
            for hash_id, h in enumerate(np.asarray(layer)):
                out.append((h, layer_id, hash_id))
        return out

    @property
    def root(self):
        return np.asarray(self.layers[-1])[0]

    def __len__(self):
        return sum(layer.shape[0] for layer in self.layers)


class MerkleTreeBuilder:
    """Level-synchronous 8-ary tree builder over batched Poseidon kernels."""

    def __init__(
        self,
        spec: FieldSpec,
        leaf_params: PoseidonParams | None = None,
        node_params: PoseidonParams | None = None,
    ):
        self.spec = spec
        self.leaf_params = leaf_params or generate_params(spec, LEAF_ARITY + 1)
        self.node_params = node_params or generate_params(spec, ARITY + 1)
        self.leaf_hasher = Poseidon(self.leaf_params)
        self.node_hasher = Poseidon(self.node_params)
        self.field = self.leaf_hasher.field
        self._staged_fns: dict = {}
        self._leaf_fns: dict = {}      # streaming: per-width leaf sponge
        self._close_fns: dict = {}     # streaming: per-(height,B) node levels

    def _fused_lm(self):
        """The lanes-major fused kernel pair, when the platform has it."""
        from ..fields.mxu import mxu_available

        if not mxu_available():
            return None
        if self.leaf_params.alpha != 5 or self.node_params.alpha != 5:
            return None
        from .kernels import PoseidonKernels

        return (
            PoseidonKernels.for_params(self.leaf_params),
            PoseidonKernels.for_params(self.node_params),
        )

    def build_staged(self, leaf_cols_lm, height: int) -> TreeResult:
        """TREE_C build over PRE-STAGED lanes-major canonical columns.

        leaf_cols_lm: (LEAF_ARITY, L, 8^(h-1)) uint32 CANONICAL device
        array (the client stages wire data host-side into this layout
        once — msm/residency.py style — so no device transposes or
        Montgomery passes run here: the conversion is folded into the
        permutation kernel).  Everything stays lanes-major Montgomery
        until the result is drained, and the WHOLE tree — leaf sponge
        plus every node level — is one jitted dispatch (eager per-level
        ops are dispatch-latency-bound through tunneled transports).
        """
        kerns = self._fused_lm()
        if kerns is None:
            raise RuntimeError("build_staged needs the fused TPU kernels")
        A, L, B = leaf_cols_lm.shape
        if A != LEAF_ARITY or B != base_layer_size(height):
            raise ValueError(
                f"want ({LEAF_ARITY}, L, {base_layer_size(height)}), "
                f"got {leaf_cols_lm.shape}"
            )
        fn = self._staged_fns.get((height, B))
        if fn is None:
            kleaf, knode = kerns
            # convert_in multiplies the WHOLE state by R^2, so the domain
            # tag must enter in canonical form (tag 0 is 0 either way)
            tag_canon = np.asarray(
                self.field.jit_op("from_mont")(
                    self.leaf_hasher.domain_tag(0)[None]
                )
            )[0][:, None]
            tag_n = np.asarray(self.node_hasher.domain_tag(0))[:, None]

            def run(cols):
                state = jnp.concatenate(
                    [jnp.broadcast_to(jnp.asarray(tag_canon), (1, L, B)),
                     cols], axis=0
                )
                out = kleaf.permute_lm(state, convert_in=True)
                layer = out[1]                              # (L, B) mont
                layers = [layer]
                while layer.shape[-1] > 1:
                    Bc = layer.shape[-1] // ARITY
                    grouped = jnp.moveaxis(
                        layer.reshape(L, Bc, ARITY), 2, 0
                    )                                       # (8, L, Bc)
                    state = jnp.concatenate(
                        [jnp.broadcast_to(jnp.asarray(tag_n), (1, L, Bc)),
                         grouped], axis=0
                    )
                    layer = knode.permute_lm(state)[1]      # (L, Bc) mont
                    layers.append(layer)
                return tuple(layers)

            fn = self._staged_fns[(height, B)] = jax.jit(run)
        layers = list(fn(jnp.asarray(leaf_cols_lm)))
        return TreeResult(layers_lm_mont=layers, field=self.field)

    # --------------------------------------------- streaming (incremental)
    #
    # The reference's engine hashes leaves WHILE elements are still being
    # fed and emits results incrementally (rayon producer/consumer pair,
    # tests/integration_poseidon.rs:81-119; drain loop
    # poseidon_api.rs:128-145).  These methods split the build into a
    # per-chunk leaf sponge and a tree-closing pass so the client can
    # dispatch leaf hashing as soon as enough columns have arrived.

    def hash_leaves_staged(self, cols_lm):
        """Fused chunk leaf sponge: (LEAF_ARITY, L, Bc) canonical
        lanes-major -> (L, Bc) Montgomery leaf hashes (async)."""
        kerns = self._fused_lm()
        if kerns is None:
            raise RuntimeError("hash_leaves_staged needs the fused kernels")
        A, L, Bc = cols_lm.shape
        if A != LEAF_ARITY:
            raise ValueError(f"want leading axis {LEAF_ARITY}, got {A}")
        fn = self._leaf_fns.get(Bc)
        if fn is None:
            kleaf, _ = kerns
            tag_canon = np.asarray(
                self.field.jit_op("from_mont")(
                    self.leaf_hasher.domain_tag(0)[None]
                )
            )[0][:, None]

            def run(cols):
                state = jnp.concatenate(
                    [jnp.broadcast_to(jnp.asarray(tag_canon), (1, L, Bc)),
                     cols], axis=0
                )
                return kleaf.permute_lm(state, convert_in=True)[1]

            fn = self._leaf_fns[Bc] = jax.jit(run)
        return fn(jnp.asarray(cols_lm))

    def close_staged(self, leaf_lm, height: int) -> TreeResult:
        """Node levels over a complete (L, B) Montgomery leaf layer
        assembled from hash_leaves_staged chunks."""
        kerns = self._fused_lm()
        if kerns is None:
            raise RuntimeError("close_staged needs the fused kernels")
        L, B = leaf_lm.shape
        if B != base_layer_size(height):
            raise ValueError(f"want B={base_layer_size(height)}, got {B}")
        fn = self._close_fns.get((height, B))
        if fn is None:
            _, knode = kerns
            tag_n = np.asarray(self.node_hasher.domain_tag(0))[:, None]

            def run(layer):
                layers = [layer]
                while layer.shape[-1] > 1:
                    Bc = layer.shape[-1] // ARITY
                    grouped = jnp.moveaxis(layer.reshape(L, Bc, ARITY), 2, 0)
                    state = jnp.concatenate(
                        [jnp.broadcast_to(jnp.asarray(tag_n), (1, L, Bc)),
                         grouped], axis=0
                    )
                    layer = knode.permute_lm(state)[1]
                    layers.append(layer)
                return tuple(layers)

            fn = self._close_fns[(height, B)] = jax.jit(run)
        layers = list(fn(leaf_lm))
        return TreeResult(layers_lm_mont=layers, field=self.field)

    def hash_leaves(self, cols):
        """Portable chunk leaf sponge: (Bc, LEAF_ARITY, L) canonical ->
        (Bc, L) Montgomery leaf hashes (async)."""
        mont = self.field.to_mont(jnp.asarray(cols))
        return self.leaf_hasher.hash(mont, self.leaf_hasher.domain_tag(0))

    def close(self, leaf_layer_mont, height: int) -> TreeResult:
        """Portable node levels over a complete (B, L) mont leaf layer."""
        if leaf_layer_mont.shape[0] != base_layer_size(height):
            raise ValueError(
                f"want {base_layer_size(height)} leaves, "
                f"got {leaf_layer_mont.shape[0]}"
            )
        f = self.field
        layer = leaf_layer_mont
        layers_mont = [layer]
        tag = self.node_hasher.domain_tag(0)
        while layer.shape[0] > 1:
            grouped = layer.reshape(-1, ARITY, layer.shape[-1])
            layer = self.node_hasher.hash(grouped, tag)
            layers_mont.append(layer)
        layers = [f.jit_op("from_mont")(l) for l in layers_mont]
        return TreeResult(layers=layers)

    def build(
        self,
        elements,
        height: int,
        mode: TreeMode = TreeMode.TREE_C,
    ) -> TreeResult:
        """elements: canonical uint32 limbs —
        TREE_C: (8^(h-1), 11, L) column elements;
        TREE_D: (8^(h-1), L) precomputed leaves.
        """
        f = self.field
        nleaves = base_layer_size(height)
        if mode == TreeMode.TREE_C and self._fused_lm() is not None:
            if isinstance(elements, jax.Array):
                # device arrays stay on device: lanes-major via moveaxis,
                # no D2H+H2D round-trip
                lm = jnp.moveaxis(
                    elements.astype(jnp.uint32).reshape(
                        nleaves, LEAF_ARITY, -1
                    ),
                    0, 2,
                )
            else:
                host = np.asarray(elements, dtype=np.uint32).reshape(
                    nleaves, LEAF_ARITY, -1
                )
                lm = jnp.asarray(np.ascontiguousarray(host.transpose(1, 2, 0)))
            return self.build_staged(lm, height)
        # device arrays must not round-trip through the host
        arr = (elements if isinstance(elements, jax.Array)
               else jnp.asarray(np.asarray(elements, dtype=np.uint32)))
        if mode == TreeMode.TREE_C:
            if arr.shape[:2] != (nleaves, LEAF_ARITY):
                raise ValueError(
                    f"TreeC wants ({nleaves}, {LEAF_ARITY}, L), got {arr.shape}"
                )
            mont = f.to_mont(arr)
            tag = self.leaf_hasher.domain_tag(0)
            layer = self.leaf_hasher.hash(mont, tag)        # (nleaves, L)
        else:
            if arr.shape[0] != nleaves:
                raise ValueError(f"TreeD wants ({nleaves}, L), got {arr.shape}")
            layer = f.to_mont(arr)

        # leave layers on device (async dispatch); drained by records()
        return self.close(layer, height)
