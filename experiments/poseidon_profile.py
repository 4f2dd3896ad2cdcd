"""Where does the Poseidon permutation lose vs the mul-kernel ceiling?

Times on the chip:
  perm_leaf   full t=12 permutation of B states (the tree's leaf hash)
  perm_node   full t=9 permutation
  mul_ref     one batched mont mul at the same lane count (reference)
  tree        MerkleTreeBuilder.build at 2^LOGL leaves (the bench path)

Prints per-permutation and per-round costs.  Env: BLZ_POS_LOGB (15).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from blaze_tpu.fields import FIELDS
from blaze_tpu.hash.kernels import PoseidonKernels
from blaze_tpu.hash.params import generate_params
from blaze_tpu.hash.tree import LEAF_ARITY, MerkleTreeBuilder, TreeMode
from blaze_tpu.ntt.kernels import NTTKernels

assert jax.default_backend() == "tpu"

LOGB = int(os.environ.get("BLZ_POS_LOGB", "15"))
B = 1 << LOGB
spec = FIELDS["bls12_381_fr"]
L = spec.nlimbs


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1]))


def bench(name, fn, *args, iters=3):
    o = fn(*args)
    sync(o)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, o


rng = np.random.default_rng(0)
for t, tag in ((12, "leaf"), (9, "node")):
    params = generate_params(spec, t)
    kern = PoseidonKernels.for_params(params)
    state = jnp.asarray(
        rng.integers(0, 1 << 14, size=(t, L, B), dtype=np.uint16)
    ).astype(jnp.uint32)
    best, _ = bench(f"perm_{tag}", kern.permute_lm, state)
    rounds = params.r_f + params.r_p
    print(
        f"perm_{tag} t={t}: {best*1e3:8.1f} ms for {B} states "
        f"({B/best/1e3:.0f}K perms/s, {best/ (B/512) / rounds *1e6:.1f} us "
        f"per round-tile512, r_f={params.r_f} r_p={params.r_p})",
        flush=True,
    )

nk = NTTKernels.for_spec(spec)
x = jnp.asarray(rng.integers(0, 1 << 14, size=(8, L, B), dtype=np.uint16))
best, _ = bench("mul_ref", nk.mul_lm, x, x)
print(f"mul_ref (8, L, {B}) lanes: {best*1e3:8.1f} ms "
      f"({8*B/best/1e6:.0f} M muls/s)", flush=True)

nleaves = B
builder = MerkleTreeBuilder(spec)
elems = rng.integers(0, 1 << 14, size=(nleaves, LEAF_ARITY, L),
                     dtype=np.uint16).astype(np.uint32)
height = 1 + (LOGB + 2) // 3
if 8 ** (height - 1) == nleaves:
    def build():
        tr = builder.build(elems, height, TreeMode.TREE_C)
        tr.block_until_ready()
        return tr.layers[-1]

    best, _ = bench("tree", build)
    print(f"tree 2^{LOGB} leaves: {best*1e3:8.1f} ms "
          f"({nleaves/best/1e3:.1f}K leaves/s)", flush=True)
