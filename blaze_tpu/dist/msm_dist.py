"""Data-parallel MSM over a device mesh.

Points and scalars are sharded over the 'dp' axis; each device runs local
Pippenger window sums (the per-card task of the reference, which has no
multi-card story — SURVEY §2 parallelism table), then the tiny (W, 3, L)
per-window partials are all_gathered (a few KB) and tree-reduced with EC
adds before the final window fold.  Communication is O(W) points — the
reduce-side analog of the reference's final-accumulation phase counters
(msm_hw_code.rs:27,33-34).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curves.ops import Curve
from ..msm.pippenger import MSM, MSMConfig


class DistributedMSM:
    """MSM sharded over a mesh axis. Call with globally-shaped arrays."""

    def __init__(self, curve: Curve, mesh: Mesh, axis: str = "dp",
                 config: MSMConfig | None = None):
        self.curve = curve
        self.mesh = mesh
        self.axis = axis
        self.engine = MSM(curve, config)

    def _reduce_wsums(self, gathered):
        """(D, W, 3, L) -> (W, 3, L) via log-depth batched EC adds."""
        cv = self.curve
        d = gathered.shape[0]
        while d > 1:
            half = d // 2
            merged = cv.add(gathered[:half], gathered[half : 2 * half])
            if d % 2:
                merged = jnp.concatenate([merged, gathered[2 * half : d]], 0)
            gathered = merged
            d = gathered.shape[0]
        return gathered[0]

    @functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
    def _run(self, points, scalars, c: int, scalar_bits=None, fused=False):
        def local(pts, scal):
            if fused:
                # Per-shard chunked fused-kernel path: the same Pallas
                # scan/reduce kernels as single-chip MSM (msm/pippenger.py
                # _fused_chunk), so multi-chip throughput scales from the
                # fast local baseline, not the portable one.  Chunks ride
                # ONE lax.scan instance (not a Python unroll): the graph
                # holds one chunk's kernels regardless of per-shard size,
                # keeping compile time and transient liveness flat — the
                # single-chip path gets the same effect by re-dispatching
                # one compiled kernel per chunk from Python, which is not
                # possible inside a shard_map body.
                from ..msm.pippenger import _vary_like

                n = pts.shape[0]
                chunk = 1 << self.engine.config.chunk_log2
                if n <= chunk:
                    wsums = self.engine._fused_chunk(pts, scal, c,
                                                     scalar_bits)
                elif n % chunk == 0:
                    gp = pts.reshape(n // chunk, chunk, *pts.shape[1:])
                    gs = scal.reshape(n // chunk, chunk, *scal.shape[1:])
                    nwin = -(-(scalar_bits or self.curve.spec.fr.bits) // c)
                    L = self.curve.nlimbs
                    ident = _vary_like(
                        jnp.broadcast_to(self.curve.identity(),
                                         (nwin, 3, L)),
                        pts,
                    )

                    def body(acc, xs):
                        p, s = xs
                        part = self.engine._fused_chunk(p, s, c, scalar_bits)
                        return self.curve.add(acc, part), None

                    wsums, _ = jax.lax.scan(body, ident, (gp, gs))
                else:
                    wsums = None
                    for lo in range(0, n, chunk):
                        hi = min(lo + chunk, n)
                        part = self.engine._fused_chunk(
                            pts[lo:hi], scal[lo:hi], c, scalar_bits
                        )
                        wsums = part if wsums is None else self.curve.add(
                            wsums, part
                        )
            else:
                wsums = self.engine.msm_chunk(pts, scal, c, scalar_bits)
            gathered = jax.lax.all_gather(wsums, self.axis)      # (D, W, 3, L)
            total = self._reduce_wsums(gathered)
            return self.engine.fold_windows(total, c)            # (3, L)

        # check_vma=False: the result IS replicated (every device reduces
        # the same all_gathered wsums), but the EC tree-reduction is opaque
        # to JAX's varying-axis inference, which would reject out_specs=P().
        fn = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis)),
            out_specs=P(),  # replicated result
            check_vma=False,
        )
        return fn(points, scalars)

    def __call__(self, points_aff_mont, scalars, window_bits: int | None = None,
                 scalar_bits: int | None = None):
        n = points_aff_mont.shape[0]
        d = self.mesh.shape[self.axis]
        if n % d:
            raise ValueError(f"n={n} not divisible by mesh axis {self.axis}={d}")
        from ..msm.pippenger import default_window_bits

        c = window_bits or min(
            self.engine.config.window_bits, default_window_bits(n // d)
        )
        sharding = NamedSharding(self.mesh, P(self.axis))
        pts = jax.device_put(points_aff_mont, sharding)
        scal = jax.device_put(scalars, sharding)
        from ..fields.mxu import portable_only

        if self.mesh.devices.flat[0].platform != "tpu":
            # trace-time kernel gating must match the mesh's platform, not
            # the default backend (virtual CPU meshes under a TPU default)
            with portable_only():
                return self._run(pts, scal, c, scalar_bits, False)
        return self._run(pts, scal, c, scalar_bits,
                         self.engine.config.fused_active())
