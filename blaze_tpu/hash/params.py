"""Poseidon parameter generation (Grain LFSR + Cauchy MDS).

The reference treats Poseidon constants as an opaque CSV instruction stream
loaded into FPGA program memory (`/root/reference/src/ingo_hash/
poseidon_api.rs:205-243`) and never validates hash values.  Here constants
are generated with the standard Grain-LFSR procedure from the Poseidon
paper's reference implementation (generate_parameters_grain.sage), so the
instance is fully specified, reproducible, and oracle-checkable.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np

from ..fields.spec import FieldSpec, int_to_limbs

# Partial-round counts for alpha=5, M=128, ~254/255-bit prime fields,
# R_F = 8 (circomlib's table, t = 2..17).
_RP_TABLE = {
    2: 56, 3: 57, 4: 56, 5: 60, 6: 60, 7: 63, 8: 64, 9: 63,
    10: 60, 11: 66, 12: 60, 13: 65, 14: 70, 15: 60, 16: 64, 17: 68,
}


def _grain_bits(field_bits: int, t: int, r_f: int, r_p: int):
    """Self-shrinking Grain LFSR bit generator (Poseidon reference init)."""
    def bits_of(value, width):
        return [(value >> (width - 1 - i)) & 1 for i in range(width)]

    state = (
        bits_of(1, 2)            # field tag: 1 = prime field
        + bits_of(0, 4)          # sbox tag: 0 = x^alpha
        + bits_of(field_bits, 12)
        + bits_of(t, 12)
        + bits_of(r_f, 10)
        + bits_of(r_p, 10)
        + [1] * 30
    )
    assert len(state) == 80

    def update():
        new = (
            state[62] ^ state[51] ^ state[38] ^ state[23] ^ state[13] ^ state[0]
        )
        state.pop(0)
        state.append(new)
        return new

    for _ in range(160):
        update()

    while True:
        b1 = update()
        b2 = update()
        if b1:
            yield b2


def _sample_field_elements(gen, count: int, p: int, field_bits: int):
    out = []
    while len(out) < count:
        v = 0
        for _ in range(field_bits):
            v = (v << 1) | next(gen)
        if v < p:
            out.append(v)
    return out


@dataclasses.dataclass(frozen=True)
class PoseidonParams:
    """One fully-specified Poseidon instance over a prime field."""

    spec: FieldSpec
    t: int
    alpha: int
    r_f: int           # full rounds (total)
    r_p: int           # partial rounds
    round_constants: tuple  # ((r_f + r_p) * t,) python ints
    mds: tuple              # t x t python ints

    @property
    def rate(self) -> int:
        return self.t - 1

    # ------------------------------------------------- device-ready tables
    @functools.cached_property
    def rc_mont(self) -> np.ndarray:
        """(rounds, t, L) uint32, Montgomery form."""
        p, r, L = self.spec.p, self.spec.r, self.spec.nlimbs
        rounds = self.r_f + self.r_p
        arr = np.zeros((rounds, self.t, L), dtype=np.uint32)
        for i, c in enumerate(self.round_constants):
            arr[i // self.t, i % self.t] = int_to_limbs((c * r) % p, L)
        return arr

    @functools.cached_property
    def mds_mont(self) -> np.ndarray:
        """(t, t, L) uint32, Montgomery form."""
        p, r, L = self.spec.p, self.spec.r, self.spec.nlimbs
        arr = np.zeros((self.t, self.t, L), dtype=np.uint32)
        for i in range(self.t):
            for j in range(self.t):
                arr[i, j] = int_to_limbs((self.mds[i][j] * r) % p, L)
        return arr


def generate_params(
    spec: FieldSpec,
    t: int,
    alpha: int = 5,
    r_f: int = 8,
    r_p: int | None = None,
) -> PoseidonParams:
    """Standard Grain-LFSR constants + Cauchy MDS for (field, t)."""
    p = spec.p
    field_bits = spec.bits
    if r_p is None:
        r_p = _RP_TABLE.get(t, 68)
    gen = _grain_bits(field_bits, t, r_f, r_p)
    rc = _sample_field_elements(gen, (r_f + r_p) * t, p, field_bits)
    # Cauchy matrix mds[i][j] = 1 / (x_i + y_j), x_i = i, y_j = t + j
    mds = tuple(
        tuple(pow((i + (t + j)) % p, -1, p) for j in range(t))
        for i in range(t)
    )
    return PoseidonParams(
        spec=spec,
        t=t,
        alpha=alpha,
        r_f=r_f,
        r_p=r_p,
        round_constants=tuple(rc),
        mds=mds,
    )


def params_from_csv(spec: FieldSpec, path: str, t: int, **kw) -> PoseidonParams:
    """Load constants from a CSV of decimal values (reference-compatible:
    poseidon_api.rs:205-243 streams CSV records of decimal big-ints).

    Layout: first (r_f + r_p) * t values are round constants, next t*t are
    the row-major MDS matrix.
    """
    import csv

    from ..utils.errors import DataError

    vals = []
    try:
        with open(path) as fh:
            for row in csv.reader(fh):
                try:
                    vals.extend(int(v) for v in row if v.strip())
                except ValueError as e:
                    raise DataError(
                        f"non-integer value in {path!r}: {e}"
                    ) from e
    except OSError as e:
        raise DataError(f"cannot read constants CSV {path!r}: {e}") from e
    r_f = kw.get("r_f", 8)
    r_p = kw.get("r_p", _RP_TABLE.get(t, 68))
    nrc = (r_f + r_p) * t
    if len(vals) < nrc + t * t:
        raise DataError(
            f"CSV {path!r} has {len(vals)} values, need {nrc + t * t} "
            f"for t={t}"
        )
    rc = tuple(v % spec.p for v in vals[:nrc])
    mds_flat = [v % spec.p for v in vals[nrc : nrc + t * t]]
    mds = tuple(tuple(mds_flat[i * t + j] for j in range(t)) for i in range(t))
    return PoseidonParams(
        spec=spec, t=t, alpha=kw.get("alpha", 5), r_f=r_f, r_p=r_p,
        round_constants=rc, mds=mds,
    )
