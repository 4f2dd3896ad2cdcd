#!/usr/bin/env python3
"""Standalone Poseidon constants generator — INDEPENDENT of blaze_tpu.

blaze_tpu generates its Poseidon instances with the Grain-LFSR procedure
from the Poseidon paper (hash/params.py), and its value oracle
(oracle/poseidon_ref.py) REUSES those constants — so a bug in the
derivation would pass both.  The reference offers nothing to pin against
(it streams an opaque user CSV, poseidon_api.rs:205-243, and never checks
hash values), and no vetted third-party vector is available offline; this
script is the strongest substitute: a third, stdlib-only implementation of
the PUBLISHED algorithm (Poseidon paper, generate_parameters_grain.sage),
written in a deliberately different style — integer-register LFSR with
mask arithmetic instead of a bit list, Fermat inversion instead of
pow(x, -1, p) — producing a committed fixture that tests/test_poseidon.py
asserts hash/params.py reproduces bit for bit.

Usage: python scripts/gen_poseidon_goldens.py
Writes tests/fixtures/poseidon_constants.json.
"""
import hashlib
import json
import os

# public scalar-field moduli (literals, not imported)
MODULI = {
    "bls12_381_fr": 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001,
    "bn254_fr": 0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000001,
}
# partial-round counts for alpha=5, M=128, R_F=8 (circomlib's published
# table; t = state width)
R_P = {9: 63, 12: 60}
MASK80 = (1 << 80) - 1


def grain_stream(field_bits: int, t: int, r_f: int, r_p: int):
    """Self-shrinking Grain keystream as an 80-bit integer register.

    Register bit 79 is the OLDEST state bit (the paper's s_0); a step
    taps s_62, s_51, s_38, s_23, s_13, s_0 and shifts left."""
    fields = [(1, 2), (0, 4), (field_bits, 12), (t, 12), (r_f, 10),
              (r_p, 10), ((1 << 30) - 1, 30)]
    reg = 0
    for value, width in fields:
        reg = (reg << width) | value
    taps = [79 - i for i in (62, 51, 38, 23, 13, 0)]

    def step():
        nonlocal reg
        bit = 0
        for tp in taps:
            bit ^= (reg >> tp) & 1
        reg = ((reg << 1) | bit) & MASK80
        return bit

    for _ in range(160):
        step()
    while True:
        first = step()
        second = step()
        if first:
            yield second


def round_constants(p: int, bits: int, t: int, r_f: int, r_p: int):
    ks = grain_stream(bits, t, r_f, r_p)
    out = []
    while len(out) < (r_f + r_p) * t:
        v = 0
        for _ in range(bits):
            v = (v << 1) | next(ks)
        if v < p:
            out.append(v)
    return out


def cauchy_mds(p: int, t: int):
    """mds[i][j] = (x_i + y_j)^-1, x_i = i, y_j = t + j (Fermat)."""
    return [[pow(i + t + j, p - 2, p) for j in range(t)] for i in range(t)]


def main():
    fixture = {}
    for field in ("bls12_381_fr",):
        p = MODULI[field]
        bits = p.bit_length()
        for t in (9, 12):
            r_f, r_p = 8, R_P[t]
            rc = round_constants(p, bits, t, r_f, r_p)
            mds = cauchy_mds(p, t)
            blob = b"".join(v.to_bytes(32, "little") for v in rc)
            mblob = b"".join(
                v.to_bytes(32, "little") for row in mds for v in row
            )
            fixture[f"{field}_t{t}"] = {
                "field_bits": bits,
                "r_f": r_f,
                "r_p": r_p,
                "rc_hex": [hex(v) for v in rc],
                "mds_hex": [[hex(v) for v in row] for row in mds],
                "sha256_rc": hashlib.sha256(blob).hexdigest(),
                "sha256_mds": hashlib.sha256(mblob).hexdigest(),
            }
            print(f"{field} t={t}: {len(rc)} round constants, "
                  f"rc sha256 {fixture[f'{field}_t{t}']['sha256_rc'][:16]}…")

    fixdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures",
    )
    os.makedirs(fixdir, exist_ok=True)
    path = os.path.join(fixdir, "poseidon_constants.json")
    with open(path, "w") as f:
        json.dump(fixture, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
