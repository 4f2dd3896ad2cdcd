#!/usr/bin/env python3
"""Standalone NTT golden-vector generator — INDEPENDENT of blaze_tpu.

Produces the byte-golden fixture files tests/test_ntt_golden.py consumes
(the reference's INFNAME/OUTFNAME contract,
/root/reference/tests/integration_ntt.rs:6-18: vectors produced OUTSIDE
the library under test, byte-equality asserted).

Deliberately shares NOTHING with the package: python stdlib only, field
moduli as literals from the public curve specifications, the root of
unity derived from first principles (smallest base x = 2, 3, ... whose
odd-part power is a 2-adic non-residue — the standard construction), and
the transform computed by a RECURSIVE Cooley-Tukey split (the package's
test oracle is a naive O(n^2) DFT; its device paths are iterative
radix-2 / four-step) so no algorithm is shared either.

Usage: python scripts/gen_ntt_vectors.py [field] [logn] [seed]
Writes tests/fixtures/ntt_{field}_2e{logn}.{in,out}.
"""
import os
import random
import sys

# public curve constants (BN254 / BLS12-381 scalar field moduli)
MODULI = {
    "bn254_fr": 0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000001,
    "bls12_381_fr": 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001,
}


def two_adic_root(p: int) -> tuple[int, int]:
    s, odd = 0, p - 1
    while odd % 2 == 0:
        s, odd = s + 1, odd // 2
    x = 2
    while True:
        w = pow(x, odd, p)
        if pow(w, 1 << (s - 1), p) != 1:
            return w, s
        x += 1


def ntt_recursive(vals, w, p):
    """X[k] = sum_i vals[i] * w^(i*k) via recursive Cooley-Tukey."""
    n = len(vals)
    if n == 1:
        return vals[:]
    even = ntt_recursive(vals[0::2], w * w % p, p)
    odd = ntt_recursive(vals[1::2], w * w % p, p)
    out = [0] * n
    wk = 1
    for k in range(n // 2):
        t = wk * odd[k] % p
        out[k] = (even[k] + t) % p
        out[k + n // 2] = (even[k] - t) % p
        wk = wk * w % p
    return out


def main():
    field = sys.argv[1] if len(sys.argv) > 1 else "bls12_381_fr"
    logn = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0xB1A2E
    p = MODULI[field]
    nbytes = (p.bit_length() + 7 + 7) // 8 // 2 * 2  # round up to u16 image
    nbytes = 32  # both supported scalar fields use 32 B wire elements
    root, s = two_adic_root(p)
    assert logn <= s
    w = pow(root, 1 << (s - logn), p)

    n = 1 << logn
    rng = random.Random(seed)
    vals = [rng.randrange(p) for _ in range(n)]
    out = ntt_recursive(vals, w, p)
    # spot-check the recursion against the definition at 3 positions
    for k in (0, 1, n - 1):
        want = sum(vals[i] * pow(w, i * k, p) for i in range(n)) % p
        assert out[k] == want, f"self-check failed at k={k}"

    fixdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures")
    os.makedirs(fixdir, exist_ok=True)
    base = os.path.join(fixdir, f"ntt_{field}_2e{logn}")
    with open(base + ".in", "wb") as f:
        f.write(b"".join(v.to_bytes(nbytes, "little") for v in vals))
    with open(base + ".out", "wb") as f:
        f.write(b"".join(v.to_bytes(nbytes, "little") for v in out))
    print(f"wrote {base}.in/.out (n={n}, field={field})")


if __name__ == "__main__":
    main()
