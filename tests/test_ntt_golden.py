"""File-driven byte-golden NTT vectors — the reference's test mode
(/root/reference/tests/integration_ntt.rs:6-60: INFNAME/OUTFNAME raw LE
byte files, byte-equality assertion; README.md:168-177 env contract).

Defaults to self-generated fixtures under tests/fixtures/ (committed the
first time they're produced) so CI needs no external files; set
BLZ_NTT_INFNAME / BLZ_NTT_OUTFNAME to check against externally produced
vectors instead.
"""
import os
import random

import numpy as np

from blaze_tpu.fields import FIELDS, int_to_limbs, limbs_to_bytes
from blaze_tpu.runtime import NTTClient, NTTInit, NTTInput

FIELD = os.environ.get("BLZ_NTT_FIELD", "bn254_fr")
LOGN = int(os.environ.get("BLZ_NTT_LOGN", "6"))
FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _naive_ntt_bytes(raw: bytes, spec, logn: int) -> bytes:
    """Host-side oracle: naive DFT over python ints, LE bytes in/out."""
    n = 1 << logn
    nb = spec.nbytes
    vals = [int.from_bytes(raw[i * nb:(i + 1) * nb], "little") for i in range(n)]
    w = spec.root_of_unity(logn)
    out = [
        sum(vals[i] * pow(w, i * k, spec.p) for i in range(n)) % spec.p
        for k in range(n)
    ]
    return b"".join(v.to_bytes(nb, "little") for v in out)


def _fixture_paths():
    inf = os.environ.get("BLZ_NTT_INFNAME")
    outf = os.environ.get("BLZ_NTT_OUTFNAME")
    if inf and outf:
        return inf, outf
    os.makedirs(FIXDIR, exist_ok=True)
    inf = os.path.join(FIXDIR, f"ntt_{FIELD}_2e{LOGN}.in")
    outf = os.path.join(FIXDIR, f"ntt_{FIELD}_2e{LOGN}.out")
    if not (os.path.exists(inf) and os.path.exists(outf)):
        spec = FIELDS[FIELD]
        rng = random.Random(0xB1A2E)
        n = 1 << LOGN
        raw = b"".join(
            rng.randrange(spec.p).to_bytes(spec.nbytes, "little")
            for _ in range(n)
        )
        open(inf, "wb").write(raw)
        open(outf, "wb").write(_naive_ntt_bytes(raw, spec, LOGN))
    return inf, outf


def test_ntt_golden_bytes():
    """integration_ntt.rs:57 parity: output bytes == golden file bytes."""
    inf, outf = _fixture_paths()
    raw_in = open(inf, "rb").read()
    want = open(outf, "rb").read()

    client = NTTClient(NTTInit(field=FIELD, logn=LOGN))
    client.initialize()
    client.set_data(NTTInput(data=raw_in, buf_host=0))
    client.start_process(0)
    client.wait_result()
    got = client.result(0)
    assert got == want, "NTT output bytes differ from golden vector"


def _committed_fixtures():
    import glob
    import re

    out = []
    for inf in sorted(glob.glob(os.path.join(FIXDIR, "ntt_*_2e*.in"))):
        m = re.match(r"ntt_(.+)_2e(\d+)\.in$", os.path.basename(inf))
        if m and os.path.exists(inf[:-3] + ".out"):
            out.append((m.group(1), int(m.group(2)), inf, inf[:-3] + ".out"))
    return out


@__import__("pytest").mark.parametrize(
    "field,logn,inf,outf",
    _committed_fixtures(),
    ids=[f"{f}_2e{n}" for f, n, _, _ in _committed_fixtures()],
)
def test_ntt_golden_committed_vectors(field, logn, inf, outf):
    """Every committed fixture pair is EXTERNALLY produced
    (scripts/gen_ntt_vectors.py: stdlib-only, no blaze_tpu import, a
    recursive Cooley-Tukey the package doesn't use) and pinned — the
    reference's vectors-from-outside-the-library contract
    (integration_ntt.rs:10-18)."""
    raw_in = open(inf, "rb").read()
    want = open(outf, "rb").read()
    client = NTTClient(NTTInit(field=field, logn=logn))
    client.set_data(NTTInput(data=raw_in))
    client.start_process()
    client.wait_result()
    assert client.result() == want


def test_intt_golden_bytes_roundtrip():
    """Inverse transform of the golden output reproduces the input file."""
    inf, outf = _fixture_paths()
    raw_in = open(inf, "rb").read()
    want = open(outf, "rb").read()

    client = NTTClient(NTTInit(field=FIELD, logn=LOGN), inverse=True)
    client.initialize()
    client.set_data(NTTInput(data=want, buf_host=0))
    client.start_process(0)
    client.wait_result()
    assert client.result(0) == raw_in
