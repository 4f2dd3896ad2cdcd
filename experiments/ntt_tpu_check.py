"""Fused NTT on the real TPU: correctness + throughput, artifact-writing.

1. bit-exact vs the portable XLA plan (an independent code path) at
   mid sizes;
2. delta-vector golden check: NTT(delta_k)[t] = W^(k*t), verified against
   host bigint pow at sampled positions;
3. forward+inverse roundtrip bit-exactness;
4. throughput at the sweep sizes (u16 path, donated buffers).

Writes experiments' results to NTT_TPU.json (driver-visible artifact).

Env: BLZ_NTT_SIZES (csv logn, default "12,16,20"), BLZ_NTT_BIG (one logn
for the big roundtrip run, default 24; set 27 for the reference-scale
run), BLZ_NTT_ITERS (default 3).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import jax.numpy as jnp

from blaze_tpu.fields import FIELDS
from blaze_tpu.fields.spec import int_to_limbs, limbs_to_int
from blaze_tpu.ntt import FusedNTT, NTTPlan
from blaze_tpu.utils.misc import hard_sync

assert jax.default_backend() == "tpu", jax.default_backend()

SPEC = FIELDS[os.environ.get("BLZ_NTT_FIELD", "bls12_381_fr")]
L = SPEC.nlimbs
SIZES = [int(s) for s in os.environ.get("BLZ_NTT_SIZES", "12,16,20").split(",")]
BIG = int(os.environ.get("BLZ_NTT_BIG", "24"))
ITERS = int(os.environ.get("BLZ_NTT_ITERS", "3"))

ART = "/root/repo/NTT_TPU.json"

def _git_rev():
    import subprocess
    try:
        return subprocess.run(
            ["git", "-C", "/root/repo", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        return "unknown"

results = {"field": SPEC.name, "git_rev": _git_rev(), "checks": [], "throughput": {}}
if os.environ.get("BLZ_NTT_MERGE", "1") == "1" and os.path.exists(ART):
    try:
        old = json.load(open(ART))
        if old.get("field") == SPEC.name:
            results["checks"] = old.get("checks", [])
            results["throughput"] = old.get("throughput", {})
    except Exception:
        pass


def save():
    with open(ART, "w") as f:
        json.dump(results, f, indent=1)


def record_check(rec):
    """Upsert by (kind, logn); persists immediately (long runs get killed)."""
    results["checks"] = [
        c for c in results["checks"]
        if (c["kind"], c["logn"]) != (rec["kind"], rec["logn"])
    ] + [rec]
    results["checks"].sort(key=lambda c: (c["logn"], c["kind"]))
    save()


fails = 0


def rand_mont_u16(n, seed):
    rng = np.random.default_rng(seed)
    # random limbs < 2^16 give uniform-ish values; reduce mod p via int
    raw = rng.integers(0, 1 << 16, size=(n, L), dtype=np.uint16)
    # ensure < p: zero the top limb's high bits (p is ~255 bits)
    raw[:, -1] &= 0x3FFF
    return raw


# ---- 1. cross-check vs portable plan ----------------------------------
for logn in [s for s in SIZES if s <= 18]:
    n = 1 << logn
    x16 = rand_mont_u16(n, seed=logn)
    x = jnp.asarray(x16.astype(np.uint32))
    fused = FusedNTT(SPEC, logn)
    plan = NTTPlan(SPEC, logn)
    got_f = np.asarray(fused.ntt(x))
    want_f = np.asarray(plan.ntt(x))
    ok_f = bool((got_f == want_f).all())
    got_i = np.asarray(fused.intt(x))
    want_i = np.asarray(plan.intt(x))
    ok_i = bool((got_i == want_i).all())
    record_check(
        {"kind": "vs_portable", "logn": logn, "fwd": ok_f, "inv": ok_i}
    )
    fails += (not ok_f) + (not ok_i)
    print(f"2^{logn} vs portable: fwd={ok_f} inv={ok_i}", flush=True)

# ---- 2+3. delta golden + roundtrip + throughput ------------------------
for logn in SIZES + ([BIG] if BIG not in SIZES else []):
    n = 1 << logn
    fused = FusedNTT(SPEC, logn)
    # The blocked boundary layout tiles with zero padding (a flat (n, 16)
    # u16 array is 8x-padded by the (8,128) tiling — OOM at 2^26); use it
    # whenever the plan supports it.
    blocked = fused.ntt_blocked_available()
    T = fused.block

    def fwd(xb):
        return fused.ntt16b(xb) if blocked else fused.ntt16(xb)

    def inv(yb):
        return fused.intt16b(yb) if blocked else fused.intt16(yb)

    def prep(x16):
        return jnp.asarray(fused.to_blocked(x16) if blocked else x16)

    # delta golden: NTT(delta_k)[t] = W^(k*t)
    rng = np.random.default_rng(1000 + logn)
    k = int(rng.integers(0, n))
    one_mont = int_to_limbs(SPEC.r % SPEC.p, L).astype(np.uint16)
    x16 = np.zeros((n, L), dtype=np.uint16)
    x16[k] = one_mont
    X = fwd(prep(x16))
    w = SPEC.root_of_unity(logn)
    ts = rng.integers(0, n, size=32)
    if blocked:
        samp = np.stack(
            [np.asarray(X[int(t) // T, :, int(t) % T]) for t in ts]
        ).astype(np.uint32)
    else:
        samp = np.asarray(X[jnp.asarray(ts)], dtype=np.uint32)
    ok_delta = all(
        limbs_to_int(samp[i]) == (pow(w, (k * int(t)) % n, SPEC.p) * SPEC.r)
        % SPEC.p
        for i, t in enumerate(ts)
    )
    record_check({"kind": "delta", "logn": logn, "ok": ok_delta})
    fails += not ok_delta
    print(f"2^{logn} delta golden (k={k}): {ok_delta}", flush=True)
    del X

    # roundtrip
    x16 = rand_mont_u16(n, seed=logn + 7)
    refb = np.asarray(fused.to_blocked(x16)) if blocked else x16.copy()
    y = fwd(prep(x16))
    hard_sync(y)
    back = np.asarray(inv(y), dtype=np.uint16)
    ok_rt = bool((back == refb).all())
    record_check({"kind": "roundtrip", "logn": logn, "ok": ok_rt})
    fails += not ok_rt
    print(f"2^{logn} fwd+inv roundtrip: {ok_rt}", flush=True)
    del y, back

    # throughput (forward, donated u16)
    best = float("inf")
    for _ in range(ITERS):
        xd = jnp.asarray(refb)
        hard_sync(xd)
        t0 = time.perf_counter()
        out = fwd(xd)
        hard_sync(out)
        best = min(best, time.perf_counter() - t0)
        del out
    eps = n / best
    results["throughput"][f"2^{logn}"] = {
        "elems_per_s": round(eps, 1),
        "ms": round(best * 1e3, 2),
        "parts": fused.parts,
        "layout": "blocked" if blocked else "flat",
    }
    save()
    print(f"2^{logn} fwd: {best*1e3:.1f} ms = {eps/1e6:.1f} M elems/s",
          flush=True)

# ---- 4. client lifecycle at the big size ------------------------------
# The reference's 2^27 runs THROUGH set_data/start/wait/result
# (ntt_api.rs:72-125); this drives NTTClient's blocked residency the same
# way: delta wire bytes in -> sampled W^(k*t) check on the output bytes,
# random roundtrip through the inverse client, and kernel-phase
# throughput recorded next to the plan-level number.
from blaze_tpu.runtime.clients import NTTClient, NTTInit, NTTInput

nbig = 1 << BIG
cl = NTTClient(NTTInit(field=SPEC, logn=BIG))
if cl._blocked:
    k = 12345 % nbig
    x16 = np.zeros((nbig, L), dtype=np.uint16)
    x16[k, 0] = 1                               # canonical delta
    cl.set_data(NTTInput(data=x16.astype("<u2").tobytes()))
    t0 = time.perf_counter()
    cl.start_process()
    cl.wait_result()
    client_s = time.perf_counter() - t0
    out = cl.result()
    w = SPEC.root_of_unity(BIG)
    rng = np.random.default_rng(77)
    ok_cd = True
    for t in rng.integers(0, nbig, size=16):
        off = int(t) * SPEC.nbytes
        got = int.from_bytes(out[off : off + SPEC.nbytes], "little")
        if got != pow(w, (k * int(t)) % nbig, SPEC.p):
            ok_cd = False
            break
    # roundtrip: random data through forward client then inverse client
    x16 = rand_mont_u16(nbig, seed=4242)
    data = x16.astype("<u2").tobytes()
    cl.set_data(NTTInput(data=data))
    cl.start_process()
    cl.wait_result()
    spec_bytes = cl.result()
    inv_cl = NTTClient(NTTInit(field=SPEC, logn=BIG), inverse=True)
    inv_cl.set_data(NTTInput(data=spec_bytes))
    t0 = time.perf_counter()
    inv_cl.start_process()
    inv_cl.wait_result()
    inv_s = time.perf_counter() - t0
    ok_crt = inv_cl.result() == data
    record_check({"kind": "client_delta", "logn": BIG, "ok": bool(ok_cd)})
    record_check({"kind": "client_roundtrip", "logn": BIG, "ok": bool(ok_crt)})
    results["throughput"][f"2^{BIG}_client"] = {
        "elems_per_s": round(nbig / client_s, 1),
        "fwd_ms": round(client_s * 1e3, 2),
        "inv_ms": round(inv_s * 1e3, 2),
        "note": "start_process->wait_result through NTTClient (blocked)",
    }
    save()
    fails += (not ok_cd) + (not ok_crt)
    print(
        f"2^{BIG} client: delta={ok_cd} roundtrip={ok_crt} "
        f"fwd {client_s*1e3:.1f} ms", flush=True,
    )

results["ok"] = fails == 0 and all(
    c.get("ok", c.get("fwd", True) and c.get("inv", True))
    for c in results["checks"]
)
save()
print("ALL-OK" if fails == 0 else f"FAILURES: {fails}")
sys.exit(1 if fails else 0)
