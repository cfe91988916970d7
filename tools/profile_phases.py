"""Per-phase device-time breakdown for SEAL at scale.

Times every protocol phase program individually at a given (n, c) --
commit / commit-verify once, the six per-step programs (round1,
round1-verify, AV-net keys, round2 Stage1|Stage2 gen, round2 verify,
round3) at a representative step -- and prints the extrapolated
whole-auction share of each phase.  This extends the reference's per-role
self-report (`/root/reference/SEAL/main.cpp:129-149`) down to phase
granularity so optimization effort can follow data.

With --profile, additionally wraps one metered auction in
`jax.profiler.trace` (view with tensorboard / xprof).

Usage: python tools/profile_phases.py [n] [c] [--profile] [--json out]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

try:
    with open("/proc/sys/kernel/random/boot_id") as _f:
        _boot = _f.read().strip()
except OSError:
    _boot = "noboot"

import jax

jax.config.update("jax_compilation_cache_dir", f"/tmp/pa_tpu_jax_cache_{_boot}")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])


def _time(fn, *args, reps: int = 3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, nargs="?", default=1024)
    ap.add_argument("c", type=int, nargs="?", default=64)
    ap.add_argument("--profile", action="store_true",
                    help="also capture a jax.profiler trace of one fused "
                         "auction into /tmp/pa_profile")
    ap.add_argument("--json", default=None, help="write breakdown JSON here")
    args = ap.parse_args()
    n, c = args.n, args.c

    from privacy_auction_tpu.curves import SECP256K1 as CURVE
    from privacy_auction_tpu.protocols import seal

    rng = np.random.default_rng(1)
    bids = [int(b) for b in rng.integers(0, 1 << c, n, dtype=np.uint64)]
    bits = jnp.asarray(seal.bids_to_bits(bids, c))
    ids = jnp.arange(n, dtype=jnp.uint32)
    keys = jax.random.split(jax.random.key(0), 4)

    t = {}
    t["commit"], (cpub, csec) = _time(
        lambda: seal._jit_commit(CURVE, keys[0], bits, ids))
    t["verify_commit"], _ = _time(
        lambda: seal._jit_verify_commit(CURVE, cpub, ids))
    t["round1"], (pub1, sec1) = _time(
        lambda: seal._jit_round_one(CURVE, keys[1], n, ids, 0))
    t["verify_round1"], _ = _time(
        lambda: seal._jit_verify_round_one(CURVE, pub1, ids, 0))
    t["avnet"], Y = _time(lambda: seal._jit_avnet(CURVE, pub1.X))
    d = bits[:, 0]
    t["round2_s1"], (pub2, info) = _time(
        lambda: seal._jit_round_two_s1(
            CURVE, keys[2], sec1, pub1, Y, cpub, csec, bits[:, 0], d,
            ids, 0))
    t["verify_round2_s1"], _ = _time(
        lambda: seal._jit_verify_round_two_s1(
            CURVE, pub2, pub1, Y, cpub, ids, 0))
    t["round2_s2"], (pub2b, _i2) = _time(
        lambda: seal._jit_round_two_s2(
            CURVE, keys[3], sec1, pub1, Y, cpub, csec, d, info, ids, 1))
    t["verify_round2_s2"], _ = _time(
        lambda: seal._jit_verify_round_two_s2(
            CURVE, pub2b, pub1, Y, cpub, info, ids, 1))
    t["round3"], _ = _time(lambda: seal._jit_round_three(CURVE, pub2.b))

    # extrapolated full auction: 1 commit + c steps; assume the first
    # step decides (uniform bids make the MSB-set probability high), so
    # Stage1 once and Stage2 for the remaining c-1 steps.
    per_step_s1 = (t["round1"] + t["verify_round1"] + t["avnet"]
                   + t["round2_s1"] + t["verify_round2_s1"] + t["round3"])
    per_step_s2 = (t["round1"] + t["verify_round1"] + t["avnet"]
                   + t["round2_s2"] + t["verify_round2_s2"] + t["round3"])
    total = (t["commit"] + t["verify_commit"] + per_step_s1
             + (c - 1) * per_step_s2)

    shares = {
        "commit": t["commit"] + t["verify_commit"],
        "round1": c * (t["round1"] + t["verify_round1"]),
        "avnet": c * t["avnet"],
        "round2_gen": t["round2_s1"] + (c - 1) * t["round2_s2"],
        "round2_verify": (t["verify_round2_s1"]
                          + (c - 1) * t["verify_round2_s2"]),
        "round3": c * t["round3"],
    }
    print(f"# SEAL {n}x{c} per-phase device time "
          f"(platform {jax.devices()[0].platform})")
    for k, v in t.items():
        print(f"{k:20s} {v * 1e3:10.2f} ms/dispatch")
    print(f"# extrapolated auction total: {total:.2f} s; phase shares:")
    for k, v in sorted(shares.items(), key=lambda kv: -kv[1]):
        print(f"{k:20s} {v:10.2f} s  {100 * v / total:5.1f}%")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"n": n, "c": c, "dispatch_s": t,
                       "extrapolated_total_s": total, "shares_s": shares},
                      f, indent=1)

    if args.profile:
        from privacy_auction_tpu.utils.trackers import TimeTracker

        with jax.profiler.trace("/tmp/pa_profile"):
            res = seal.run_auction(
                CURVE, jax.random.key(9), bids, c, verify=True,
                times=TimeTracker(),
            )
        print(f"# profile trace in /tmp/pa_profile (max_bid={res.max_bid})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
