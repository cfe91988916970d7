"""Reference-parity randomized e2e sweep runner (the ctest equivalent).

The reference's entire test modality is ctest over ~100 random (n, c)
pairs, n in [1, 20], c in [1, 32], pass = exit code 0
(`/root/reference/SEAL/tests/CMakeLists.txt:3-10`,
`/root/reference/README.md:50`).  This tool reproduces that sweep through
the production TPU drivers: for every drawn pair it runs a full SEAL
auction (NIZK verification ON) and a full CCS22 auction (random
evaluator) and asserts every party's max bid against the plaintext max.

Shape bucketing (default): each drawn (n, c) executes inside a padded
(n_b, c_b) bucket -- the bidder axis padded with honest zero-bid dummy
lanes, the bit axis padded with leading zero bits.  This is mathematically
the *same auction* (dummy lanes bid 0 and cannot change the maximum;
leading zero bits produce non-deciding steps), so the assertion is exactly
the reference's, while the number of distinct XLA compilations stays
bounded (each fused-auction compile costs minutes on the axon TPU
platform; the drawn bids/eval-id randomness is untouched).  --literal
disables bucketing and compiles every drawn shape.

Usage:
  python tools/gen_tests.py --tests 100 --bidders_max 20 --bitslen_max 32 \
      --out params.txt --seed 5
  python tools/run_sweep.py --params params.txt | tee SWEEP_r05.txt
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Bucket sets are coarse because each distinct (n, c) shape costs minutes
# of (remote) XLA compilation on the axon platform; padding is outcome-
# preserving (see module docstring), so coarse buckets trade nothing but
# padded lanes' compute.
N_BUCKETS = (4, 8, 20)
C_BUCKETS = (32,)


def bucket(v: int, buckets) -> int:
    for b in buckets:
        if v <= b:
            return b
    return buckets[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="params.txt",
                    help="params.txt from tools/gen_tests.py")
    ap.add_argument("--literal", action="store_true",
                    help="compile every drawn shape (no bucket padding)")
    ap.add_argument("--seal-only", action="store_true")
    ap.add_argument("--ccs22-only", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    path = pathlib.Path(args.params)
    if not path.exists():
        print(f"params file {path} not found; run tools/gen_tests.py first",
              file=sys.stderr)
        return 2
    pairs = [tuple(map(int, ln.split()))
             for ln in path.read_text().splitlines() if ln.strip()]

    import jax
    import numpy as np

    # persistent compile cache (same policy as bench.py)
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            boot = f.read().strip()
    except OSError:
        boot = "noboot"
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/pa_tpu_jax_cache_{boot}")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from privacy_auction_tpu.curves import SECP256K1 as CURVE
    from privacy_auction_tpu.protocols import ccs22, seal

    platform = jax.devices()[0].platform
    print(f"# reference-parity sweep: {len(pairs)} pairs, platform="
          f"{platform}, bucketing={'off' if args.literal else 'on'}")
    t_all = time.time()
    failures = 0
    for i, (n, c) in enumerate(pairs):
        rng = np.random.default_rng(args.seed * 1_000_003 + n * 1000 + c)
        bids = [int(b) for b in rng.integers(0, 1 << c, n)]
        if args.literal:
            n_run, c_run, run_bids = n, c, bids
        else:
            n_run = bucket(n, N_BUCKETS)
            c_run = bucket(c, C_BUCKETS)
            run_bids = bids + [0] * (n_run - n)
        want = max(bids)
        line = f"[{i + 1:3d}/{len(pairs)}] n={n:2d} c={c:2d}"
        if (n_run, c_run) != (n, c):
            line += f" (bucket {n_run}x{c_run})"

        ok = True
        if not args.ccs22_only:
            t0 = time.time()
            res = seal.run_auction(
                CURVE, jax.random.key(n * 77 + c), run_bids, c_run,
                verify=True,
            )
            dt = time.time() - t0
            good = res.verified and res.max_bid == want
            ok &= good
            line += (f"  SEAL {'ok' if good else 'FAIL'} "
                     f"max={res.max_bid} {dt:6.2f}s")
        if not args.seal_only:
            t0 = time.time()
            eval_id = int(rng.integers(0, n))
            cres = ccs22.run_auction(
                CURVE, jax.random.key(n * 99 + c), run_bids, c_run,
                eval_id=eval_id,
            )
            dt = time.time() - t0
            good = cres.max_bid == want
            ok &= good
            line += (f"  CCS22 {'ok' if good else 'FAIL'} "
                     f"max={cres.max_bid} {dt:6.2f}s")
        failures += not ok
        print(line, flush=True)

    total = time.time() - t_all
    verdict = "PASS" if failures == 0 else f"FAIL ({failures} pairs)"
    print(f"# {verdict}: {len(pairs) - failures}/{len(pairs)} pairs in "
          f"{total:.0f}s on {platform}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
