"""Command-line drivers: `python -m privacy_auction_tpu.cli seal <n> <c>`.

Mirrors the reference binaries' CLI and exit-code contract
(`/root/reference/SEAL/main.cpp:13-167`, `CCS22/main.cpp:16-199`):
random bids, run the protocol, verify, compare every party's max bid
against the plaintext maximum, print per-role time and communication,
exit 0 on success / 1 on failure.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _print_report(label: str, n: int, c: int, wall: float, data_mb: dict):
    print(f"[{label}] n={n} bidders, c={c} bit bids")
    print(f"[{label}] wall-clock: {wall:.3f} s")
    for cat, mb in data_mb.items():
        print(f"[{label}] communication ({cat}): {mb:.3f} MB")
    print(f"[{label}] communication (total): {sum(data_mb.values()):.3f} MB")


def run_seal(n: int, c: int, seed: int, verify: bool) -> int:
    import jax

    from .curves import SECP256K1 as CURVE
    from .protocols import seal
    from .utils import trackers as T

    rng = np.random.default_rng(seed)
    bids = [int(b) for b in rng.integers(0, 1 << c, n)]
    data = T.DataTracker()
    comm = T.SealCommTracker(data)

    t0 = time.perf_counter()
    res = seal.run_auction(
        CURVE, jax.random.key(seed), bids, c, verify=verify, trackers=comm
    )
    wall = time.perf_counter() - t0

    cats = (T.CATEGORY_BIDDER, T.CATEGORY_VERIFIER)
    _print_report("SEAL", n, c, wall,
                  {cat: data.get_category_data_mb(cat) for cat in cats})
    if res.max_bid != max(bids):
        print(f"[SEAL] FAIL: maxBid {res.max_bid} != {max(bids)}",
              file=sys.stderr)
        return 1
    if verify and not res.verified:
        print("[SEAL] FAIL: NIZK verification failed", file=sys.stderr)
        return 1
    print(f"[SEAL] OK: maxBid = {res.max_bid}")
    return 0


def run_ccs22(n: int, c: int, seed: int) -> int:
    import jax

    from .curves import SECP256K1 as CURVE
    from .protocols import ccs22
    from .utils import trackers as T

    rng = np.random.default_rng(seed)
    bids = [int(b) for b in rng.integers(0, 1 << c, n)]
    eval_id = int(rng.integers(0, n))  # random evaluator (`CCS22/main.cpp:34-37`)
    data = T.DataTracker()
    comm = T.Ccs22CommTracker(data)
    comm.account_setup(n, c)

    t0 = time.perf_counter()
    res = ccs22.run_auction(
        CURVE, jax.random.key(seed), bids, c, eval_id, trackers=comm
    )
    wall = time.perf_counter() - t0

    cats = (T.CATEGORY_BIDDER, T.CATEGORY_EVALUATOR)
    _print_report("CCS22", n, c, wall,
                  {cat: data.get_category_data_mb(cat) for cat in cats})
    if res.max_bid != max(bids):
        print(f"[CCS22] FAIL: maxBid {res.max_bid} != {max(bids)}",
              file=sys.stderr)
        return 1
    print(f"[CCS22] OK: maxBid = {res.max_bid} (evaluator {eval_id})")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="privacy_auction_tpu")
    sub = ap.add_subparsers(dest="protocol", required=True)
    for name in ("seal", "ccs22"):
        p = sub.add_parser(name)
        p.add_argument("n", type=int, help="number of bidders")
        p.add_argument("c", type=int, help="bid bit-length")
        p.add_argument("--seed", type=int, default=None)
        if name == "seal":
            p.add_argument("--no-verify", action="store_true",
                           help="disable NIZK verification "
                                "(ENABLE_VERIFICATION off)")
    args = ap.parse_args(argv)
    seed = args.seed if args.seed is not None else int(time.time()) & 0xFFFF
    if args.protocol == "seal":
        return run_seal(args.n, args.c, seed, not args.no_verify)
    return run_ccs22(args.n, args.c, seed)


if __name__ == "__main__":
    sys.exit(main())
