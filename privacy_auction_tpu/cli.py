"""Command-line drivers: `python -m privacy_auction_tpu.cli seal <n> <c>`.

Mirrors the reference binaries' CLI and exit-code contract
(`/root/reference/SEAL/main.cpp:13-167`, `CCS22/main.cpp:16-199`):
random bids, run the protocol, verify, compare every party's max bid
against the plaintext maximum, print per-role time and communication,
exit 0 on success / 1 on failure.
"""

from __future__ import annotations

import argparse
import contextlib
import sys
import time

import numpy as np

from .utils import log


@contextlib.contextmanager
def _maybe_profile(profile_dir):
    """jax.profiler trace around the metered run when --profile is given
    (the TPU-native counterpart of the reference's TimeTracker-only
    instrumentation, SURVEY.md section 5): view with TensorBoard or
    xprof against the written directory."""
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(profile_dir):
        yield
    log.info(f"profiler trace written to {profile_dir}")


def run_seal(n: int, c: int, seed: int, verify: bool,
             warmup: bool = True, profile_dir: str | None = None,
             fast: bool = False) -> int:
    import jax

    from .curves import SECP256K1 as CURVE
    from .protocols import seal
    from .utils import trackers as T

    rng = np.random.default_rng(seed)
    bids = [int(b) for b in rng.integers(0, 1 << c, n)]
    data = T.DataTracker()
    comm = T.SealCommTracker(data)
    times = None if fast else T.TimeTracker()

    if warmup:
        # Untimed warm-up pays JIT trace+compile so the reported per-role
        # figures measure protocol compute, as the reference's do (its
        # OpenSSL path has no compile step); --cold skips it.  A scratch
        # TimeTracker selects the same role-metered code path (its phase
        # dispatch differs from the fused path, so it compiles its own
        # programs).
        seal.run_auction(CURVE, jax.random.key(seed + 1), bids, c,
                         verify=verify,
                         times=None if fast else T.TimeTracker())
    t0 = time.perf_counter()
    with _maybe_profile(profile_dir):
        res = seal.run_auction(
            CURVE, jax.random.key(seed), bids, c, verify=verify,
            trackers=comm, times=times,
        )
    wall = time.perf_counter() - t0

    # Report mirrors `/root/reference/SEAL/main.cpp:128-149`.  Time
    # semantics of the batched build: the bidder category accumulates
    # batched-over-n prover calls (one bidder's share = total / n); one
    # batched verify pass checks every proof once, which is exactly one
    # reference verifier's workload (the n-fold re-verification is
    # redundant compute with identical results), so it is NOT divided.
    log.message(f"[SEAL] #bidders: n = {n}, bit length of bids: c = {c}")
    if times is not None:
        log.message(
            f"[SEAL] Time (one bidder): "
            f"{times.get_category_time_seconds(T.CATEGORY_BIDDER) / n:.6f}"
            " s.")
        log.message(
            f"[SEAL] Time (one verifier): "
            f"{times.get_category_time_seconds(T.CATEGORY_VERIFIER):.6f}"
            " s.")
    log.message(f"[SEAL] Data (one bidder): "
                f"{data.get_category_data_mb(T.CATEGORY_BIDDER) / n:.6f} MB")
    log.message(f"[SEAL] Data (one verifier): "
                f"{data.get_category_data_mb(T.CATEGORY_VERIFIER) / n:.6f} MB")
    log.message(f"[SEAL] Data (total communication, #bidders={n}, "
                f"#verifiers={n}): {data.get_total_data_mb():.6f} MB")
    log.message(f"[SEAL] wall-clock: {wall:.3f} s")
    if res.max_bid != max(bids):
        log.error(f"[SEAL] maxBid {res.max_bid} != {max(bids)}")
        return 1
    if verify and not res.verified:
        log.error("[SEAL] NIZK verification failed")
        return 1
    log.message(f"[SEAL] OK: maxBid = {res.max_bid}")
    return 0


def run_ccs22(n: int, c: int, seed: int, warmup: bool = True,
              profile_dir: str | None = None, fast: bool = False) -> int:
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
    times = None if fast else T.TimeTracker()

    if warmup:
        # Untimed warm-up: exclude JIT compile from the per-role report
        # (see run_seal; scratch tracker = same role-metered code path).
        ccs22.run_auction(CURVE, jax.random.key(seed + 1), bids, c, eval_id,
                          times=None if fast else T.TimeTracker())
    t0 = time.perf_counter()
    with _maybe_profile(profile_dir):
        res = ccs22.run_auction(
            CURVE, jax.random.key(seed), bids, c, eval_id, trackers=comm,
            times=times,
        )
    wall = time.perf_counter() - t0

    # Report mirrors `/root/reference/CCS22/main.cpp:140-167`: n-1 common
    # bidders, 1 evaluator, plus the shared bidder_and_evaluator category
    # (CRS download) split per party.
    shared_mb = data.get_category_data_mb(T.CATEGORY_BIDDER_AND_EVALUATOR)
    log.message(f"[CCS22] #bidders: n = {n}, bit length of bids: c = {c}")
    if times is not None:
        log.message(
            f"[CCS22] Time (one bidder): "
            f"{times.get_category_time_seconds(T.CATEGORY_BIDDER) / max(n - 1, 1):.6f}"
            " s.")
        log.message(
            f"[CCS22] Time (one evaluator): "
            f"{times.get_category_time_seconds(T.CATEGORY_EVALUATOR):.6f} s.")
    log.message(
        f"[CCS22] Data (one bidder): "
        f"{data.get_category_data_mb(T.CATEGORY_BIDDER) / max(n - 1, 1) + shared_mb / n:.6f}"
        " MB")
    log.message(
        f"[CCS22] Data (one evaluator): "
        f"{data.get_category_data_mb(T.CATEGORY_EVALUATOR) + shared_mb / n:.6f}"
        " MB")
    log.message(f"[CCS22] Data (total communication, #bidders={n - 1}, "
                f"#evaluators=1): {data.get_total_data_mb():.6f} MB")
    log.message(f"[CCS22] wall-clock: {wall:.3f} s")
    if res.max_bid != max(bids):
        log.error(f"[CCS22] maxBid {res.max_bid} != {max(bids)}")
        return 1
    log.message(f"[CCS22] OK: maxBid = {res.max_bid} (evaluator {eval_id})")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="privacy_auction_tpu")
    sub = ap.add_subparsers(dest="protocol", required=True)
    for name in ("seal", "ccs22"):
        p = sub.add_parser(name)
        p.add_argument("n", type=int, help="number of bidders")
        p.add_argument("c", type=int, help="bid bit-length")
        p.add_argument("--seed", type=int, default=None)
        p.add_argument("--cold", action="store_true",
                       help="skip the untimed warm-up run (reported "
                            "per-role times then include JIT compile)")
        p.add_argument("--profile", metavar="DIR", default=None,
                       help="write a jax.profiler trace of the metered "
                            "run to DIR (view with TensorBoard/xprof)")
        p.add_argument("--fast", action="store_true",
                       help="use the fused whole-auction driver (O(1) "
                            "dispatches; no per-role time report)")
        if name == "seal":
            p.add_argument("--no-verify", action="store_true",
                           help="disable NIZK verification "
                                "(ENABLE_VERIFICATION off)")
    args = ap.parse_args(argv)
    seed = args.seed if args.seed is not None else int(time.time()) & 0xFFFF
    if args.protocol == "seal":
        return run_seal(args.n, args.c, seed, not args.no_verify,
                        warmup=not args.cold, profile_dir=args.profile,
                        fast=args.fast)
    return run_ccs22(args.n, args.c, seed, warmup=not args.cold,
                     profile_dir=args.profile, fast=args.fast)


if __name__ == "__main__":
    sys.exit(main())
