"""Headline benchmark: batched EC scalar-mult throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.json): EC scalar-mults/s/chip.  The reference
baseline is OpenSSL secp256k1 arbitrary-base EC_POINT_mul on one Xeon core:
2,641 ops/s (BASELINE.md).  `vs_baseline` is the speedup factor.

Before timing anything, every Pallas kernel is differentially validated
against the pure-int host oracle on this platform (nonzero exit on any
mismatch; `kernels_validated` in the JSON records it).  Auction
wall-clocks at the BASELINE.md configs (SEAL 4x8 / 20x32, CCS22 8x16 /
64x32) run by default and land in the JSON line next to the headline.
"""

import argparse
import json
import sys
import time

# Persistent compile cache (same policy as tests/conftest.py): the big
# crypto kernels are expensive to compile; key by boot id so stale
# machine-feature mismatches can't bite.
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

BASELINE_SCALAR_MUL_OPS = 2641.0  # OpenSSL, 1 Xeon core (BASELINE.md)
BASELINE_SEAL_20x32_S = 162.0     # reference wall-clock (BASELINE.md)
BASELINE_CCS22_64x32_S = 12.0     # reference wall-clock (BASELINE.md)


def validate_kernels() -> bool:
    """Differentially validate every Pallas kernel on this platform before
    timing anything (VERDICT r2 item 1).  Returns True, or raises."""
    from privacy_auction_tpu.curves import SECP256K1 as CURVE
    from privacy_auction_tpu.ops import ec
    from privacy_auction_tpu.ops.validate import validate_pallas_kernels

    if not ec._use_pallas():
        return False  # pure-XLA path active; nothing to validate here
    validate_pallas_kernels(CURVE, lanes=8, seed=7)
    return True


def bench_scalar_mul(batch: int, iters: int = 8) -> float:
    from privacy_auction_tpu.curves import SECP256K1 as CURVE
    from privacy_auction_tpu.ops import ec, field as F

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    k = F.random(CURVE.fn, k1, (batch,))
    base_scalars = F.random(CURVE.fn, k2, (batch,))
    P = ec.mul_base(CURVE, base_scalars)
    P = jax.block_until_ready(P)

    fn = jax.jit(lambda p, s: ec.scalar_mul(CURVE, p, s))
    out = fn(P, k)
    _ = np.asarray(out)  # hard sync: device->host transfer, not just
    # block_until_ready (which the experimental axon platform can satisfy
    # before execution completes -- round 1's 113M ops/s was that artifact)
    best = 0.0
    for _rep in range(3):  # first rep absorbs residual warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(out, k)
        _ = np.asarray(out)
        dt = time.perf_counter() - t0
        best = max(best, batch * iters / dt)
    return best


def bench_auctions(trend: bool = False):
    """Auction wall-clocks at the BASELINE.md configs (VERDICT r2 item 3).

    Reference numbers to beat (1 Xeon core, BASELINE.md): SEAL 20x32 =
    162 s, CCS22 64x32 = 12.0 s.  Each config runs once warm-up (pays any
    residual compile; shapes differ per n so each config compiles its own
    programs) and once timed.
    """
    from privacy_auction_tpu.curves import SECP256K1 as CURVE
    from privacy_auction_tpu.protocols import ccs22, seal

    rng = np.random.default_rng(0)
    out = {}
    seal_cfgs = [(4, 8), (20, 32)] + ([(128, 32)] if trend else [])
    for n, c in seal_cfgs:
        bids = [int(b) for b in rng.integers(0, 1 << c, n)]
        seal.run_auction(CURVE, jax.random.key(1), bids, c, verify=True)
        t0 = time.perf_counter()
        res = seal.run_auction(CURVE, jax.random.key(2), bids, c, verify=True)
        out[f"seal_{n}x{c}_wall_s"] = time.perf_counter() - t0
        assert res.max_bid == max(bids) and res.verified
    for n, c in ((8, 16), (64, 32)):
        bids = [int(b) for b in rng.integers(0, 1 << c, n)]
        ccs22.run_auction(CURVE, jax.random.key(3), bids, c)
        t0 = time.perf_counter()
        res = ccs22.run_auction(CURVE, jax.random.key(4), bids, c)
        out[f"ccs22_{n}x{c}_wall_s"] = time.perf_counter() - t0
        assert res.max_bid == max(bids)
    out["seal_20x32_vs_baseline"] = BASELINE_SEAL_20x32_S / out["seal_20x32_wall_s"]
    out["ccs22_64x32_vs_baseline"] = (
        BASELINE_CCS22_64x32_S / out["ccs22_64x32_wall_s"]
    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384,
                    help="scalar-mult lanes per dispatch; 16384 amortizes "
                         "the per-call dispatch overhead (throughput "
                         "plateau on v5e)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--quick", action="store_true",
                    help="skip the auction wall-clock benches")
    ap.add_argument("--trend", action="store_true",
                    help="also run the large SEAL 128x32 throughput point")
    args = ap.parse_args()

    validated = validate_kernels()  # raises (nonzero exit) on any mismatch
    ops = bench_scalar_mul(args.batch, args.iters)
    extra = {}
    if not args.quick:
        for k, v in bench_auctions(trend=args.trend).items():
            print(f"{k}: {v:.3f}", file=sys.stderr)
            extra[k] = round(v, 3)
    print(json.dumps({
        "metric": "ec_scalar_mults_per_s_per_chip",
        "value": round(ops, 1),
        "unit": "ops/s",
        "vs_baseline": round(ops / BASELINE_SCALAR_MUL_OPS, 2),
        "kernels_validated": validated,
        **extra,
    }))


if __name__ == "__main__":
    main()
