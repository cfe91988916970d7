"""Headline benchmark: batched EC scalar-mult throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.json): EC scalar-mults/s/chip.  The reference
baseline is OpenSSL secp256k1 arbitrary-base EC_POINT_mul on one Xeon core:
2,641 ops/s (BASELINE.md).  `vs_baseline` is the speedup factor.

Before timing anything, every Pallas kernel is differentially validated
against the pure-int host oracle on this platform (nonzero exit on any
mismatch; `kernels_validated` in the JSON records it).

The JSON line also carries:
  * per-kernel ops/s for every ladder the protocols ride (mul_base /
    scalar_mul / dual_mul / base_mul_add) plus the raw field-mul
    throughput and a roofline ratio (measured ladder throughput vs the
    analytic field-mul budget) -- so "fast" is checkable per round;
  * auction wall-clocks at the BASELINE.md configs (SEAL 4x8 / 20x32,
    CCS22 8x16 / 64x32), a SEAL throughput trend over n at c=32, and the
    BASELINE.md north-star scale: SEAL and CCS22 at 1024 bidders x
    64-bit bids, verification on, max bid asserted against plaintext.
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

# Analytic field-mul budgets per ladder op (roofline denominators).
# Derivation (ops/ec.py kernels, RCB16 complete formulas: add = 12M, a=0
# dbl = 9M):  GLV ladders cover 132 signed bits in 33 4-bit windows of
# 4 dbl + (1 table add per point stream); epilogue ~ 1 inversion (~265M).
#   scalar_mul  (GLV, 2 streams): 33*(4*9 + 2*12) + 300 ~= 2280 M
#   dual_mul    (GLV, 4 streams): 33*(4*9 + 4*12) + 300 ~= 3070 M
#   base_mul_add (comb + GLV):    fixed-base comb (64 adds) + GLV arb-base
#                                 interleaved ~= 33*36 + 64*12 + 2*33*12 + 300
#                                 ~= 3050 M
#   mul_base    (64-window comb): 64*12 + 300 ~= 1070 M
FIELDMULS_PER = {
    "mul_base": 1070.0,
    "scalar_mul": 2280.0,
    "dual_mul": 3070.0,
    "base_mul_add": 3050.0,
}

# Roofline ceiling: one 256-bit modular mul in 16x16-bit limbs costs
# ~256 lane-multiplies + ~700 adds/shifts/selects (carry scans, fast
# fold) ~= 1000 VPU integer lane-ops when fully fused in registers.  A
# v5e chip's VPU sustains very roughly 0.9e12 int32 lane-ops/s (8 cores
# x 4 VPUs x 8x128 lanes x ~940 MHz is the upper bound; int multiplies
# are not single-cycle on every lane, so this is an ESTIMATE -- the
# fraction is a sanity gauge, not a precision claim).  The standalone
# field_mul microbench deliberately stays in the JSON too: it is
# HBM-bound (192 B moved per ~1000 lane-ops) and shows the fused-ladder
# rate exceeding it ~15x, i.e. the ladders really do keep limbs in
# registers instead of round-tripping HBM.
VPU_INT_OPS_PER_S = 0.9e12
VPU_OPS_PER_FIELDMUL = 1000.0


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


def _sync(out):
    """Hard sync via a TINY host transfer (axon: block_until_ready can
    return before execution completes -- round 1's 113M ops/s was that
    artifact; and transferring the full result would meter the tunnel's
    host-transfer bandwidth, not the kernel -- round 4's field-mul
    'roofline' was that artifact).  Fetching one element forces the whole
    buffer (and everything queued before it) to be computed."""
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])


def _throughput(fn, args, batch, iters, reps=3):
    """Best-of-reps steady-state ops/s for a jitted fn over `batch` lanes."""
    out = fn(*args)
    _sync(out)
    best = 0.0
    for _rep in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        dt = time.perf_counter() - t0
        best = max(best, batch * iters / dt)
    return best


def bench_kernels(batch: int, iters: int = 8) -> dict:
    """Per-kernel ops/s for every ladder the protocols ride, plus the raw
    256-bit field-mul throughput and roofline ratios (VERDICT r4 item 3).
    """
    from privacy_auction_tpu.curves import SECP256K1 as CURVE
    from privacy_auction_tpu.ops import ec, field as F

    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    k = F.random(CURVE.fn, ks[0], (batch,))
    t = F.random(CURVE.fn, ks[1], (batch,))
    P = jax.block_until_ready(ec.mul_base(CURVE, F.random(CURVE.fn, ks[2], (batch,))))
    Q = jax.block_until_ready(ec.mul_base(CURVE, F.random(CURVE.fn, ks[3], (batch,))))

    out = {}
    out["mul_base"] = _throughput(
        jax.jit(lambda s: ec.mul_base(CURVE, s)), (k,), batch, iters)
    out["scalar_mul"] = _throughput(
        jax.jit(lambda p, s: ec.scalar_mul(CURVE, p, s)), (P, k), batch, iters)
    out["dual_mul"] = _throughput(
        jax.jit(lambda p, s, q, u: ec.dual_mul(CURVE, p, s, q, u)),
        (P, k, Q, t), batch, iters)
    out["base_mul_add"] = _throughput(
        jax.jit(lambda s, p, u: ec.base_mul_add(CURVE, s, p, u)),
        (k, P, t), batch, iters)
    # raw 256-bit modular multiply (the roofline numerator): much larger
    # batch since one op is tiny
    fbatch = batch * 64
    a = F.random(CURVE.fp, ks[0], (fbatch,))
    b = F.random(CURVE.fp, ks[1], (fbatch,))
    out["field_mul"] = _throughput(
        jax.jit(lambda x, y: F.mul(CURVE.fp, x, y)), (a, b), fbatch, 4)
    for name, budget in FIELDMULS_PER.items():
        ceiling = VPU_INT_OPS_PER_S / (budget * VPU_OPS_PER_FIELDMUL)
        out[f"{name}_roofline_frac"] = out[name] / ceiling
    return out


def bench_scalar_mul(batch: int, iters: int = 8) -> float:
    from privacy_auction_tpu.curves import SECP256K1 as CURVE
    from privacy_auction_tpu.ops import ec, field as F

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    k = F.random(CURVE.fn, k1, (batch,))
    base_scalars = F.random(CURVE.fn, k2, (batch,))
    P = ec.mul_base(CURVE, base_scalars)
    P = jax.block_until_ready(P)
    return _throughput(
        jax.jit(lambda p, s: ec.scalar_mul(CURVE, p, s)), (P, k), batch, iters
    )


def bench_auctions(scale: bool = True):
    """Auction wall-clocks at the BASELINE.md configs + the north-star
    scale (VERDICT r4 item 1).

    Reference numbers to beat (1 Xeon core, BASELINE.md): SEAL 20x32 =
    162 s, CCS22 64x32 = 12.0 s.  Each config runs once warm-up (pays any
    residual compile; shapes differ per n so each config compiles its own
    programs) and once timed.  `scale=False` drops the trend/north-star
    configs (quick mode).
    """
    from privacy_auction_tpu.curves import SECP256K1 as CURVE
    from privacy_auction_tpu.protocols import ccs22, seal

    rng = np.random.default_rng(0)
    out = {}
    seal_cfgs = [(4, 8), (20, 32)]
    if scale:
        # throughput-vs-n trend + BASELINE.md north-star (1024 x 64)
        seal_cfgs += [(128, 32), (512, 32), (1024, 32), (1024, 64)]
    def rand_bids(n, c):
        # c can be 64: draw as uint64 (2**64 overflows numpy's int64 path)
        return [int(b)
                for b in rng.integers(0, 1 << c, n, dtype=np.uint64,
                                      endpoint=False)]

    def run_retry(fn, what, tries=3):
        # the axon platform compiles through a local HTTP tunnel that
        # occasionally drops mid-response; the compile cache makes a
        # retry cheap (only the failed program recompiles)
        import jax as _jax

        for attempt in range(tries):
            try:
                return fn()
            except _jax.errors.JaxRuntimeError as e:
                if attempt == tries - 1:
                    raise
                print(f"{what}: transient backend error, retrying "
                      f"({e})", file=sys.stderr, flush=True)

    for n, c in seal_cfgs:
        bids = rand_bids(n, c)
        print(f"seal {n}x{c}: warm-up...", file=sys.stderr, flush=True)
        run_retry(lambda: seal.run_auction(
            CURVE, jax.random.key(1), bids, c, verify=True), f"seal {n}x{c}")
        t0 = time.perf_counter()
        res = seal.run_auction(CURVE, jax.random.key(2), bids, c, verify=True)
        out[f"seal_{n}x{c}_wall_s"] = time.perf_counter() - t0
        print(f"seal {n}x{c}: {out[f'seal_{n}x{c}_wall_s']:.3f} s",
              file=sys.stderr, flush=True)
        assert res.max_bid == max(bids) and res.verified, (
            f"seal {n}x{c}: got {res.max_bid} verified={res.verified}, "
            f"want {max(bids)}"
        )
    ccs_cfgs = [(8, 16), (64, 32)] + ([(1024, 64)] if scale else [])
    for n, c in ccs_cfgs:
        bids = rand_bids(n, c)
        print(f"ccs22 {n}x{c}: warm-up...", file=sys.stderr, flush=True)
        run_retry(lambda: ccs22.run_auction(
            CURVE, jax.random.key(3), bids, c), f"ccs22 {n}x{c}")
        t0 = time.perf_counter()
        res = ccs22.run_auction(CURVE, jax.random.key(4), bids, c)
        out[f"ccs22_{n}x{c}_wall_s"] = time.perf_counter() - t0
        print(f"ccs22 {n}x{c}: {out[f'ccs22_{n}x{c}_wall_s']:.3f} s",
              file=sys.stderr, flush=True)
        assert res.max_bid == max(bids), (
            f"ccs22 {n}x{c}: got {res.max_bid}, want {max(bids)}"
        )
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
    ap.add_argument("--no-scale", action="store_true",
                    help="skip the trend + north-star (1024x64) configs")
    args = ap.parse_args()

    validated = validate_kernels()  # raises (nonzero exit) on any mismatch
    kern = bench_kernels(args.batch, args.iters)
    ops = kern["scalar_mul"]
    extra = {}
    for k, v in kern.items():
        print(f"{k}: {v:.4g}", file=sys.stderr)
        extra[k if k.endswith("frac") else f"{k}_ops_s"] = (
            round(v, 4) if k.endswith("frac") else round(v, 1)
        )
    if not args.quick:
        for k, v in bench_auctions(scale=not args.no_scale).items():
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
