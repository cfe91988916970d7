"""Time each dispatch of the fused SEAL fast path separately to locate
where the wall-clock goes at a given (n, c)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from privacy_auction_tpu import curves
from privacy_auction_tpu.protocols import seal


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])


def _time(label, fn, reps=3):
    out = fn()
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best*1e3:9.2f} ms")
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    curve = curves.SECP256K1
    rng = np.random.default_rng(0)
    bids = [int(x) for x in rng.integers(0, 1 << min(c, 63), size=n)]
    key = jax.random.PRNGKey(42)

    # whole fast path, end to end
    t0 = time.perf_counter()
    res = seal.run_auction(curve, key, bids, c)
    t_total = time.perf_counter() - t0
    print(f"{'run_auction (cold)':28s} {t_total*1e3:9.2f} ms  "
          f"verified={res.verified} max={res.max_bid}")
    t0 = time.perf_counter()
    res = seal.run_auction(curve, key, bids, c)
    print(f"{'run_auction (warm)':28s} {(time.perf_counter()-t0)*1e3:9.2f} ms")

    bits = jnp.asarray(seal.bids_to_bits(bids, c))
    ids = jnp.arange(n, dtype=jnp.uint32)
    kc, ks = jax.random.split(key)
    commit_pub, commit_sec = _time(
        "commit", lambda: seal._jit_commit(curve, kc, bits, ids))
    _time("verify_commit",
          lambda: seal._jit_verify_commit(curve, commit_pub, ids))

    k_r1, k_scan = jax.random.split(ks)
    step_keys = jax.random.split(k_scan, c)
    pub1, sec1 = _time(
        "round_one_batch",
        lambda: seal._jit_round_one_batch(curve, k_r1, n, c, ids))
    _time("verify_round_one_batch",
          lambda: seal._jit_verify_round_one_batch(curve, pub1, ids))
    Y_all = _time("avnet_steps",
                  lambda: seal._jit_avnet_steps(curve, pub1.X))
    b01 = _time("b01", lambda: seal._jit_b01(curve, Y_all, pub1.R, sec1.x))
    ok_r1 = seal._jit_verify_round_one_batch(curve, pub1, ids).all(axis=1)
    pre = (step_keys, pub1.X, pub1.R, sec1.x, Y_all, b01[0], b01[1], ok_r1)

    scan = jax.jit(seal._scan_steps, static_argnums=(0, 6))
    _time("scan_steps",
          lambda: scan(curve, pre, bits, ids, commit_pub, commit_sec, True))
    _time("scan_steps (no verify)",
          lambda: scan(curve, pre, bits, ids, commit_pub, commit_sec, False))


if __name__ == "__main__":
    main()
