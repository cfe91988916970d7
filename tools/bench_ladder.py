"""Microbench the fused Pallas ladder kernels on the attached TPU chip.

Prints per-kernel wall-clock (best of reps) at a few lane counts, so
kernel-level work can be measured in isolation from the drivers.
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from privacy_auction_tpu import curves
from privacy_auction_tpu.ops import ec, pallas_ec as pec


def _sync(out):
    """Hard sync via a tiny host transfer (axon block_until_ready can
    return early; see bench.py:_sync)."""
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])


def _run_n(fn, iters):
    out = None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return time.perf_counter() - t0


def timeit(fn, reps=3, iters=10):
    """Steady-state per-call seconds by slope: (t[2+iters] - t[2]) / iters.

    Subtracts the fixed sync/tunnel round-trip that dominates single-call
    timings on the axon platform (~26 ms regardless of kernel size)."""
    _sync(fn())  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t_small = _run_n(fn, 2)
        t_big = _run_n(fn, 2 + iters)
        best = min(best, (t_big - t_small) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, nargs="*", default=[128, 512])
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    curve = curves.SECP256K1
    rng = np.random.default_rng(0)
    for n in args.lanes:
        ks = jnp.asarray(
            np.stack([
                np.frombuffer(rng.bytes(32), dtype=np.uint16).astype(np.uint32)
                for _ in range(n)
            ])
        )
        P = ec.mul_base(curve, ks)
        jax.block_until_ready(P)

        sm64 = jax.jit(lambda P, k: pec.scalar_mul(curve, P, k))
        mb = jax.jit(lambda k: pec.mul_base(curve, k))
        bma64 = jax.jit(lambda s, P, t: pec.base_mul_add(curve, s, P, t))
        glv_sm = jax.jit(lambda P, k: ec.scalar_mul(curve, P, k))
        glv_ver = jax.jit(lambda s, P, t: ec.base_mul_add(curve, s, P, t))
        t_sm = timeit(lambda: sm64(P, ks), args.reps)
        t_mb = timeit(lambda: mb(ks), args.reps)
        t_bma = timeit(lambda: bma64(ks, P, ks), args.reps)
        t_glv = timeit(lambda: glv_sm(P, ks), args.reps)
        t_ver = timeit(lambda: glv_ver(ks, P, ks), args.reps)
        print(
            f"lanes={n}: sm64={t_sm*1e3:.2f}ms mul_base={t_mb*1e3:.2f}ms "
            f"bma64={t_bma*1e3:.2f}ms | GLV sm(33w quad)={t_glv*1e3:.2f}ms "
            f"GLV bma={t_ver*1e3:.2f}ms"
        )


if __name__ == "__main__":
    main()
