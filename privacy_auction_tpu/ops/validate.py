"""Differential validation of the Pallas EC kernels against the host oracle.

Run on the execution platform that will actually serve the hot path (real
TPU for production / benchmarks; interpret mode on CPU for unit tests).
Every fused kernel wrapper (`pallas_ec.scalar_mul`, `dual_mul`,
`base_mul_add`, `mul_base`/`mul_comb`) is checked lane-by-lane against the
pure-int host implementation (`utils.host_curve`), including edge lanes
(scalar 0, scalar 1, point at infinity).

Parity target: OpenSSL `EC_POINT_mul` semantics at the reference call
sites (`/root/reference/SEAL/bidder.cpp:98,128-130,1131-1138`).
"""

from __future__ import annotations

import random

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import Curve
from . import ec
from . import field as F
from . import pallas_ec as PE


def _host_decode(curve: Curve, arr):
    return [ec.decode_host_point(curve, p) for p in np.asarray(arr)]


def validate_pallas_kernels(curve: Curve, lanes: int = 8, seed: int = 0):
    """Raise AssertionError on any kernel/oracle mismatch.

    lanes: number of checked lanes per kernel (the wrappers pad the batch
    to the block width; padded lanes are not checked).
    """
    host = curve.host
    rng = random.Random(seed)

    # edge lanes first: k in {0, 1, n-1}, then random scalars
    ks = [0, 1, host.n - 1] + [rng.randrange(host.n) for _ in range(lanes - 3)]
    ts = [1, 0, rng.randrange(host.n)] + [
        rng.randrange(host.n) for _ in range(lanes - 3)
    ]
    base_ints = [rng.randrange(1, host.n) for _ in range(lanes)]
    P_host = [host.mul(b, host.g) for b in base_ints]
    Q_host = [host.mul(b + 1, host.g) for b in base_ints]
    # lane 2 exercises the point-at-infinity input path
    P_host[2] = None
    Q_host[2] = None

    k = jnp.asarray(F.ints_to_limbs(ks))
    t = jnp.asarray(F.ints_to_limbs(ts))
    P = jnp.asarray(ec.encode_host_points(P_host))
    Q = jnp.asarray(ec.encode_host_points(Q_host))

    got = _host_decode(curve, jax.jit(
        lambda P, k: PE.scalar_mul(curve, P, k))(P, k))
    want = [host.mul(ki, Pi) if Pi is not None else None
            for ki, Pi in zip(ks, P_host)]
    assert got == want, f"pallas scalar_mul mismatch: {got} != {want}"

    got = _host_decode(curve, jax.jit(
        lambda P, k, Q, t: PE.dual_mul(curve, P, k, Q, t))(P, k, Q, t))
    want = [host.add(host.mul(ki, Pi) if Pi is not None else None,
                     host.mul(ti, Qi) if Qi is not None else None)
            for ki, Pi, ti, Qi in zip(ks, P_host, ts, Q_host)]
    assert got == want, "pallas dual_mul mismatch"

    got = _host_decode(curve, jax.jit(
        lambda s, P, t: PE.base_mul_add(curve, s, P, t))(k, P, t))
    want = [host.add(host.mul(ki, host.g),
                     host.mul(ti, Pi) if Pi is not None else None)
            for ki, Pi, ti in zip(ks, P_host, ts)]
    assert got == want, "pallas base_mul_add mismatch"

    got = _host_decode(curve, jax.jit(lambda k: PE.mul_base(curve, k))(k))
    want = [host.mul(ki, host.g) for ki in ks]
    assert got == want, "pallas mul_base mismatch"

    if curve.glv is None:
        return

    # GLV dispatch layer: on a pallas-capable platform these exercise the
    # endomorphism-split kernels (dual_mul_windows / quad_mul_windows /
    # base_mul_add_glv) that the protocols actually run on GLV curves.
    got = _host_decode(curve, jax.jit(
        lambda P, k: ec.scalar_mul(curve, P, k))(P, k))
    want = [host.mul(ki, Pi) if Pi is not None else None
            for ki, Pi in zip(ks, P_host)]
    assert got == want, "glv scalar_mul mismatch"

    got = _host_decode(curve, jax.jit(
        lambda P, k, Q, t: ec.dual_mul(curve, P, k, Q, t))(P, k, Q, t))
    want = [host.add(host.mul(ki, Pi) if Pi is not None else None,
                     host.mul(ti, Qi) if Qi is not None else None)
            for ki, Pi, ti, Qi in zip(ks, P_host, ts, Q_host)]
    assert got == want, "glv dual_mul mismatch"

    got = _host_decode(curve, jax.jit(
        lambda s, P, t: ec.base_mul_add(curve, s, P, t))(k, P, t))
    want = [host.add(host.mul(ki, host.g),
                     host.mul(ti, Pi) if Pi is not None else None)
            for ki, Pi, ti in zip(ks, P_host, ts)]
    assert got == want, "glv base_mul_add mismatch"
