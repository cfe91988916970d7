"""GLV endomorphism tests: derivation, decomposition, split ladders.

The reference's OpenSSL backend does not use the secp256k1 endomorphism
(generic wNAF ladders); the TPU build derives the GLV constants from
first principles (privacy_auction_tpu/curves.py:derive_glv_params) and
halves every variable-base doubling chain with them.  These tests pin:
  * the host derivation invariants (order-3 elements, lattice basis),
  * the device decomposition against exact-int arithmetic on edge scalars,
  * the split scalar_mul/dual_mul/base_mul_add against the host oracle
    (the CPU XLA path; the Pallas kernels are validated on-chip by
    bench.py/tests_tpu via ops/validate.py).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_auction_tpu.curves import SECP256K1 as CURVE, get_curve
from privacy_auction_tpu.ops import ec as EC
from privacy_auction_tpu.ops import field as F

HOST = CURVE.host
GLV = CURVE.glv


def test_derivation_invariants():
    assert pow(GLV.lam, 3, HOST.n) == 1 and GLV.lam != 1
    assert pow(GLV.beta, 3, HOST.p) == 1 and GLV.beta != 1
    # phi(G) = lam * G
    assert HOST.mul(GLV.lam, HOST.g) == (GLV.beta * HOST.gx % HOST.p, HOST.gy)
    for ai, bi in ((GLV.a1, GLV.b1), (GLV.a2, GLV.b2)):
        assert (ai + bi * GLV.lam) % HOST.n == 0
        assert abs(ai) < (1 << 129) and abs(bi) < (1 << 129)
    assert get_curve("p256").glv is None


def test_host_decomposition(rng):
    for _ in range(200):
        k = rng.randrange(HOST.n)
        k1, k2 = GLV.decompose_host(k)
        assert (k1 + k2 * GLV.lam - k) % HOST.n == 0
        assert abs(k1) < (1 << 132) and abs(k2) < (1 << 132)


def test_device_decomposition_edge_scalars(rng):
    ks = [0, 1, 2, HOST.n - 1, HOST.n // 2, HOST.n // 2 + 1, GLV.lam,
          (GLV.lam * GLV.lam) % HOST.n] + [
        rng.randrange(HOST.n) for _ in range(8)
    ]
    k = jnp.asarray(F.ints_to_limbs(ks))
    k1, s1, k2, s2 = jax.jit(lambda k: EC.glv_decompose(CURVE, k))(k)
    for i, ki in enumerate(ks):
        m1 = F.limbs_to_int(np.asarray(k1)[i])
        m2 = F.limbs_to_int(np.asarray(k2)[i])
        sg1 = -1 if bool(np.asarray(s1)[i]) else 1
        sg2 = -1 if bool(np.asarray(s2)[i]) else 1
        assert (sg1 * m1 + sg2 * m2 * GLV.lam - ki) % HOST.n == 0, f"lane {i}"
        assert m1 < (1 << 132) and m2 < (1 << 132), f"lane {i}"


def test_endo_apply_is_lambda_mul(rng):
    pts = [HOST.mul(rng.randrange(1, HOST.n), HOST.g) for _ in range(3)]
    P = jnp.asarray(EC.encode_host_points(pts + [None]))
    got = jax.jit(lambda P: EC.endo_apply(CURVE, P))(P)
    for i, p in enumerate(pts):
        assert EC.decode_host_point(CURVE, got[i]) == HOST.mul(GLV.lam, p), i
    assert EC.decode_host_point(CURVE, got[3]) is None


def test_glv_dual_and_base_sign_quadrants(rng):
    """Scalars chosen so the four (sign1, sign2) combinations all occur
    (random 256-bit scalars hit every quadrant w.h.p. over 8 lanes)."""
    ks = [rng.randrange(HOST.n) for _ in range(8)]
    ts = [rng.randrange(HOST.n) for _ in range(8)]
    pts = [HOST.mul(rng.randrange(1, HOST.n), HOST.g) for _ in range(8)]
    qts = [HOST.mul(rng.randrange(1, HOST.n), HOST.g) for _ in range(8)]
    k = jnp.asarray(F.ints_to_limbs(ks))
    t = jnp.asarray(F.ints_to_limbs(ts))
    P = jnp.asarray(EC.encode_host_points(pts))
    Q = jnp.asarray(EC.encode_host_points(qts))
    got_d = np.asarray(jax.jit(
        lambda P, k, Q, t: EC.dual_mul(CURVE, P, k, Q, t))(P, k, Q, t))
    got_b = np.asarray(jax.jit(
        lambda s, P, t: EC.base_mul_add(CURVE, s, P, t))(k, P, t))
    for i in range(8):
        want_d = HOST.add(HOST.mul(ks[i], pts[i]), HOST.mul(ts[i], qts[i]))
        want_b = HOST.add(HOST.mul(ks[i], HOST.g), HOST.mul(ts[i], pts[i]))
        assert EC.decode_host_point(CURVE, got_d[i]) == want_d, f"dual {i}"
        assert EC.decode_host_point(CURVE, got_b[i]) == want_b, f"base {i}"
