"""NIST P-256 (a != 0, Barrett-reduced fields): differential tests.

Closes VERDICT r2 weak #10: the curve registry is genuinely
parameterizable.  P-256 exercises the code paths secp256k1 never touches:
Barrett reduction (both P-256 fields are too far from 2**256 for fold
reduction) and the generic-a RCB16 Algorithm 1/3 complete formulas.

The reference hardcodes secp256k1 (`/root/reference/SEAL/params.h:4`);
OpenSSL's EC layer is curve-generic, and so is this build.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_auction_tpu.curves import get_curve
from privacy_auction_tpu.ops import ec as EC
from privacy_auction_tpu.ops import field as F

CURVE = get_curve("p256")
HOST = CURVE.host


@pytest.fixture
def prng():
    return random.Random(0x9256)


def test_p256_spec_is_barrett():
    assert CURVE.fp.mu_limbs is not None
    assert CURVE.fn.mu_limbs is not None
    assert not CURVE.a_is_zero


@pytest.mark.parametrize("field", ["fp", "fn"])
def test_p256_field_mul_add_sub_inv(field, prng):
    spec = getattr(CURVE, field)
    m = spec.modulus
    xs = [prng.randrange(m) for _ in range(6)] + [0, 1, m - 1, m - 2]
    ys = [prng.randrange(m) for _ in range(6)] + [m - 1, 0, m - 1, 2]
    a = jnp.asarray(F.ints_to_limbs(xs))
    b = jnp.asarray(F.ints_to_limbs(ys))
    got_mul = np.asarray(jax.jit(lambda a, b: F.mul(spec, a, b))(a, b))
    got_add = np.asarray(jax.jit(lambda a, b: F.add(spec, a, b))(a, b))
    got_sub = np.asarray(jax.jit(lambda a, b: F.sub(spec, a, b))(a, b))
    got_inv = np.asarray(jax.jit(lambda a: F.inv(spec, a))(a))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert F.limbs_to_int(got_mul[i]) == x * y % m, f"mul lane {i}"
        assert F.limbs_to_int(got_add[i]) == (x + y) % m, f"add lane {i}"
        assert F.limbs_to_int(got_sub[i]) == (x - y) % m, f"sub lane {i}"
        want_inv = pow(x, m - 2, m) if x else 0
        assert F.limbs_to_int(got_inv[i]) == want_inv, f"inv lane {i}"


def test_p256_reduce_wide_512bit(prng):
    spec = CURVE.fp
    vals = [prng.randrange(1 << 512) for _ in range(4)] + [
        0, (1 << 512) - 1, spec.modulus, spec.modulus - 1
    ]
    v = jnp.asarray(np.stack([F.int_to_limbs(x, 32) for x in vals]))
    got = np.asarray(jax.jit(lambda v: F.reduce_wide(spec, v))(v))
    for i, x in enumerate(vals):
        assert F.limbs_to_int(got[i]) == x % spec.modulus, f"lane {i}"


def test_p256_add_dbl_matches_host(prng):
    pts = [HOST.mul(prng.randrange(1, HOST.n), HOST.g) for _ in range(3)]
    cases_P = [pts[0], pts[1], pts[0], None, pts[2], pts[2]]
    cases_Q = [pts[1], pts[0], pts[0], pts[1], None, HOST.neg(pts[2])]
    P = jnp.asarray(EC.encode_host_points(cases_P))
    Q = jnp.asarray(EC.encode_host_points(cases_Q))
    got_add = jax.jit(lambda P, Q: EC.add(CURVE, P, Q))(P, Q)
    got_dbl = jax.jit(lambda P: EC.dbl(CURVE, P))(P)
    for i, (p, q) in enumerate(zip(cases_P, cases_Q)):
        assert EC.decode_host_point(CURVE, got_add[i]) == HOST.add(p, q), i
        assert EC.decode_host_point(CURVE, got_dbl[i]) == HOST.add(p, p), i


def test_p256_on_curve():
    pts = [HOST.g, HOST.mul(12345, HOST.g), None]
    P = jnp.asarray(EC.encode_host_points(pts))
    ok = np.asarray(jax.jit(lambda P: EC.on_curve(CURVE, P))(P))
    assert ok.all()
    # perturbed x coordinate must fail
    bad = P.at[0, 0, 0].add(1)
    assert not bool(jax.jit(lambda P: EC.on_curve(CURVE, P))(bad)[0])


def test_p256_scalar_mul_and_comb(prng):
    ks = [0, 1, HOST.n - 1, prng.randrange(HOST.n)]
    base = HOST.mul(7, HOST.g)
    k = jnp.asarray(F.ints_to_limbs(ks))
    P = jnp.asarray(EC.encode_host_points([base] * len(ks)))
    got_var = jax.jit(lambda P, k: EC.scalar_mul(CURVE, P, k))(P, k)
    got_fix = jax.jit(lambda k: EC.mul_base(CURVE, k))(k)
    for i, ki in enumerate(ks):
        assert EC.decode_host_point(CURVE, got_var[i]) == HOST.mul(ki, base), i
        assert EC.decode_host_point(CURVE, got_fix[i]) == HOST.mul(ki, HOST.g), i


def test_p256_seal_auction_end_to_end():
    """Full SEAL auction with NIZK verification on P-256."""
    from privacy_auction_tpu.protocols import seal

    bids = [5, 3, 6, 2]
    res = seal.run_auction(CURVE, jax.random.key(7), bids, 3, verify=True)
    assert res.verified and res.max_bid == 6


def test_p256_ccs22_auction_end_to_end():
    from privacy_auction_tpu.protocols import ccs22

    bids = [4, 9, 1]
    res = ccs22.run_auction(CURVE, jax.random.key(8), bids, 4, eval_id=2)
    assert res.max_bid == 9
