"""Differential tests of the batched EC kernels against the host oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_auction_tpu.curves import SECP256K1 as CURVE
from privacy_auction_tpu.ops import ec as EC
from privacy_auction_tpu.ops import field as F

HOST = CURVE.host

jadd = jax.jit(EC.add, static_argnums=0)
jdbl = jax.jit(EC.dbl, static_argnums=0)
jneg = jax.jit(EC.neg, static_argnums=0)
jsmul = jax.jit(EC.scalar_mul, static_argnums=0)
jmul_base = jax.jit(EC.mul_base, static_argnums=0)
jsum = jax.jit(EC.ec_sum, static_argnums=(0, 2))
jscan = jax.jit(EC.ec_prefix_scan, static_argnums=(0, 2))
joncurve = jax.jit(EC.on_curve, static_argnums=0)
jeq = jax.jit(EC.eq, static_argnums=0)
jser = jax.jit(EC.serialize_uncompressed, static_argnums=0)


def host_points(rng, count):
    """Random host points k*G with known scalars."""
    ks = [rng.randrange(1, HOST.n) for _ in range(count)]
    return ks, [HOST.mul(k, HOST.g) for k in ks]


def check_points(dev_pts, host_pts):
    arr = np.asarray(dev_pts)
    for i, hp in enumerate(host_pts):
        got = EC.decode_host_point(CURVE, arr[i])
        assert got == hp, f"lane {i}: got {got} want {hp}"


def test_add_dbl_neg(rng):
    ks, ps = host_points(rng, 6)
    _, qs = host_points(rng, 6)
    P = jnp.asarray(EC.encode_host_points(ps))
    Q = jnp.asarray(EC.encode_host_points(qs))
    check_points(jadd(CURVE, P, Q), [HOST.add(p, q) for p, q in zip(ps, qs)])
    check_points(jdbl(CURVE, P), [HOST.add(p, p) for p in ps])
    check_points(jneg(CURVE, P), [HOST.neg(p) for p in ps])
    # complete formula edge cases: P+P, P+(-P), inf+P, inf+inf
    NP = jneg(CURVE, P)
    check_points(jadd(CURVE, P, P), [HOST.add(p, p) for p in ps])
    s = jadd(CURVE, P, NP)
    assert bool(EC.is_infinity(s).all())
    I = EC.infinity((6,))
    check_points(jadd(CURVE, I, P), ps)
    assert bool(EC.is_infinity(jadd(CURVE, I, I)).all())
    assert bool(EC.is_infinity(jdbl(CURVE, I)).all())


def test_on_curve(rng):
    _, ps = host_points(rng, 4)
    P = jnp.asarray(EC.encode_host_points(ps))
    assert bool(joncurve(CURVE, P).all())
    bad = P.at[..., 0, 0].add(1)
    assert not bool(joncurve(CURVE, bad).any())


def test_eq(rng):
    _, ps = host_points(rng, 4)
    P = jnp.asarray(EC.encode_host_points(ps))
    # same points with different projective scale
    two = F.const(2, (4,))
    P2 = jnp.stack(
        [F.mul(CURVE.fp, P[:, i, :], two) for i in range(3)], axis=1
    )
    assert bool(jeq(CURVE, P, P2).all())
    assert not bool(jeq(CURVE, P, jdbl(CURVE, P)).any())
    I = EC.infinity((4,))
    assert bool(jeq(CURVE, I, I).all())
    assert not bool(jeq(CURVE, I, P).any())


def test_scalar_mul(rng):
    ks, ps = host_points(rng, 4)
    P = jnp.asarray(EC.encode_host_points(ps))
    ms = [rng.randrange(HOST.n) for _ in range(3)] + [0]
    K = jnp.asarray(F.ints_to_limbs(ms))
    check_points(jsmul(CURVE, P, K), [HOST.mul(m, p) for m, p in zip(ms, ps)])


def test_mul_base(rng):
    ms = [rng.randrange(HOST.n) for _ in range(6)] + [0, 1, HOST.n - 1]
    K = jnp.asarray(F.ints_to_limbs(ms))
    check_points(jmul_base(CURVE, K), [HOST.mul(m, HOST.g) for m in ms])


def test_dual_mul_and_base_mul_add(rng):
    ks, ps = host_points(rng, 3)
    _, qs = host_points(rng, 3)
    P = jnp.asarray(EC.encode_host_points(ps))
    Q = jnp.asarray(EC.encode_host_points(qs))
    ms = [rng.randrange(HOST.n) for _ in range(3)]
    ts = [rng.randrange(HOST.n) for _ in range(2)] + [0]
    M = jnp.asarray(F.ints_to_limbs(ms))
    T = jnp.asarray(F.ints_to_limbs(ts))
    want = [
        HOST.add(HOST.mul(m, p), HOST.mul(t, q))
        for m, p, t, q in zip(ms, ps, ts, qs)
    ]
    got = jax.jit(EC.dual_mul, static_argnums=0)(CURVE, P, M, Q, T)
    check_points(got, want)
    want2 = [
        HOST.add(HOST.mul(m, HOST.g), HOST.mul(t, q))
        for m, t, q in zip(ms, ts, qs)
    ]
    got2 = jax.jit(EC.base_mul_add, static_argnums=0)(CURVE, M, Q, T)
    check_points(got2, want2)


def test_ec_sum_and_scan(rng):
    for count in (1, 2, 5, 8):
        _, ps = host_points(rng, count)
        P = jnp.asarray(EC.encode_host_points(ps))
        total = None
        prefixes = []
        for p in ps:
            total = HOST.add(total, p)
            prefixes.append(total)
        got = EC.decode_host_point(CURVE, np.asarray(jsum(CURVE, P, 0)))
        assert got == total
        check_points(jscan(CURVE, P, 0), prefixes)


def test_sum_to_infinity(rng):
    _, ps = host_points(rng, 3)
    pts = ps + [HOST.neg(p) for p in ps]
    P = jnp.asarray(EC.encode_host_points(pts))
    assert bool(EC.is_infinity(jsum(CURVE, P, 0)))


def test_serialize(rng):
    _, ps = host_points(rng, 3)
    pts = ps + [None]
    P = jnp.asarray(EC.encode_host_points(pts))
    out = np.asarray(jser(CURVE, P))
    for i, p in enumerate(ps):
        want = b"\x04" + p[0].to_bytes(32, "big") + p[1].to_bytes(32, "big")
        assert bytes(out[i]) == want
    assert bytes(out[3]) == b"\x00" * 65


def test_comb_table_consistency():
    # table[w][d] should equal d * 16^w * G
    tab = CURVE.comb_table
    for w in (0, 3, 63):
        for d in (0, 1, 7, 15):
            want = HOST.mul((d << (4 * w)) % HOST.n, HOST.g)
            got = EC.decode_host_point(CURVE, tab[w, d])
            assert got == want
