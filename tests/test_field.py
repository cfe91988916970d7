"""Differential tests of the limb field kernels against Python ints.

The reference has no unit tests (SURVEY.md section 4); these are the seeded
deterministic vectors it lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_auction_tpu.ops import field as F
from privacy_auction_tpu.utils.host_curve import SECP256K1

P = SECP256K1.p
N = SECP256K1.n

SPEC_P = F.make_spec("secp256k1_p", P)
SPEC_N = F.make_spec("secp256k1_n", N)

# jit everything (static spec arg): tests would otherwise run eagerly and
# dispatch thousands of tiny ops per call.
jadd = jax.jit(F.add, static_argnums=0)
jsub = jax.jit(F.sub, static_argnums=0)
jneg = jax.jit(F.neg, static_argnums=0)
jmul = jax.jit(F.mul, static_argnums=0)
jsqr = jax.jit(F.sqr, static_argnums=0)
jmul_small = jax.jit(F.mul_small, static_argnums=(0, 2))
jinv = jax.jit(F.inv, static_argnums=0)
jreduce = jax.jit(F.reduce_wide, static_argnums=0)


def rand_elems(rng, m, count):
    return [rng.randrange(m) for _ in range(count)]


def to_batch(xs):
    return jnp.asarray(F.ints_to_limbs(xs))


def check_batch(actual, expected_ints):
    actual = np.asarray(actual)
    for i, e in enumerate(expected_ints):
        got = F.limbs_to_int(actual[i])
        assert got == e, f"lane {i}: got {got:#x} want {e:#x}"


@pytest.mark.parametrize("spec,m", [(SPEC_P, P), (SPEC_N, N)])
def test_roundtrip(rng, spec, m):
    xs = rand_elems(rng, m, 8) + [0, 1, m - 1]
    a = to_batch(xs)
    check_batch(a, xs)


@pytest.mark.parametrize("spec,m", [(SPEC_P, P), (SPEC_N, N)])
def test_add_sub(rng, spec, m):
    xs = rand_elems(rng, m, 16) + [0, m - 1, m - 1, 1]
    ys = rand_elems(rng, m, 16) + [0, m - 1, 1, m - 1]
    a, b = to_batch(xs), to_batch(ys)
    check_batch(jadd(spec, a, b), [(x + y) % m for x, y in zip(xs, ys)])
    check_batch(jsub(spec, a, b), [(x - y) % m for x, y in zip(xs, ys)])
    check_batch(jneg(spec, a), [(-x) % m for x in xs])


@pytest.mark.parametrize("spec,m", [(SPEC_P, P), (SPEC_N, N)])
def test_mul(rng, spec, m):
    xs = rand_elems(rng, m, 32) + [0, 1, m - 1, m - 1]
    ys = rand_elems(rng, m, 32) + [m - 1, m - 1, m - 1, 1]
    a, b = to_batch(xs), to_batch(ys)
    check_batch(jmul(spec, a, b), [(x * y) % m for x, y in zip(xs, ys)])
    check_batch(jsqr(spec, a), [(x * x) % m for x in xs])


@pytest.mark.parametrize("spec,m", [(SPEC_P, P), (SPEC_N, N)])
def test_mul_small(rng, spec, m):
    xs = rand_elems(rng, m, 8) + [m - 1]
    a = to_batch(xs)
    for c in (0, 1, 3, 21, 0xFFFF):
        check_batch(jmul_small(spec, a, c), [(x * c) % m for x in xs])


@pytest.mark.parametrize("spec,m", [(SPEC_P, P), (SPEC_N, N)])
def test_inv(rng, spec, m):
    xs = rand_elems(rng, m - 1, 8)
    xs = [x + 1 for x in xs] + [1, m - 1]
    a = to_batch(xs)
    check_batch(jinv(spec, a), [pow(x, m - 2, m) for x in xs])
    # inv(0) == 0 convention
    z = to_batch([0])
    assert F.limbs_to_int(np.asarray(jinv(spec, z))[0]) == 0


def test_bytes_roundtrip(rng):
    xs = rand_elems(rng, P, 8) + [0, 1, P - 1]
    a = to_batch(xs)
    b = F.to_bytes_be(a)
    for i, x in enumerate(xs):
        assert bytes(np.asarray(b)[i]) == x.to_bytes(32, "big")
    back = F.from_bytes_be(b)
    check_batch(back, xs)


def test_from_random_bits_uniformish():
    key = jax.random.key(7)
    s = F.random(SPEC_N, key, (64,))
    vals = [F.limbs_to_int(np.asarray(s)[i]) for i in range(64)]
    assert all(0 <= v < N for v in vals)
    assert len(set(vals)) == 64


def test_reduce_wide_512(rng):
    # Feed full 512-bit products through reduce_wide directly.
    for spec, m in ((SPEC_P, P), (SPEC_N, N)):
        xs = [rng.randrange(1 << 512) for _ in range(8)] + [(1 << 512) - 1, 0]
        wide = jnp.asarray(np.stack([F.int_to_limbs(x, 32) for x in xs]))
        check_batch(jreduce(spec, wide), [x % m for x in xs])
