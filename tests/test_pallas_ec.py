"""Pallas EC kernel tests.

On CPU these run the kernels in Pallas interpreter mode (bit-exact with the
compiled path) and differentially against the host oracle and the pure-XLA
ec path.  Only the comb kernels run interpreted -- the variable-base
ladders (~330 point ops) are impractically slow in the interpreter; they
are exercised on real TPU by the benchmark harness and by the SEAL/CCS22
e2e runs when a TPU is present.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_auction_tpu.curves import SECP256K1 as CURVE, make_comb_table
from privacy_auction_tpu.ops import ec as EC
from privacy_auction_tpu.ops import field as F
from privacy_auction_tpu.ops import pallas_ec as PE

HOST = CURVE.host


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    if jax.devices()[0].platform not in ("tpu", "axon"):
        monkeypatch.setattr(PE, "_INTERPRET", True)


def _host_mul(k, P):
    R = None
    while k:
        if k & 1:
            R = HOST.add(R, P)
        P = HOST.add(P, P)
        k >>= 1
    return R


def test_pallas_mul_base_matches_host_and_xla(rng):
    n = 5
    ints = [rng.randrange(1, HOST.n) for _ in range(n)] + [0]
    k = jnp.asarray(F.ints_to_limbs(ints))
    got = np.asarray(jax.jit(lambda k: PE.mul_base(CURVE, k))(k))
    ref = np.asarray(jax.jit(lambda k: EC.mul_comb(
        CURVE, jnp.asarray(CURVE.comb_table), k))(k))
    for i, ki in enumerate(ints):
        want = _host_mul(ki, HOST.g)
        assert EC.decode_host_point(CURVE, got[i]) == want, i
        assert EC.decode_host_point(CURVE, ref[i]) == want, i


def test_pallas_mul_comb_other_base(rng):
    base = _host_mul(rng.randrange(2, HOST.n), HOST.g)
    table = make_comb_table(HOST, base)
    ints = [rng.randrange(1, HOST.n) for _ in range(3)]
    k = jnp.asarray(F.ints_to_limbs(ints))
    got = np.asarray(
        jax.jit(lambda k: PE.mul_comb(CURVE, jnp.asarray(table), k))(k)
    )
    for i, ki in enumerate(ints):
        assert EC.decode_host_point(CURVE, got[i]) == _host_mul(ki, base), i


def test_pallas_batch_padding(rng):
    # non-multiple-of-block batch exercises the lane padding path
    n = 3
    ints = [rng.randrange(1, HOST.n) for _ in range(n)]
    k = jnp.asarray(F.ints_to_limbs(ints)).reshape(1, n, F.LIMBS)
    got = np.asarray(jax.jit(lambda k: PE.mul_base(CURVE, k))(k))
    assert got.shape == (1, n, 3, F.LIMBS)
    for i, ki in enumerate(ints):
        assert EC.decode_host_point(CURVE, got[0, i]) == _host_mul(ki, HOST.g)
