"""Interpret-mode coverage for the fused variable-base Pallas ladders.

The comb kernels are covered by tests/test_pallas_ec.py; the fused
ladders (_scalar_mul_kernel / _dual_mul_kernel / _base_mul_add_kernel)
previously ran only on real TPU (tests_tpu/, bench.py validation pass).
This file gives the newest and hottest of them -- base_mul_add, the
verification workhorse -- always-on CPU CI coverage in Pallas interpreter
mode (~1 min under jit; its own file so pytest-xdist runs it in parallel
with the rest of the suite), and gates the full interpreted validation of
every ladder behind PA_TPU_SLOW=1.

Parity target: OpenSSL EC_POINT_mul two-term form
(`/root/reference/SEAL/bidder.cpp:128-130`).
"""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_auction_tpu.curves import SECP256K1 as CURVE
from privacy_auction_tpu.ops import ec as EC
from privacy_auction_tpu.ops import field as F
from privacy_auction_tpu.ops import pallas_ec as PE

HOST = CURVE.host


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    if jax.devices()[0].platform not in ("tpu", "axon"):
        monkeypatch.setattr(PE, "_INTERPRET", True)


def test_base_mul_add_interpreted_matches_host():
    rng = random.Random(11)
    ks = [rng.randrange(HOST.n), 0]
    ts = [rng.randrange(HOST.n), rng.randrange(HOST.n)]
    P_host = [HOST.mul(rng.randrange(1, HOST.n), HOST.g) for _ in range(2)]
    k = jnp.asarray(F.ints_to_limbs(ks))
    t = jnp.asarray(F.ints_to_limbs(ts))
    P = jnp.asarray(EC.encode_host_points(P_host))
    got = np.asarray(
        jax.jit(lambda k, P, t: PE.base_mul_add(CURVE, k, P, t))(k, P, t)
    )
    want = [
        HOST.add(HOST.mul(ki, HOST.g), HOST.mul(ti, Pi))
        for ki, ti, Pi in zip(ks, ts, P_host)
    ]
    assert [EC.decode_host_point(CURVE, p) for p in got] == want


@pytest.mark.skipif(
    not os.environ.get("PA_TPU_SLOW"),
    reason="full interpreted ladder validation (~4 min); set PA_TPU_SLOW=1",
)
def test_all_ladders_interpreted_match_host():
    from privacy_auction_tpu.ops.validate import validate_pallas_kernels

    validate_pallas_kernels(CURVE, lanes=4, seed=3)
