"""End-to-end CCS22 protocol tests.

Mirrors the reference's randomized e2e sweep (`CCS22/tests/genTests.py` +
`CCS22/main.cpp:173-194`: every party's maxBid must equal the plaintext
max), plus OT unit tests the reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_auction_tpu.curves import SECP256K1 as CURVE
from privacy_auction_tpu.ops import ec as EC
from privacy_auction_tpu.ops import field as F
from privacy_auction_tpu.protocols import ccs22


def test_crs_hash_to_curve():
    """g1/h: deterministic, on-curve, distinct from g and each other, with
    no dlog construction anywhere in the code (hash-to-curve)."""
    host = CURVE.host
    g1 = host.hash_to_curve(b"ccs22-crs-g1")
    h = host.hash_to_curve(b"ccs22-crs-h")
    assert g1 == host.hash_to_curve(b"ccs22-crs-g1")  # deterministic
    assert host.is_on_curve(g1) and host.is_on_curve(h)
    assert len({g1, h, host.g}) == 3
    pp = ccs22.make_pub_params(CURVE)
    assert EC.decode_host_point(CURVE, np.asarray(pp.g1)) == g1
    assert EC.decode_host_point(CURVE, np.asarray(pp.h)) == h
    # comb tables agree with the points
    assert EC.decode_host_point(CURVE, pp.g1_table[0][1]) == g1
    assert EC.decode_host_point(CURVE, pp.h_table[0][1]) == h


def test_ot_roundtrip(rng):
    """The 2-message OT transfers M0 when alpha=0 and hides it otherwise."""
    n = 3
    pp = ccs22.pp_or_make(CURVE)
    key = jax.random.key(5)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    beta = F.random(CURVE.fn, k1, (n,))
    msg_scalars = F.random(CURVE.fn, k2, (n,))
    M0 = EC.mul_base(CURVE, msg_scalars)
    s = F.random(CURVE.fn, k3, (n,))
    t = F.random(CURVE.fn, k4, (n,))

    for alpha in (0, 1):
        r1 = ccs22.ot_receive1(
            CURVE, jax.random.key(6 + alpha), pp, beta,
            jnp.uint32(alpha),
        )
        ots = ccs22.ot_send(CURVE, jax.random.key(8), pp, r1, M0, s, t)
        # receiver decrypt of slot 0: C0 - beta*z
        rec = EC.add(
            CURVE, ots.C0,
            EC.neg(CURVE, EC.scalar_mul(CURVE, ots.z, beta)),
        )
        match = np.asarray(EC.eq(CURVE, rec, M0))
        if alpha == 0:
            assert match.all()
        else:
            assert not match.any()


@pytest.mark.parametrize("eval_id", [0, 2])
def test_auction(rng, eval_id):
    n, c = 4, 3
    bids = [rng.randrange(1 << c) for _ in range(n)]
    res = ccs22.run_auction(CURVE, jax.random.key(9), bids, c, eval_id)
    assert res.max_bid == max(bids)


def test_auction_edge_bids():
    # all zero (evaluator never announces), ties, evaluator holds the max
    for bids in ([0, 0, 0], [5, 5, 5], [7, 1, 2]):
        res = ccs22.run_auction(CURVE, jax.random.key(10), bids, 3, 0)
        assert res.max_bid == max(bids)
