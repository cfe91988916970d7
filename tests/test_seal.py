"""End-to-end SEAL protocol tests.

Mirrors the reference's randomized e2e sweep (`SEAL/tests/genTests.py` +
`SEAL/main.cpp:154-162`: every party's maxBid must equal the plaintext max
and every NIZK must verify), on small (n, c) to bound compile time.
"""

import jax
import numpy as np
import pytest

from privacy_auction_tpu.curves import SECP256K1 as CURVE
from privacy_auction_tpu.protocols import seal


def test_bids_to_bits():
    bits = seal.bids_to_bits([5, 2], 4)
    assert bits.tolist() == [[0, 1, 0, 1], [0, 0, 1, 0]]


def test_auction_no_verify(rng):
    # minimum end-to-end slice (SURVEY.md section 7): AV-net only
    n, c = 4, 3
    bids = [rng.randrange(1 << c) for _ in range(n)]
    res = seal.run_auction(CURVE, jax.random.key(1), bids, c, verify=False)
    assert res.max_bid == max(bids)


def test_auction_with_verification(rng):
    n, c = 3, 3
    bids = [rng.randrange(1 << c) for _ in range(n)]
    res = seal.run_auction(CURVE, jax.random.key(2), bids, c, verify=True)
    assert res.max_bid == max(bids)
    assert res.verified


@pytest.mark.parametrize("bids", [[0, 0, 0], [7, 7, 7], [1, 2, 4]])
def test_auction_edge_bids(bids):
    # all-zero bids (no deciding step), ties, distinct powers of two
    res = seal.run_auction(CURVE, jax.random.key(3), bids, 3, verify=False)
    assert res.max_bid == max(bids)


def test_auction_single_bidder():
    res = seal.run_auction(CURVE, jax.random.key(4), [5], 3, verify=False)
    assert res.max_bid == 5
