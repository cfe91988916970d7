"""Randomized CCS22 e2e sweep (separate file so xdist --dist loadfile
runs it in parallel with the SEAL sweep).  See sweep_params."""

import jax
import numpy as np
import pytest

from privacy_auction_tpu.curves import SECP256K1 as CURVE
from sweep_params import sweep_params


@pytest.mark.parametrize("n,c", sweep_params())
def test_ccs22_sweep(n, c):
    from privacy_auction_tpu.protocols import ccs22

    rng = np.random.default_rng(n * 2000 + c)
    bids = [int(b) for b in rng.integers(0, 1 << c, n)]
    eval_id = int(rng.integers(0, n))
    res = ccs22.run_auction(CURVE, jax.random.key(n * 99 + c), bids, c,
                            eval_id)
    assert res.max_bid == max(bids)
