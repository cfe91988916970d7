"""Randomized e2e sweep: the ctest-glue equivalent.

Mirrors the reference's test modality (`SEAL/tests/CMakeLists.txt:3-10`):
random (n, c) pairs, each becoming one end-to-end auction whose pass
criterion is max-bid agreement (+ NIZK acceptance for SEAL).

A seeded default set always runs (small shapes, compile-cache-friendly).
Set PA_TPU_SWEEP=1 for the full reference-parity sweep: params.txt lines
written by tools/gen_tests.py (README suggests --tests=100 --bidders_max=20
--bitslen_max=32, `/root/reference/README.md:50`), or 25 random pairs at
those bounds when no params.txt exists.
"""

import jax
import numpy as np
import pytest

from privacy_auction_tpu.curves import SECP256K1 as CURVE
from sweep_params import sweep_params


@pytest.mark.parametrize("n,c", sweep_params())
def test_seal_sweep(n, c):
    from privacy_auction_tpu.protocols import seal

    rng = np.random.default_rng(n * 1000 + c)
    bids = [int(b) for b in rng.integers(0, 1 << c, n)]
    res = seal.run_auction(CURVE, jax.random.key(n * 77 + c), bids, c,
                           verify=True)
    assert res.max_bid == max(bids)
    assert res.verified
