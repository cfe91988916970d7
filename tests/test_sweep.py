"""Randomized e2e sweep: the ctest-glue equivalent.

Mirrors the reference's test modality (`SEAL/tests/CMakeLists.txt:3-10`):
each line of params.txt (written by tools/gen_tests.py) becomes one
end-to-end auction whose pass criterion is max-bid agreement (+ NIZK
acceptance for SEAL).

Gated behind PA_TPU_SWEEP=1 because arbitrary (n, c) pairs each trigger a
fresh XLA compile; the default CI run covers fixed small shapes in
test_seal.py / test_ccs22.py.
"""

import os
import pathlib

import jax
import numpy as np
import pytest

from privacy_auction_tpu.curves import SECP256K1 as CURVE

pytestmark = pytest.mark.skipif(
    os.environ.get("PA_TPU_SWEEP") != "1",
    reason="set PA_TPU_SWEEP=1 (and generate params.txt) to run the sweep",
)


def _params():
    path = pathlib.Path(__file__).resolve().parent.parent / "params.txt"
    if not path.exists():
        return [(3, 4), (5, 3), (1, 8)]
    return [tuple(map(int, line.split())) for line in path.read_text().split("\n")
            if line.strip()]


@pytest.mark.parametrize("n,c", _params())
def test_seal_sweep(n, c):
    from privacy_auction_tpu.protocols import seal

    rng = np.random.default_rng(n * 1000 + c)
    bids = [int(b) for b in rng.integers(0, 1 << c, n)]
    res = seal.run_auction(CURVE, jax.random.key(n * 77 + c), bids, c,
                           verify=True)
    assert res.max_bid == max(bids)
    assert res.verified


@pytest.mark.parametrize("n,c", _params())
def test_ccs22_sweep(n, c):
    from privacy_auction_tpu.protocols import ccs22

    rng = np.random.default_rng(n * 2000 + c)
    bids = [int(b) for b in rng.integers(0, 1 << c, n)]
    eval_id = int(rng.integers(0, n))
    res = ccs22.run_auction(CURVE, jax.random.key(n * 99 + c), bids, c,
                            eval_id)
    assert res.max_bid == max(bids)
