"""Shared (n, c) parameter source for the randomized e2e sweeps.

A seeded default set always runs (small shapes, compile-cache-friendly,
few distinct n -- the auction phases recompile per n).  Set PA_TPU_SWEEP=1
for the full reference-parity sweep: params.txt lines written by
tools/gen_tests.py (README suggests --tests=100 --bidders_max=20
--bitslen_max=32, `/root/reference/README.md:50`), or 25 seeded random
pairs at those bounds when no params.txt exists.
"""

import os
import pathlib
import random

FULL = os.environ.get("PA_TPU_SWEEP") == "1"


def sweep_params():
    if not FULL:
        # seeded small default sweep: 5 random pairs with n <= 5, c <= 4
        # plus one deeper fixed (8, 8) case (junction-free and long-chain
        # Stage2 coverage).  Kept bounded because the 256-bit EC kernels
        # compile and execute slowly on the CPU CI host -- PA_TPU_SWEEP=1
        # is the full reference-parity sweep (tools/run_sweep.py on TPU).
        rng = random.Random(0x5EA1)
        pairs = []
        while len(pairs) < 5:
            p = (rng.randint(1, 5), rng.randint(1, 4))
            if p not in pairs:
                pairs.append(p)
        return pairs + [(8, 8)]
    path = pathlib.Path(__file__).resolve().parent.parent / "params.txt"
    if path.exists():
        return [tuple(map(int, line.split()))
                for line in path.read_text().split("\n") if line.strip()]
    rng = random.Random(0xF011)
    return [(rng.randint(1, 20), rng.randint(1, 32)) for _ in range(25)]
