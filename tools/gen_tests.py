"""Randomized (n, c) test-parameter generator.

Equivalent of the reference's `SEAL/tests/genTests.py` / `CCS22/tests/genTests.py`
(byte-identical 17-line argparse scripts): writes `params.txt` with one
`<n> <c>` pair per line, n in [1, bidders_max], c in [1, bitslen_max].
Consumed by `tests/test_sweep.py` (the ctest-glue equivalent,
`SEAL/tests/CMakeLists.txt:3-10`).
"""

import argparse
import random


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tests", type=int, default=10)
    ap.add_argument("--bidders_max", type=int, default=20)
    ap.add_argument("--bitslen_max", type=int, default=32)
    ap.add_argument("--out", default="params.txt")
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args()

    rng = random.Random(args.seed)
    with open(args.out, "w") as f:
        for _ in range(args.tests):
            n = rng.randint(1, args.bidders_max)
            c = rng.randint(1, args.bitslen_max)
            f.write(f"{n} {c}\n")
    print(f"wrote {args.tests} (n, c) pairs to {args.out}")


if __name__ == "__main__":
    main()
