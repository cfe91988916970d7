"""Multi-process SEAL AV-net auction over the native bulletin-board hub.

Each bidder is a REAL OS process: it connects to the C++ board server over
a Unix-domain socket, publishes its per-step AV-net key X = g^x and veto
ciphertext b, fetches every other party's messages (blocking fetch = the
barrier semantics of the reference's phase loops, `SEAL/main.cpp:65-120`),
and accumulates the max bid locally -- the deployment-topology counterpart
of the in-process reference driver, where "communication" is a method call
on a shared object (`/root/reference/SEAL/main.cpp:30,46-120`).

Party-side crypto uses the pure-int host oracle (utils/host_curve.py), so
each process is lightweight; the verification-enabled, batched TPU path is
`protocols/seal.run_auction` -- this demo exercises the runtime hub, not
the kernels.  NIZK generation/verification is omitted, mirroring the
reference's ENABLE_VERIFICATION=off mode (`SEAL/params.h:13`).

Usage: python tools/demo_native_board.py [n] [c]
Exit 0 iff every party's computed max bid equals the plaintext maximum,
with per-category byte meters printed from the hub.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from privacy_auction_tpu.utils.host_curve import SECP256K1 as HOST

PHASE_ROUND1 = 1
PHASE_ROUND2 = 2
PHASE_RESULT = 7


def _ser(P) -> bytes:
    """SEC1 uncompressed; infinity = 65 zero bytes (static shape, matching
    ops/ec.serialize_uncompressed)."""
    if P is None:
        return bytes(65)
    x, y = P
    return b"\x04" + x.to_bytes(32, "big") + y.to_bytes(32, "big")


def _deser(b: bytes):
    if b[0] == 0:
        return None
    return (int.from_bytes(b[1:33], "big"), int.from_bytes(b[33:65], "big"))


def run_party(sock_path: str, pid: int, n: int, c: int, bid: int,
              seed: int, out_q) -> None:
    """One bidder process: the reference's per-party loop body
    (`SEAL/main.cpp:46-120`) against a remote board."""
    from privacy_auction_tpu.runtime.native import BoardClient

    rng = random.Random(seed)
    cl = BoardClient(sock_path)
    bits = [(bid >> (c - 1 - i)) & 1 for i in range(c)]
    in_race = True
    max_bid = 0
    for step in range(c):
        d = bits[step] if in_race else 0
        # round 1: publish X = g^x  (`SEAL/bidder.cpp:1203-1236`)
        x = rng.randrange(1, HOST.n)
        r = rng.randrange(1, HOST.n)
        cl.post(PHASE_ROUND1, step, pid, _ser(HOST.mul(x, HOST.g)))
        Xs = [
            _deser(cl.fetch_wait(PHASE_ROUND1, step, j, timeout_s=120.0))
            for j in range(n)
        ]
        # AV-net key Y_pid = sum_{j<pid} X_j - sum_{j>pid} X_j
        # (`SEAL/bidder.cpp:1286-1299`)
        Y = None
        for j in range(pid):
            Y = HOST.add(Y, Xs[j])
        for j in range(pid + 1, n):
            Y = HOST.add(Y, HOST.neg(Xs[j]))
        # round 2: b = x*Y (d=0) | r*R-style veto (d=1)
        # (`SEAL/bidder.cpp:1301-1309`)
        b = HOST.mul(x, Y) if d == 0 else HOST.mul(r, HOST.g)
        cl.post(PHASE_ROUND2, step, pid, _ser(b))
        total = None
        for j in range(n):
            total = HOST.add(
                total,
                _deser(cl.fetch_wait(PHASE_ROUND2, step, j, timeout_s=120.0)),
            )
        # round 3: deciding step iff the veto sum is not infinity
        # (`SEAL/bidder.cpp:1386-1411`)
        deciding = total is not None
        if deciding:
            max_bid = (max_bid << 1) | 1
            if d == 0:
                in_race = False
        else:
            max_bid <<= 1
    cl.post(PHASE_RESULT, 0, pid, max_bid.to_bytes(8, "big"), "result")
    cl.close()
    if out_q is not None:
        out_q.put((pid, max_bid))


def main(n: int = 4, c: int = 4, seed: int = 0) -> int:
    from privacy_auction_tpu.runtime.native import BoardClient, NativeBoard

    rng = random.Random(seed)
    bids = [rng.randrange(1 << c) for _ in range(n)]
    sock = os.path.join(tempfile.mkdtemp(prefix="pa_board_"), "board.sock")

    board = NativeBoard(n)
    server = board.serve(sock)
    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(
            target=run_party, args=(sock, i, n, c, bids[i], seed + 1 + i, None)
        )
        for i in range(n)
    ]
    for p in procs:
        p.start()

    cl = BoardClient(sock)
    results = [
        int.from_bytes(cl.fetch_wait(PHASE_RESULT, 0, i, "result", 120.0),
                       "big")
        for i in range(n)
    ]
    for p in procs:
        p.join(timeout=30)
    ok = all(r == max(bids) for r in results)
    print(f"[demo] n={n} c={c} bids={bids} -> agreed maxBid="
          f"{results[0] if ok else results}")
    print(f"[demo] hub meters: bidder={board.bytes('bidder')} B, "
          f"result={board.bytes('result')} B, total={board.total_bytes()} B")
    cl.close()
    server.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sys.exit(main(n, c))
