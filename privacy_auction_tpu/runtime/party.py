"""Multi-process VERIFIED SEAL auction over the native socket hub.

Deployment-topology driver: every bidder is a real OS process running the
actual batched TPU-path kernels for its own lane -- commit, per-step key
generation, round-2 ciphertext + Stage1/Stage2 NIZK generation -- and the
full batched verifier over everyone's published proofs, with messages
exchanged through the C++ BoardServer (`native/pa_runtime.cc`) in the
reference's canonical wire format (65 B/point, 32 B/scalar --
`/root/reference/SEAL/bulletinBoard.cpp:275-288`).  The hub's byte meters
therefore measure a real verified auction's traffic, not a simulation.

Mirrors the reference round-trip structure (`SEAL/main.cpp:46-120`):
post commit -> fetch all + verify -> per step: post round1 -> fetch all +
verify -> post round2 -> fetch all + verify -> veto sum + junction.
Blocking fetches are the phase barriers.

Party processes force the CPU backend (a single shared accelerator cannot
be held by n independent processes; in a real deployment each party owns
its own chip and this driver is unchanged).  Metering categories follow
the analytic model (utils/trackers.py): uploads -> "bidder", per-party
proof downloads -> "verifier" (n parties x n messages = the reference's
n^2 verifier fan-out).  The real meter differs from the analytic model by
exactly the model's 2*n^2*c point-projection line (the reference
re-downloads X / b projections for rounds 2/3,
`SEAL/bulletinBoard.cpp:135-161`; the wire messages already carry them).

Usage (demo): python -m privacy_auction_tpu.runtime.party [n] [c]
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import tempfile

PHASE_COMMIT = 0
PHASE_ROUND1 = 1
PHASE_ROUND2 = 2
PHASE_RESULT = 7

_FAST_FLAGS = (
    " --xla_backend_optimization_level=0"
    " --xla_llvm_disable_expensive_passes=true"
)


def _init_jax_cpu():
    """Force the CPU backend + fast compile flags + shared compile cache
    (must run before any jax backend use in this process)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_backend_optimization_level" not in flags:
        os.environ["XLA_FLAGS"] = (flags + _FAST_FLAGS).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            boot = f.read().strip()
    except OSError:
        boot = "noboot"
    if not os.environ.get("PA_TPU_NO_COMPILE_CACHE"):
        jax.config.update(
            "jax_compilation_cache_dir", f"/tmp/pa_tpu_jax_cache_{boot}_party"
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax


def _tree_concat(msgs):
    import jax
    import numpy as np

    return jax.tree.map(lambda *ls: np.concatenate(ls, axis=0), *msgs)


def run_party(sock_path: str, pid: int, n: int, c: int, bid: int,
              seed: int, timeout_s: float = 600.0) -> None:
    """One bidder process: generate with its own lane, verify everyone."""
    jax = _init_jax_cpu()
    import jax.numpy as jnp
    import numpy as np

    from ..curves import SECP256K1 as CURVE
    from ..protocols import seal
    from . import wire
    from .native import BoardClient

    cl = BoardClient(sock_path, connect_timeout_s=timeout_s)
    key = jax.random.key(seed * 1_000_003 + pid)
    keys = jax.random.split(key, 2 * c + 1)
    bits1 = jnp.asarray(seal.bids_to_bits([bid], c))       # (1, c)
    ids1 = jnp.asarray([pid], jnp.uint32)
    ids_all = jnp.arange(n, dtype=jnp.uint32)

    def fetch_all(phase, rnd, template):
        msgs = [
            wire.unpack(
                CURVE, template,
                cl.fetch_wait(phase, rnd, j, "verifier", timeout_s),
            )
            for j in range(n)
        ]
        return _tree_concat(msgs)

    ok = True
    # ---- commit phase (`SEAL/main.cpp:46-59`) ----
    cpub, csec = seal._jit_commit(CURVE, keys[0], bits1, ids1)
    cl.post(PHASE_COMMIT, 0, pid, wire.pack(CURVE, cpub), "bidder")
    board_commit = fetch_all(PHASE_COMMIT, 0, cpub)
    ok &= bool(np.asarray(
        seal._jit_verify_commit(CURVE, board_commit, ids_all)
    ).all())

    # ---- auction steps (`SEAL/main.cpp:65-120`) ----
    in_race = 1
    junction = False
    prev_pub = None       # n-lane public snapshot of the deciding step
    prev_own = None       # own-lane secret snapshot (x, d)
    max_bid = 0
    for step in range(c):
        pub1, sec1 = seal._jit_round_one(CURVE, keys[2 * step + 1], 1, ids1,
                                         step)
        cl.post(PHASE_ROUND1, step, pid, wire.pack(CURVE, pub1), "bidder")
        board_r1 = fetch_all(PHASE_ROUND1, step, pub1)
        ok &= bool(np.asarray(
            seal._jit_verify_round_one(CURVE, board_r1, ids_all, step)
        ).all())

        Y_all = seal._jit_avnet(CURVE, jnp.asarray(board_r1.X))
        Y_own = Y_all[pid:pid + 1]
        d_own = jnp.asarray(
            [int(bits1[0, step]) & in_race], jnp.uint32
        )
        own_r1 = seal.RoundOnePub(
            X=jnp.asarray(board_r1.X[pid:pid + 1]),
            R=jnp.asarray(board_r1.R[pid:pid + 1]),
            pok_x=None, pok_r=None,
        )
        if not junction:
            pub2, _info = seal._jit_round_two_s1(
                CURVE, keys[2 * step + 2], sec1, own_r1, Y_own, cpub, csec,
                bits1[:, step], d_own, ids1, step,
            )
        else:
            prev_1 = seal.StepInfo(
                X=jnp.asarray(prev_pub.X[pid:pid + 1]),
                R=jnp.asarray(prev_pub.R[pid:pid + 1]),
                Y=jnp.asarray(prev_pub.Y[pid:pid + 1]),
                b=jnp.asarray(prev_pub.b[pid:pid + 1]),
                x=prev_own[0], d=prev_own[1],
            )
            pub2, _info = seal._jit_round_two_s2(
                CURVE, keys[2 * step + 2], sec1, own_r1, Y_own, cpub, csec,
                d_own, prev_1, ids1, step,
            )
        cl.post(PHASE_ROUND2, step, pid, wire.pack(CURVE, pub2), "bidder")
        board_r2 = fetch_all(PHASE_ROUND2, step, pub2)
        if not junction:
            ok &= bool(np.asarray(seal._jit_verify_round_two_s1(
                CURVE, board_r2, board_r1, Y_all, board_commit, ids_all, step,
            )).all())
        else:
            ok &= bool(np.asarray(seal._jit_verify_round_two_s2(
                CURVE, board_r2, board_r1, Y_all, board_commit, prev_pub,
                ids_all, step,
            )).all())

        deciding = bool(np.asarray(
            seal._jit_round_three(CURVE, jnp.asarray(board_r2.b))
        ))
        max_bid = (max_bid << 1) | int(deciding)
        if deciding:
            in_race &= int(np.asarray(d_own)[0])
            junction = True
            prev_pub = seal.StepInfo(
                X=board_r1.X, R=board_r1.R, Y=np.asarray(Y_all),
                b=board_r2.b,
                x=np.zeros((n, wire.LIMBS), np.uint32),
                d=np.zeros((n,), np.uint32),
            )
            prev_own = (sec1.x, d_own)

    payload = max_bid.to_bytes(8, "big") + bytes([ok])
    cl.post(PHASE_RESULT, 0, pid, payload, "result")
    cl.close()


def warm_cache(n: int, c: int):
    """Pre-compile every program the parties will need (own-lane gen at
    batch 1, board verify at batch n) so the n spawned processes hit the
    shared persistent compile cache instead of compiling concurrently."""
    jax = _init_jax_cpu()
    import jax.numpy as jnp

    from ..curves import SECP256K1 as CURVE
    from ..protocols import seal

    key = jax.random.key(0)
    keys = jax.random.split(key, 4)
    bits1 = jnp.asarray(seal.bids_to_bits([0], c))
    ids1 = jnp.zeros((1,), jnp.uint32)
    ids_all = jnp.arange(n, dtype=jnp.uint32)
    # gen programs (batch 1); the prover-side RoundOnePub carries no
    # proofs (pok_x/pok_r None), matching run_party's own_r1 treedef
    cpub1, csec1 = seal._jit_commit(CURVE, keys[0], bits1, ids1)
    pub1, sec1 = seal._jit_round_one(CURVE, keys[1], 1, ids1, 0)
    own_r1 = seal.RoundOnePub(X=pub1.X, R=pub1.R, pok_x=None, pok_r=None)
    Y1 = pub1.X
    p2s1, info1 = seal._jit_round_two_s1(
        CURVE, keys[2], sec1, own_r1, Y1, cpub1, csec1,
        bits1[:, 0], bits1[:, 0], ids1, 0,
    )
    p2s2, _ = seal._jit_round_two_s2(
        CURVE, keys[3], sec1, own_r1, Y1, cpub1, csec1, bits1[:, 0], info1,
        ids1, 0,
    )
    # verify programs (batch n)
    rep = lambda t: jax.tree.map(
        lambda a: (jnp.broadcast_to(a, (n,) + a.shape[1:])
                   if a is not None else None), t,
        is_leaf=lambda x: x is None,
    )
    cpub_n, pub1_n = rep(cpub1), rep(pub1)
    seal._jit_verify_commit(CURVE, cpub_n, ids_all)
    seal._jit_verify_round_one(CURVE, pub1_n, ids_all, 0)
    Yn = seal._jit_avnet(CURVE, pub1_n.X)
    seal._jit_verify_round_two_s1(
        CURVE, rep(p2s1), pub1_n, Yn, cpub_n, ids_all, 0)
    seal._jit_verify_round_two_s2(
        CURVE, rep(p2s2), pub1_n, Yn, cpub_n, rep(info1), ids_all, 0)
    seal._jit_round_three(CURVE, rep(p2s1).b)


def run_hub_auction(n: int, c: int, bids, seed: int = 0,
                    timeout_s: float = 600.0, warm: bool = True):
    """Spawn the hub + n verified party processes; returns
    (results: list[(max_bid, ok)], meters: dict[str, int])."""
    from .native import BoardClient, NativeBoard

    if warm:
        warm_cache(n, c)
    sock = os.path.join(tempfile.mkdtemp(prefix="pa_hub_"), "board.sock")
    board = NativeBoard(n)
    server = board.serve(sock)
    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(
            target=run_party,
            args=(sock, i, n, c, int(bids[i]), seed, timeout_s),
        )
        for i in range(n)
    ]
    for p in procs:
        p.start()
    cl = BoardClient(sock)
    results = []
    for i in range(n):
        raw = cl.fetch_wait(PHASE_RESULT, 0, i, "result", timeout_s)
        results.append((int.from_bytes(raw[:8], "big"), bool(raw[8])))
    for p in procs:
        p.join(timeout=60)
    meters = {
        "bidder": board.bytes("bidder"),
        "verifier": board.bytes("verifier"),
        "result": board.bytes("result"),
        "total": board.total_bytes(),
    }
    cl.close()
    server.stop()
    return results, meters


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    n = int(argv[0]) if len(argv) > 0 else 3
    c = int(argv[1]) if len(argv) > 1 else 2
    seed = int(argv[2]) if len(argv) > 2 else 0
    import random

    rng = random.Random(seed)
    bids = [rng.randrange(1 << c) for _ in range(n)]
    results, meters = run_hub_auction(n, c, bids, seed)
    want = max(bids)
    ok = all(r == (want, True) for r in results)
    print(f"[hub] n={n} c={c} bids={bids} -> results={results}")
    print(f"[hub] meters: {meters}")
    print(f"[hub] {'OK' if ok else 'FAIL'}: verified multi-process maxBid="
          f"{want}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
