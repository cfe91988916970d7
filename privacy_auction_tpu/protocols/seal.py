"""SEAL protocol: sealed-bid first-price auction without auctioneers.

TPU-native redesign of the reference's `SEAL/` stack
(`/root/reference/SEAL/bidder.cpp`, `SEAL/main.cpp`): every phase is a
single batched computation over ALL n bidders (and, for the commit phase,
all c bits) instead of the reference's per-party scalar loops.

Phase structure (mirrors `/root/reference/SEAL/main.cpp:46-120`):

  commit      -> per (bidder, bit): phi = g^(alpha*beta + bit), A = g^alpha,
                 B = g^beta, PoKDLog(A), PoKDLog(B), PoWFCom
  per step i (MSB -> LSB):
    round 1   -> fresh keys X = g^x, R = g^r + 2 PoKDLogs
    round 2   -> AV-net key Y_i, ciphertext b = x*Y (bit 0) | x*R (bit 1),
                 Stage1 NIZK (pre-junction) or Stage2 NIZK (post-junction)
    round 3   -> veto sum  sum_j b_j ; deciding step iff != infinity;
                 junction/race bookkeeping

Key algorithmic upgrades over the reference:
  * Y_i = sum_{j<i} X_j - sum_{j>i} X_j for ALL i at once via one inclusive
    prefix scan + one total sum: O(n log n) point-adds instead of the
    reference's O(n^2) per-party loop (`SEAL/bidder.cpp:1286-1299`).
  * All NIZKs of a phase are generated/verified in one batched kernel call
    (bidders x bits x equations ride one scalar-mult doubling chain).
  * Verification checks each published proof once (the board is verified);
    the reference re-verifies every proof in each of the n verifiers
    (`SEAL/main.cpp:54-107`) -- identical results, n x the work.  The
    communication/time model for that redundancy is reproduced by the
    trackers, not by redundant compute.

The c auction steps stay sequential (junction-state dependency,
`SEAL/bidder.cpp:1301,1400`), but the WHOLE auction lives on device:
`full_step` is one jittable step (stage selection is a `lax.cond` on the
public junction flag -- only the live stage executes, per-bidder batch
stays branchless) and `run_auction` drives a `lax.scan` of it over all c
steps in a single XLA program (plus two dispatches for the commit phase,
see `_step_scan`), syncing to host once per auction.  The per-step
host-dispatch path survives only for the role-metered timing and
fault-injection (`tamper`) modes, which need per-phase boundaries.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import nizk
from ..curves import Curve
from ..ops import ec
from ..ops import field as F

LIMBS = F.LIMBS


# --------------------------------------------------------------------------
# message types (struct-of-arrays over the bidder axis)
# --------------------------------------------------------------------------

class CommitmentPub(NamedTuple):
    """Per-(bidder, bit) commitment publics (`SEAL/types.h:100-111`)."""

    phi: jnp.ndarray   # (n, c, 3, L)  g^(alpha*beta + bit)
    A: jnp.ndarray     # (n, c, 3, L)  g^alpha
    B: jnp.ndarray     # (n, c, 3, L)  g^beta
    pok_a: nizk.PoKDLog    # batched (n, c)
    pok_b: nizk.PoKDLog
    powf: nizk.PoWFCom


class CommitmentSec(NamedTuple):
    alpha: jnp.ndarray  # (n, c, L)
    beta: jnp.ndarray   # (n, c, L)


class RoundOnePub(NamedTuple):
    """Per-bidder step keys (`SEAL/types.h:118-125`)."""

    X: jnp.ndarray  # (n, 3, L) g^x
    R: jnp.ndarray  # (n, 3, L) g^r
    pok_x: nizk.PoKDLog
    pok_r: nizk.PoKDLog


class RoundOneSec(NamedTuple):
    x: jnp.ndarray  # (n, L)
    r: jnp.ndarray  # (n, L)


class RoundTwoPub(NamedTuple):
    """Per-bidder ciphertext + stage proof (`SEAL/types.h:132-144`).

    Exactly one of proof1/proof2 is meaningful for a given step; the host
    driver keeps them separate (static shapes per stage).
    """

    b: jnp.ndarray  # (n, 3, L)
    proof1: nizk.PoWFStage1 | None
    proof2: nizk.PoWFStage2 | None


class StepInfo(NamedTuple):
    """Snapshot of one step's public/secret state, used as the previous
    deciding-step context for Stage2 (`SEAL/bidder.h:53-69`)."""

    X: jnp.ndarray   # (n, 3, L)
    R: jnp.ndarray   # (n, 3, L)
    Y: jnp.ndarray   # (n, 3, L)
    b: jnp.ndarray   # (n, 3, L)
    x: jnp.ndarray   # (n, L)   secret key (prover side only)
    d: jnp.ndarray   # (n,)     effective encoded bit


def _dummy_step_info(n: int) -> StepInfo:
    inf = ec.infinity((n,))
    return StepInfo(
        X=inf, R=inf, Y=inf, b=inf,
        x=jnp.zeros((n, LIMBS), jnp.uint32),
        d=jnp.zeros((n,), jnp.uint32),
    )


# --------------------------------------------------------------------------
# AV-net key computation
# --------------------------------------------------------------------------

def avnet_keys(curve: Curve, X):
    """Y_i = sum_{j<i} X_j - sum_{j>i} X_j for all i, batched.

    One inclusive prefix scan P_i = sum_{j<=i} X_j plus the total S = P_n:
    Y_i = (P_i - X_i) - (S - P_i) = 2 P_i - X_i - S.  O(n log n) adds, depth
    O(log n) -- the reference computes each Y_i independently with O(n)
    adds per party (`/root/reference/SEAL/bidder.cpp:1286-1299`).
    """
    P = ec.ec_prefix_scan(curve, X, axis=0)   # (n, 3, L)
    S = P[-1]
    neg_part = ec.neg(curve, ec.add(curve, X, jnp.broadcast_to(S, X.shape)))
    return ec.add(curve, ec.add(curve, P, P), neg_part)


# --------------------------------------------------------------------------
# commit phase
# --------------------------------------------------------------------------

def commit(curve: Curve, key, bid_bits, ids):
    """Commit phase for all bidders/bits (`SEAL/bidder.cpp:1109-1162`).

    bid_bits: (n, c) uint32 in {0,1}, MSB first; ids: (n,) uint32.
    Returns (CommitmentPub, CommitmentSec).  The bit index is bound into
    every Fiat-Shamir transcript (domain separation).
    """
    fn = curve.fn
    n, c = bid_bits.shape
    k_ab, k_v, k_wf = jax.random.split(key, 3)
    ab = F.random(fn, k_ab, (2, n, c))
    alpha, beta = ab[0], ab[1]
    v = F.random(fn, k_v, (2, n, c))  # Schnorr nonces for the two PoKDLogs

    # phi = g^(alpha*beta + bit), A = g^alpha, B = g^beta, plus both Schnorr
    # nonce commitments: ONE batched fixed-base mul over 5*n*c lanes.
    exp_phi = F.add(
        fn, F.mul(fn, alpha, beta),
        jnp.zeros((n, c, LIMBS), jnp.uint32).at[..., 0].set(bid_bits),
    )
    pts = ec.mul_base(curve, jnp.stack([exp_phi, alpha, beta, v[0], v[1]]))
    phi, A, B = pts[0], pts[1], pts[2]

    ids_nc = jnp.broadcast_to(ids[:, None], (n, c))
    steps_nc = jnp.broadcast_to(jnp.arange(c, dtype=jnp.uint32), (n, c))
    pok = nizk.gen_pokdlog_from(
        curve, v, pts[3:5],
        jnp.stack([A, B]), jnp.stack([alpha, beta]),
        jnp.broadcast_to(ids_nc, (2, n, c)),
        jnp.broadcast_to(steps_nc, (2, n, c)),
    )
    pok_a = jax.tree.map(lambda t: t[0], pok)
    pok_b = jax.tree.map(lambda t: t[1], pok)
    powf = nizk.gen_powfcom(
        curve, k_wf, phi, A, B, alpha, bid_bits, ids_nc, steps_nc
    )
    return (
        CommitmentPub(phi=phi, A=A, B=B, pok_a=pok_a, pok_b=pok_b, powf=powf),
        CommitmentSec(alpha=alpha, beta=beta),
    )


def verify_commit(curve: Curve, pub: CommitmentPub, ids):
    """Verify every commitment proof (`SEAL/bidder.cpp:1171-1195`).

    Returns (n, c) bool.  Each proof is checked once (see module docstring).
    """
    n, c = pub.phi.shape[:2]
    ids_nc = jnp.broadcast_to(ids[:, None], (n, c))
    steps_nc = jnp.broadcast_to(jnp.arange(c, dtype=jnp.uint32), (n, c))
    return nizk.ver_commit_phase(
        curve, pub.pok_a, pub.pok_b, pub.powf, pub.phi, pub.A, pub.B, ids_nc,
        steps_nc,
    )


# --------------------------------------------------------------------------
# round 1
# --------------------------------------------------------------------------

def round_one(curve: Curve, key, n: int, ids, step=0):
    """Per-step key generation for all bidders (`SEAL/bidder.cpp:1203-1236`).

    The step index is bound into both PoKDLog transcripts so round-1 keys
    cannot be replayed across steps.
    """
    fn = curve.fn
    k_xr, k_v = jax.random.split(key)
    xr = F.random(fn, k_xr, (2, n))
    x, r = xr[0], xr[1]
    v = F.random(fn, k_v, (2, n))
    # keys AND Schnorr nonce commitments in one fixed-base mul (4 lanes)
    pts4 = ec.mul_base(curve, jnp.concatenate([xr, v], axis=0))
    pts, eps = pts4[:2], pts4[2:]
    X, R = pts[0], pts[1]
    pok = nizk.gen_pokdlog_from(
        curve, v, eps, pts, xr, jnp.broadcast_to(ids, (2, n)),
        jnp.broadcast_to(jnp.asarray(step, jnp.uint32), (2, n)),
    )
    pok_x = jax.tree.map(lambda t: t[0], pok)
    pok_r = jax.tree.map(lambda t: t[1], pok)
    return (
        RoundOnePub(X=X, R=R, pok_x=pok_x, pok_r=pok_r),
        RoundOneSec(x=x, r=r),
    )


def verify_round_one(curve: Curve, pub: RoundOnePub, ids, step=0):
    """(`SEAL/bidder.cpp:1245-1262`) -> (n,) bool."""
    n = pub.X.shape[0]
    ok = nizk.ver_pokdlog(
        curve,
        jax.tree.map(lambda a, b: jnp.stack([a, b]), pub.pok_x, pub.pok_r),
        jnp.stack([pub.X, pub.R]),
        jnp.broadcast_to(ids, (2, n)),
        jnp.broadcast_to(jnp.asarray(step, jnp.uint32), (2, n)),
    )
    return ok[0] & ok[1]


def round_one_batch(curve: Curve, key, n: int, c: int, ids):
    """Round-1 key generation for ALL c steps in one batched pass.

    The per-step keys are independent of the auction state
    (`SEAL/bidder.cpp:1203-1236` draws them fresh each step), so the
    fused driver hoists all c keygens out of the step scan: one
    fixed-base mult over 4*c*n lanes + one batched PoKDLog pass instead
    of c sequential ones.  Returns pytrees with leading (c, n) axes.
    """
    fn = curve.fn
    k_xr, k_v = jax.random.split(key)
    xr = F.random(fn, k_xr, (2, c, n))
    v = F.random(fn, k_v, (2, c, n))
    pts4 = ec.mul_base(curve, jnp.concatenate([xr, v], axis=0))
    pts, eps = pts4[:2], pts4[2:]
    steps = jnp.broadcast_to(
        jnp.arange(c, dtype=jnp.uint32)[None, :, None], (2, c, n)
    )
    pok = nizk.gen_pokdlog_from(
        curve, v, eps, pts, xr, jnp.broadcast_to(ids, (2, c, n)), steps
    )
    pok_x = jax.tree.map(lambda t: t[0], pok)
    pok_r = jax.tree.map(lambda t: t[1], pok)
    return (
        RoundOnePub(X=pts[0], R=pts[1], pok_x=pok_x, pok_r=pok_r),
        RoundOneSec(x=xr[0], r=xr[1]),
    )


def verify_round_one_batch(curve: Curve, pub: RoundOnePub, ids):
    """All c steps' round-1 proofs verified in one pass -> (c, n) bool."""
    c, n = pub.X.shape[:2]
    steps = jnp.broadcast_to(
        jnp.arange(c, dtype=jnp.uint32)[None, :, None], (2, c, n)
    )
    ok = nizk.ver_pokdlog(
        curve,
        jax.tree.map(lambda a, b: jnp.stack([a, b]), pub.pok_x, pub.pok_r),
        jnp.stack([pub.X, pub.R]),
        jnp.broadcast_to(ids, (2, c, n)),
        steps,
    )
    return ok[0] & ok[1]


def avnet_keys_steps(curve: Curve, X):
    """`avnet_keys` for all steps at once: X (c, n, 3, L) -> (c, n, 3, L)."""
    P = ec.ec_prefix_scan(curve, X, axis=1)
    S = P[:, -1:]
    neg_part = ec.neg(curve, ec.add(curve, X, jnp.broadcast_to(S, X.shape)))
    return ec.add(curve, ec.add(curve, P, P), neg_part)


# --------------------------------------------------------------------------
# round 2
# --------------------------------------------------------------------------

def round_two_stage1(curve: Curve, key, sec, pub, Y, commit_pub, commit_sec,
                     step_bits, d, ids, step: int):
    """Round 2 before the junction (`SEAL/bidder.cpp:1271-1321`).

    Y: AV-net keys for this step (computed once per step via avnet_keys --
    they are a public function of the round-1 X keys).  step_bits: (n,)
    actual bid bits at this step; d: effective bits (equal to step_bits
    pre-junction since everyone is in the race).
    Returns (RoundTwoPub, StepInfo).  The ciphertext b = x*Y | x*R
    (`SEAL/bidder.cpp:1301-1309`) rides the proof's batched EC call.
    """
    phi = commit_pub.phi[:, step]
    A = commit_pub.A[:, step]
    B = commit_pub.B[:, step]
    proof, b = nizk.gen_powfstage1(
        curve, key, pub.X, Y, pub.R, phi, A, B,
        sec.x, commit_sec.alpha[:, step], d, ids, step,
    )
    info = StepInfo(X=pub.X, R=pub.R, Y=Y, b=b, x=sec.x, d=d)
    return RoundTwoPub(b=b, proof1=proof, proof2=None), info


def round_two_stage2(curve: Curve, key, sec, pub, Y, commit_pub, commit_sec,
                     d, prev: StepInfo, ids, step: int):
    """Round 2 after the junction (`SEAL/bidder.cpp:1271-1331`).

    prev: snapshot of the last deciding step (public parts shared by all
    verifiers; x/d are the prover's own secrets).
    """
    pts = dict(
        Xi=pub.X, Ri=pub.R, Yi=Y,
        Bj=prev.b, Xj=prev.X, Rj=prev.R, Yj=prev.Y,
        Ci=commit_pub.phi[:, step],
        A=commit_pub.A[:, step], B=commit_pub.B[:, step],
    )
    proof, b = nizk.gen_powfstage2(
        curve, key, pts, sec.x, prev.x, commit_sec.alpha[:, step],
        d, prev.d, ids, step,
    )
    info = StepInfo(X=pub.X, R=pub.R, Y=Y, b=b, x=sec.x, d=d)
    return RoundTwoPub(b=b, proof1=None, proof2=proof), info


def verify_round_two_stage1(curve: Curve, pub2: RoundTwoPub, pub1: RoundOnePub,
                            Y, commit_pub: CommitmentPub, ids, step: int):
    """(`SEAL/bidder.cpp:1346-1369`) -> (n,) bool."""
    return nizk.ver_powfstage1(
        curve, pub2.proof1, pub2.b, pub1.X, Y, pub1.R,
        commit_pub.phi[:, step], commit_pub.A[:, step],
        commit_pub.B[:, step], ids, step,
    )


def verify_round_two_stage2(curve: Curve, pub2: RoundTwoPub, pub1: RoundOnePub,
                            Y, commit_pub: CommitmentPub, prev: StepInfo,
                            ids, step: int):
    """(`SEAL/bidder.cpp:1346-1377`) -> (n,) bool."""
    pts = dict(
        Bi=pub2.b, Xi=pub1.X, Ri=pub1.R, Yi=Y,
        Bj=prev.b, Xj=prev.X, Rj=prev.R, Yj=prev.Y,
        Ci=commit_pub.phi[:, step],
        A=commit_pub.A[:, step], B=commit_pub.B[:, step],
    )
    return nizk.ver_powfstage2(curve, pub2.proof2, pts, ids, step)


# --------------------------------------------------------------------------
# round 3
# --------------------------------------------------------------------------

def round_three(curve: Curve, b):
    """Veto aggregation (`SEAL/bidder.cpp:1386-1411`).

    Returns deciding: () bool -- True iff sum_j b_j != infinity, i.e. at
    least one in-race bidder had bit 1, so the max-bid bit at this step is 1.
    """
    total = ec.ec_sum(curve, b, axis=0)
    return ~ec.is_infinity(total)


# --------------------------------------------------------------------------
# host driver
# --------------------------------------------------------------------------

class AuctionResult(NamedTuple):
    max_bid: int
    verified: bool
    deciding_bits: np.ndarray  # (c,) uint8


# Maximum supported bid bit-length.  The reference asserts c <= C_MAX = 32
# (`/root/reference/SEAL/bidder.cpp:25`, `SEAL/params.h:7`); the TPU build
# raises the cap to 64 (bids are staged through uint64 on the host) and
# errors instead of asserting.
C_MAX = 64


def bids_to_bits(bids, c: int) -> np.ndarray:
    """Host: integer bids (n,) -> (n, c) bit matrix, MSB first
    (`SEAL/bidder.cpp:27-34`).

    Validates the reference's C_MAX contract (`SEAL/bidder.cpp:25`) and
    that every bid fits in c bits (the reference silently truncates).
    """
    if not 1 <= c <= C_MAX:
        raise ValueError(
            f"bid bit-length c={c} out of range [1, {C_MAX}] "
            "(reference C_MAX contract, SEAL/params.h)"
        )
    blist = [int(b) for b in bids]
    bad = [b for b in blist if b < 0 or b >= (1 << c)]
    if bad:
        raise ValueError(
            f"bids {bad[:4]}{'...' if len(bad) > 4 else ''} do not fit in "
            f"c={c} bits"
        )
    arr = np.asarray(blist, dtype=np.uint64)
    shifts = np.arange(c - 1, -1, -1, dtype=np.uint64)
    return ((arr[:, None] >> shifts) & 1).astype(np.uint32)


def run_auction(curve: Curve, key, bids, c: int, verify: bool = True,
                trackers=None, tamper=None, times=None,
                mesh=None) -> AuctionResult:
    """Full SEAL auction for integer bids.

    Mirrors `/root/reference/SEAL/main.cpp:46-165`: commit -> verify ->
    c x (round1 -> verify -> round2 -> verify -> round3).  `verify=False`
    mirrors ENABLE_VERIFICATION off (`SEAL/params.h:13`).

    Default (honest) path: three dispatches for the whole auction --
    commit, commit verification, and ONE `lax.scan` of `full_step`
    covering all c steps (round 1/2/3 + NIZK verification + junction
    bookkeeping) -- synced once at the end; a failed verification
    surfaces as verified=False/max_bid=-1 after the run (the reference
    aborts mid-protocol, `SEAL/main.cpp:56`; same outcome, no per-step
    host round-trips).  The per-step host loop below runs only when
    `times` (per-role device timing needs phase boundaries) or `tamper`
    (the board hook needs message access) is given.

    tamper: optional fault-injection hook `tamper(phase, step, pub) -> pub`
    with phase in {"commit", "round1", "round2"} (step is None for commit).
    It models a malicious party publishing an inconsistent message: the
    returned value is what lands on the bulletin board (what verifiers and
    round 3 consume); honest provers keep using their local honest values.
    A verification failure aborts the auction immediately with
    verified=False and max_bid=-1, mirroring the reference's exit(1)
    (`SEAL/main.cpp:56-58`).

    times: optional `utils.trackers.TimeTracker`.  Prover phases accrue to
    the "bidder" category (one batched call computes all n bidders, so
    per-bidder time = accumulated / n); verify phases accrue to "verifier"
    (one batched pass checks each proof once = exactly one reference
    verifier's workload, `SEAL/main.cpp:54-107`, so per-verifier time =
    accumulated as-is and total across the n redundant verifiers = n x).

    mesh: optional `jax.sharding.Mesh` with a "bidders" axis
    (`parallel.mesh.make_mesh`).  All (n, ...) bidder-axis inputs are
    sharded over it; XLA propagates the sharding through every phase and
    inserts ICI collectives only where the protocol genuinely
    communicates (the AV-net prefix scan and the round-3 veto sum).
    When n is not a multiple of the mesh size the bidder axis is padded
    with zero-bid dummy lanes (honest parties bidding 0 -- they cannot
    change the maximum).  Results are bit-identical to the unsharded run
    (the reduction trees are fixed by the program, not the partitioning).
    """
    from ..utils.trackers import CATEGORY_BIDDER, CATEGORY_VERIFIER

    if mesh is not None:
        from ..parallel import mesh as M

        n_dev = mesh.devices.size
        n_pad = M.pad_bidders(len(bids), n_dev)
        if n_pad != len(bids):
            bids = list(bids) + [0] * (n_pad - len(bids))
    n = len(bids)
    bits = jnp.asarray(bids_to_bits(bids, c))
    ids = jnp.arange(n, dtype=jnp.uint32)

    if times is None and tamper is None:
        # fused on-device path: three dispatches (commit, commit-verify,
        # step scan), one sync for the whole run
        if mesh is not None:
            bits, ids = M.shard_bidders(mesh, (bits, ids))
            key = M.replicate(mesh, key)
        kc, ks = jax.random.split(key)
        commit_pub, commit_sec = _jit_commit(curve, kc, bits, ids)
        ok_c = (_jit_verify_commit(curve, commit_pub, ids)
                if verify else jnp.asarray(True))
        deciding_dev, oks = _jit_step_scan(
            curve, ks, bits, ids, commit_pub, commit_sec, verify
        )
        all_ok = bool(np.asarray(ok_c).all()) and bool(np.asarray(oks).all())
        deciding = np.asarray(deciding_dev).astype(np.uint8)
        if trackers is not None:
            trackers.account_commit(n, c)
            stage2 = False
            for s in range(c):
                trackers.account_step(n, stage2=stage2)
                stage2 = stage2 or bool(deciding[s])
        if verify and not all_ok:
            return AuctionResult(
                max_bid=-1, verified=False,
                deciding_bits=np.zeros(c, np.uint8),
            )
        max_bid = 0
        for s in range(c):
            max_bid = (max_bid << 1) | int(deciding[s])
        return AuctionResult(
            max_bid=max_bid, verified=True, deciding_bits=deciding
        )

    keys = jax.random.split(key, 2 * c + 1)
    if mesh is not None:
        bits, ids = M.shard_bidders(mesh, (bits, ids))
        keys = M.replicate(mesh, keys)

    def _timed(category, fn, *a, **kw):
        if times is None:
            return fn(*a, **kw)
        times.start(category)
        out = fn(*a, **kw)
        # hard sync via host transfer of one leaf: on the experimental axon
        # platform block_until_ready can return before execution completes
        np.asarray(jax.tree.leaves(out)[0])
        times.stop(category)
        return out

    def _board(phase, step, pub):
        return tamper(phase, step, pub) if tamper is not None else pub

    failed = AuctionResult(
        max_bid=-1, verified=False, deciding_bits=np.zeros(c, np.uint8)
    )

    commit_pub, commit_sec = _timed(
        CATEGORY_BIDDER, _jit_commit, curve, keys[0], bits, ids
    )
    board_commit = _board("commit", None, commit_pub)
    if verify and not bool(np.asarray(_timed(
        CATEGORY_VERIFIER, _jit_verify_commit, curve, board_commit, ids
    )).all()):
        return failed
    if trackers is not None:
        trackers.account_commit(n, c)

    in_race = jnp.ones((n,), jnp.uint32)
    junction = False
    prev = _dummy_step_info(n)
    if mesh is not None:
        from ..parallel import mesh as M

        in_race, prev = M.shard_bidders(mesh, (in_race, prev))
    max_bid = 0
    deciding = np.zeros(c, np.uint8)

    for step in range(c):
        pub1, sec1 = _timed(
            CATEGORY_BIDDER, _jit_round_one, curve, keys[2 * step + 1], n,
            ids, step,
        )
        board_pub1 = _board("round1", step, pub1)
        if verify and not bool(np.asarray(_timed(
            CATEGORY_VERIFIER, _jit_verify_round_one, curve, board_pub1, ids,
            step,
        )).all()):
            return failed
        d = bits[:, step] & in_race
        Y = _timed(CATEGORY_BIDDER, _jit_avnet, curve, pub1.X)
        board_Y = Y if board_pub1 is pub1 else _jit_avnet(curve, board_pub1.X)
        if not junction:
            pub2, info = _timed(
                CATEGORY_BIDDER, _jit_round_two_s1,
                curve, keys[2 * step + 2], sec1, pub1, Y, commit_pub,
                commit_sec, bits[:, step], d, ids, step,
            )
            board_pub2 = _board("round2", step, pub2)
            if verify and not bool(np.asarray(_timed(
                CATEGORY_VERIFIER, _jit_verify_round_two_s1,
                curve, board_pub2, board_pub1, board_Y, board_commit, ids,
                step,
            )).all()):
                return failed
        else:
            pub2, info = _timed(
                CATEGORY_BIDDER, _jit_round_two_s2,
                curve, keys[2 * step + 2], sec1, pub1, Y, commit_pub,
                commit_sec, d, prev, ids, step,
            )
            board_pub2 = _board("round2", step, pub2)
            if verify and not bool(np.asarray(_timed(
                CATEGORY_VERIFIER, _jit_verify_round_two_s2,
                curve, board_pub2, board_pub1, board_Y, board_commit, prev,
                ids, step,
            )).all()):
                return failed
        if trackers is not None:
            trackers.account_step(n, stage2=junction)

        step_deciding = bool(np.asarray(_timed(
            CATEGORY_BIDDER, _jit_round_three, curve, board_pub2.b
        )))
        deciding[step] = step_deciding
        max_bid = (max_bid << 1) | int(step_deciding)
        if step_deciding:
            in_race = in_race & d
            junction = True
            prev = info

    return AuctionResult(max_bid=max_bid, verified=True, deciding_bits=deciding)


# --------------------------------------------------------------------------
# fused whole-auction pipeline
# --------------------------------------------------------------------------

def full_step(curve: Curve, key, step, bits_step, in_race, junction, prev,
              commit_pub: CommitmentPub, commit_sec: CommitmentSec, ids,
              verify: bool = True):
    """One complete auction step as a single jittable computation:
    round 1 (+ verify) -> AV-net keys -> round 2 Stage1 | Stage2
    (+ verify) -> round 3 veto sum -> junction/race bookkeeping
    (`SEAL/main.cpp:65-120` for one step).

    Stage selection is a `lax.cond` on `junction` -- a PUBLIC scalar (all
    parties know whether a deciding step has happened), so branching on
    it leaks nothing, and only the live stage's EC work executes.  The
    per-bidder bit-dependent behavior inside each stage stays branchless
    (see nizk OR-proofs).

    Returns (new_race, new_junction, new_prev, deciding, ok) with
    deciding = this step's max-bid bit and ok = all NIZK checks passed
    (constant True when verify=False, mirroring ENABLE_VERIFICATION off).
    """
    n = bits_step.shape[0]
    k1, k2 = jax.random.split(key)
    pub1, sec1 = round_one(curve, k1, n, ids, step)
    ok1 = (verify_round_one(curve, pub1, ids, step).all()
           if verify else jnp.asarray(True))
    d = bits_step & in_race
    Y = avnet_keys(curve, pub1.X)

    def _stage1(_):
        pub2, _info = round_two_stage1(
            curve, k2, sec1, pub1, Y, commit_pub, commit_sec,
            bits_step, d, ids, step,
        )
        ok = (verify_round_two_stage1(
            curve, pub2, pub1, Y, commit_pub, ids, step,
        ).all() if verify else jnp.asarray(True))
        return pub2.b, ok

    def _stage2(_):
        pub2, _info = round_two_stage2(
            curve, k2, sec1, pub1, Y, commit_pub, commit_sec, d, prev,
            ids, step,
        )
        ok = (verify_round_two_stage2(
            curve, pub2, pub1, Y, commit_pub, prev, ids, step,
        ).all() if verify else jnp.asarray(True))
        return pub2.b, ok

    b, ok2 = jax.lax.cond(junction, _stage2, _stage1, None)
    deciding = round_three(curve, b)
    info = StepInfo(X=pub1.X, R=pub1.R, Y=Y, b=b, x=sec1.x, d=d)
    new_prev = jax.tree.map(
        lambda new, old: jnp.where(deciding, new, old), info, prev
    )
    new_race = jnp.where(deciding, in_race & d, in_race)
    return new_race, junction | deciding, new_prev, deciding, ok1 & ok2


def _step_scan(curve: Curve, ks, bits, ids, commit_pub, commit_sec,
               verify: bool):
    """All c auction steps as ONE XLA program (`SEAL/main.cpp:65-120`
    with the per-step host dispatches fused away).

    Latency structure: everything that does not depend on the carried
    auction state is hoisted OUT of the scan into large batched passes --
    all c round-1 keygens + their PoKDLog verifications, all AV-net keys,
    and both ciphertext candidates b0 = Y^x / b1 = R^x per step.  The
    scan body is then per-step: select the ciphertext by the effective
    bit, generate + verify the Stage1|Stage2 proof (ONE ladder pass
    each, `nizk._eval_eqs`), veto-sum, junction bookkeeping.  A serial
    ladder pass costs near-constant wall time at small lane counts, so
    minimizing passes-per-step is what sets the auction's latency.

    The commit phase is deliberately dispatched separately (run_auction):
    compiling commit generation + verification into the same program as
    the scan miscompiles on the experimental axon TPU backend (observed:
    every equality check in the combined program evaluates false at c=8
    while the identical split programs -- and the combined program on
    XLA:CPU -- are correct).  Three dispatches per auction is still O(1).

    Returns (deciding_bits (c,) bool, oks (c,) bool).
    """
    pre = _precompute(curve, ks, bits.shape, ids, verify)
    return _scan_steps(curve, pre, bits, ids, commit_pub, commit_sec, verify)


def _b01(curve: Curve, Y_all, R_all, x_all):
    c, n = x_all.shape[:2]
    return ec.scalar_mul(
        curve,
        jnp.stack([Y_all, R_all]),
        jnp.broadcast_to(x_all, (2, c, n, LIMBS)),
    )  # (2, c, n, 3, L): per-step ciphertext candidates Y^x / R^x


# Hoisted passes as SEPARATE dispatches (same axon-miscompile workaround
# as ccs22._precompute: with the hoisted passes compiled into the scan
# program, every NIZK check in the (4, 3) program evaluates false while
# the identical split programs -- and XLA:CPU -- are correct).
_jit_round_one_batch = jax.jit(round_one_batch, static_argnums=(0, 2, 3))
_jit_verify_round_one_batch = jax.jit(verify_round_one_batch,
                                      static_argnums=0)
_jit_avnet_steps = jax.jit(avnet_keys_steps, static_argnums=0)
_jit_b01 = jax.jit(_b01, static_argnums=0)


def _precompute(curve: Curve, ks, shape, ids, verify: bool):
    """State-independent work for all c steps, one dispatch per pass."""
    n, c = shape
    k_r1, k_scan = jax.random.split(ks)
    step_keys = jax.random.split(k_scan, c)
    pub1, sec1 = _jit_round_one_batch(curve, k_r1, n, c, ids)
    if verify:
        ok_r1 = _jit_verify_round_one_batch(curve, pub1, ids).all(axis=1)
    else:
        ok_r1 = jnp.ones((c,), bool)
    Y_all = _jit_avnet_steps(curve, pub1.X)
    b01 = _jit_b01(curve, Y_all, pub1.R, sec1.x)
    return step_keys, pub1.X, pub1.R, sec1.x, Y_all, b01[0], b01[1], ok_r1


def _scan_steps(curve: Curve, pre, bits, ids, commit_pub, commit_sec,
                verify: bool):
    """The per-step lax.scan over the precomputed streams (see
    _step_scan)."""
    n, c = bits.shape
    step_keys, X_all, R_all, x_all, Y_all, b0, b1, ok_r1 = pre
    sm = lambda a: jnp.moveaxis(a, 1, 0)  # commit (n, c, ...) -> step-major

    def body(carry, xs):
        in_race, junction, prev = carry
        (k2, step, bits_step, X_s, R_s, x_s, Y_s, b0_s, b1_s,
         phi_s, A_s, B_s, alpha_s) = xs
        d = bits_step & in_race
        b = ec.select(d == 0, b0_s, b1_s)  # `SEAL/bidder.cpp:1301-1309`

        def _stage1(_):
            proof, _b = nizk.gen_powfstage1(
                curve, k2, X_s, Y_s, R_s, phi_s, A_s, B_s, x_s, alpha_s,
                d, ids, step, b=b,
            )
            if not verify:
                return jnp.asarray(True)
            return nizk.ver_powfstage1(
                curve, proof, b, X_s, Y_s, R_s, phi_s, A_s, B_s, ids, step,
            ).all()

        def _stage2(_):
            pts = dict(
                Xi=X_s, Ri=R_s, Yi=Y_s,
                Bj=prev.b, Xj=prev.X, Rj=prev.R, Yj=prev.Y,
                Ci=phi_s, A=A_s, B=B_s,
            )
            proof, _b = nizk.gen_powfstage2(
                curve, k2, pts, x_s, prev.x, alpha_s, d, prev.d, ids, step,
                b=b,
            )
            if not verify:
                return jnp.asarray(True)
            return nizk.ver_powfstage2(
                curve, proof, dict(pts, Bi=b), ids, step,
            ).all()

        ok2 = jax.lax.cond(junction, _stage2, _stage1, None)
        deciding = round_three(curve, b)
        info = StepInfo(X=X_s, R=R_s, Y=Y_s, b=b, x=x_s, d=d)
        new_prev = jax.tree.map(
            lambda new, old: jnp.where(deciding, new, old), info, prev
        )
        new_race = jnp.where(deciding, in_race & d, in_race)
        return (new_race, junction | deciding, new_prev), (deciding, ok2)

    init = (
        jnp.ones((n,), jnp.uint32),
        jnp.asarray(False),
        _dummy_step_info(n),
    )
    xs = (
        step_keys, jnp.arange(c, dtype=jnp.uint32), bits.T,
        X_all, R_all, x_all, Y_all, b0, b1,
        sm(commit_pub.phi), sm(commit_pub.A), sm(commit_pub.B),
        sm(commit_sec.alpha),
    )
    _, (deciding, oks) = jax.lax.scan(body, init, xs)
    return deciding, oks & ok_r1


_jit_scan_steps = jax.jit(_scan_steps, static_argnums=(0, 6))


def _jit_step_scan(curve, ks, bits, ids, commit_pub, commit_sec, verify):
    """Driver entry: per-pass precompute dispatches + the scan dispatch."""
    pre = _precompute(curve, ks, bits.shape, ids, verify)
    return _jit_scan_steps(curve, pre, bits, ids, commit_pub, commit_sec,
                           verify)


# --------------------------------------------------------------------------
# whole-step compositions (jittable; used by the single-chip compile check
# and anywhere a full step must live in one XLA program)
# --------------------------------------------------------------------------

def step_stage1(curve: Curve, key, bits_step, in_race, ids):
    """One full pre-junction auction step: commit + round1 + round2/Stage1 +
    all verifications + round3, as a single jittable computation.

    Returns (deciding, all_ok, new_race, StepInfo, CommitmentPub,
    CommitmentSec).  Composes the same phase functions the host driver
    dispatches (`run_auction`).
    """
    n = bits_step.shape[0]
    kc, k1, k2 = jax.random.split(key, 3)
    commit_pub, commit_sec = commit(curve, kc, bits_step[:, None], ids)
    ok_c = verify_commit(curve, commit_pub, ids)
    pub1, sec1 = round_one(curve, k1, n, ids)
    ok_1 = verify_round_one(curve, pub1, ids)
    d = bits_step & in_race
    Y = avnet_keys(curve, pub1.X)
    pub2, info = round_two_stage1(
        curve, k2, sec1, pub1, Y, commit_pub, commit_sec, bits_step, d, ids, 0
    )
    ok_2 = verify_round_two_stage1(curve, pub2, pub1, Y, commit_pub, ids, 0)
    deciding = round_three(curve, pub2.b)
    all_ok = ok_c.all() & ok_1.all() & ok_2.all()
    new_race = jnp.where(deciding, in_race & d, in_race)
    return deciding, all_ok, new_race, info, commit_pub, commit_sec


def step_stage2(curve: Curve, key, bits_step, in_race, ids, prev,
                commit_pub, commit_sec):
    """One full post-junction auction step (Stage2 NIZK), jittable."""
    n = bits_step.shape[0]
    k1, k2 = jax.random.split(key)
    pub1, sec1 = round_one(curve, k1, n, ids)
    ok_1 = verify_round_one(curve, pub1, ids)
    d = bits_step & in_race
    Y = avnet_keys(curve, pub1.X)
    pub2, info = round_two_stage2(
        curve, k2, sec1, pub1, Y, commit_pub, commit_sec, d, prev, ids, 0
    )
    ok_2 = verify_round_two_stage2(
        curve, pub2, pub1, Y, commit_pub, prev, ids, 0
    )
    deciding = round_three(curve, pub2.b)
    return deciding, ok_1.all() & ok_2.all()


# jitted entry points (curve/step static)
_jit_avnet = jax.jit(avnet_keys, static_argnums=0)
_jit_commit = jax.jit(commit, static_argnums=0)
_jit_verify_commit = jax.jit(verify_commit, static_argnums=0)
_jit_round_one = jax.jit(round_one, static_argnums=(0, 2))
_jit_verify_round_one = jax.jit(verify_round_one, static_argnums=0)
# `step` stays a traced scalar (dynamic_slice into the commitment arrays),
# so all c auction steps share ONE compilation of each phase function.
_jit_round_two_s1 = jax.jit(round_two_stage1, static_argnums=0)
_jit_round_two_s2 = jax.jit(round_two_stage2, static_argnums=0)
_jit_verify_round_two_s1 = jax.jit(verify_round_two_stage1, static_argnums=0)
_jit_verify_round_two_s2 = jax.jit(verify_round_two_stage2, static_argnums=0)
_jit_round_three = jax.jit(round_three, static_argnums=0)
