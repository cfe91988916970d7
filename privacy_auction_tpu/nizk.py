"""Batched NIZK proof systems for the SEAL auction (TPU-native).

The reference implements four sigma-protocol proof systems with per-proof
scalar loops over OpenSSL (`/root/reference/SEAL/bidder.cpp:90-1101`):

  * PoKDLog     -- Schnorr proof of knowledge of x in X = g^x
  * PoWFCom     -- 2-branch CDS OR-proof: commitment triple encodes bit 0/1
  * PoWFStage1  -- 2-branch OR-proof x 4 equations: round-2 ciphertext
                   well-formed w.r.t. keys + commitment
  * PoWFStage2  -- 3-branch OR-proof x 16 equations: consistency with the
                   previous deciding step

TPU-first redesign: every equation in every system has the single shape

        eps = base1^s * base2^t

so generation and verification are *the same* batched computation (compute
equations from scalars), differing only in where the scalars come from.
ALL equations of a proof system (bidders x bits x equations, fixed-base
and dual-base alike) ride ONE batched `ec.dual_mul` pass per phase
(`_eval_eqs`), and OR-proof branch selection is branchless scalar selects
*before* the EC work -- the real and
simulated branches cost the same, so the encoded bit never leaks through
timing or control flow (the reference branches on the bit in plain C++).

The reference's degenerate branch-1 simulation in Stage2 (rho11-13 left at
zero, `/root/reference/SEAL/bidder.cpp:749-754`) is deliberately fixed
here: all simulated responses are uniformly random (SURVEY.md section 5).

Fiat-Shamir transcripts: 65-byte SEC1 uncompressed points in the same
order as the reference (`/root/reference/SEAL/hash.cpp:26,77,131,196-204`),
prover id as 8 little-endian bytes (canonicalizing the reference's raw
size_t memcpy, `SEAL/hash.cpp:40`), digest reduced mod the group order
(`SEAL/hash.cpp:50-51`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .curves import Curve
from .ops import ec
from .ops import field as F
from .ops.sha256 import digest_to_scalar, sha256


# --------------------------------------------------------------------------
# Fiat-Shamir transcript hashing
# --------------------------------------------------------------------------

def _id_bytes(ids):
    """Prover id (...,) integer -> (..., 8) uint8 little-endian."""
    ids = ids.astype(jnp.uint32)
    shifts = np.arange(0, 32, 8, dtype=np.uint32)
    lo = ((ids[..., None] >> shifts) & jnp.uint32(0xFF)).astype(jnp.uint8)
    return jnp.concatenate(
        [lo, jnp.zeros(ids.shape + (4,), jnp.uint8)], axis=-1
    )


def _u32_bytes(v):
    """Step index (...,) integer -> (..., 4) uint8 little-endian."""
    v = jnp.asarray(v).astype(jnp.uint32)
    shifts = np.arange(0, 32, 8, dtype=np.uint32)
    return ((v[..., None] >> shifts) & jnp.uint32(0xFF)).astype(jnp.uint8)


# Domain-separation tags: one per proof system, bound into every
# transcript so a proof cannot be replayed as a different system's (the
# reference binds only points + prover id, `SEAL/hash.cpp:26-51`; this is
# the remaining transcript-hardening fix on top of the canonical id
# serialization below).
TAG_POKDLOG = b"PA/PoKDLog\x00"
TAG_POWFCOM = b"PA/PoWFCom\x00"
TAG_STAGE1 = b"PA/PoWFStage1\x00"
TAG_STAGE2 = b"PA/PoWFStage2\x00"


def fs_challenge(curve: Curve, points, ids, domain: bytes = b"", steps=None):
    """Fiat-Shamir challenge scalar from an ordered point list + prover id.

    points: sequence of (..., 3, L) projective points (broadcast-compatible
    batches); ids: (...,) integer array.  Returns (..., L) scalar mod n.

    domain: static byte tag hashed first (proof-system separation);
    steps: optional integer scalar/array bound as 4 LE bytes after the id
    (auction-step separation -- a proof generated for step i cannot be
    replayed at step j).

    The generator prefix byte-string is a host constant; all points are
    affinized in ONE batched inversion (stacked along a new axis) -- the
    field inversions dominate transcript cost, so batching them across the
    whole transcript (and across all proofs in the caller's batch) matters.
    """
    stacked = jnp.stack(
        [jnp.broadcast_to(p, jnp.broadcast_shapes(*[q.shape for q in points]))
         for p in points],
        axis=-3,
    )  # (..., N, 3, L)
    octets = ec.serialize_uncompressed(curve, stacked)  # (..., N, 65)
    batch = octets.shape[:-2]
    flat = octets.reshape(batch + (octets.shape[-2] * 65,))
    parts = []
    if domain:
        parts.append(jnp.broadcast_to(
            jnp.asarray(np.frombuffer(domain, np.uint8)),
            batch + (len(domain),),
        ))
    parts += [
        jnp.broadcast_to(jnp.asarray(_generator_octets(curve)), batch + (65,)),
        flat,
        jnp.broadcast_to(_id_bytes(jnp.asarray(ids)), batch + (8,)),
    ]
    if steps is not None:
        parts.append(jnp.broadcast_to(_u32_bytes(steps), batch + (4,)))
    msg = jnp.concatenate(parts, axis=-1)
    return digest_to_scalar(curve.fn, sha256(msg))


def _generator_octets(curve: Curve) -> np.ndarray:
    g = curve.host.g
    out = np.zeros(65, np.uint8)
    out[0] = 4
    out[1:33] = np.frombuffer(g[0].to_bytes(32, "big"), np.uint8)
    out[33:65] = np.frombuffer(g[1].to_bytes(32, "big"), np.uint8)
    return out


def _g_minus(curve: Curve, P):
    """P / g (the reference's phi/g, c/g, Ci/g pattern)."""
    neg_g = ec.neg(curve, ec.from_affine(
        F.const(int(curve.host.gx), P.shape[:-2]),
        F.const(int(curve.host.gy), P.shape[:-2]),
    ))
    return ec.add(curve, P, neg_g)


def _sel(cond, a, b):
    """Scalar-limb select on condition (...,)."""
    return jnp.where(cond[..., None], a, b)


# --------------------------------------------------------------------------
# equation evaluation: the shared core of gen and verify
# --------------------------------------------------------------------------

def _eval_eqs(curve: Curve, eqs):
    """Evaluate k equations  base1^s * base2^t  in ONE batched dual-mult
    pass.  eqs: list of (base1, s, base2, t); base1=None means the group
    generator g.

    Merging the fixed-base (g^s X^t) and dual-base (P^s Q^t) equation
    groups of a proof system into a single ladder halves the number of
    serial kernel passes per proof phase -- the dominant latency term for
    small-n auction steps, where a ladder pass costs ~constant wall time
    regardless of lane count.  Returns the stacked (k, ..., 3, L) result.
    """
    batch = jnp.broadcast_shapes(
        *[e[2].shape[:-2] for e in eqs],
        *[e[1].shape[:-1] for e in eqs],
    )
    g = None
    P1, S, P2, T = [], [], [], []
    for b1, s, b2, t in eqs:
        if b1 is None:
            if g is None:
                g = ec.from_affine(
                    F.const(int(curve.host.gx), batch),
                    F.const(int(curve.host.gy), batch),
                )
            b1 = g
        P1.append(jnp.broadcast_to(b1, batch + (3, F.LIMBS)))
        S.append(jnp.broadcast_to(s, batch + (F.LIMBS,)))
        P2.append(jnp.broadcast_to(b2, batch + (3, F.LIMBS)))
        T.append(jnp.broadcast_to(t, batch + (F.LIMBS,)))
    return ec.dual_mul(
        curve, jnp.stack(P1), jnp.stack(S), jnp.stack(P2), jnp.stack(T)
    )


def _eq_all(curve: Curve, got, eps):
    """Compare all k computed equations against the published eps in ONE
    batched ec.eq: got (k, ..., 3, L), eps list of (..., 3, L).
    Returns (...,) bool (AND over every equation)."""
    return ec.eq(curve, got, jnp.stack(eps)).all(axis=0)


def _zero(like):
    return jnp.zeros_like(like)


# --------------------------------------------------------------------------
# PoKDLog (Schnorr)
# --------------------------------------------------------------------------

class PoKDLog(NamedTuple):
    """Schnorr proof (`/root/reference/SEAL/types.h:13-16`)."""

    eps: jnp.ndarray  # (..., 3, L) commitment g^v
    rho: jnp.ndarray  # (..., L) response v - ch*x


def gen_pokdlog_from(curve: Curve, v, eps, X, x, ids, steps=None) -> PoKDLog:
    """Finish a Schnorr proof from a precomputed nonce commitment.

    v: nonce scalars (..., L); eps = g^v computed by the caller (so it can
    ride the caller's batched fixed-base mul -- one comb instance per phase
    instead of one per proof system).
    """
    fn = curve.fn
    ch = fs_challenge(curve, [eps, X], ids, TAG_POKDLOG, steps)
    rho = F.sub(fn, v, F.mul(fn, ch, x))
    return PoKDLog(eps=eps, rho=rho)


def gen_pokdlog(curve: Curve, key, X, x, ids, steps=None) -> PoKDLog:
    """Prove knowledge of x with X = g^x (`SEAL/bidder.cpp:90-107`).

    Batched over leading axes of x (..., L).
    """
    fn = curve.fn
    v = F.random(fn, key, x.shape[:-1])
    eps = ec.mul_base(curve, v)
    return gen_pokdlog_from(curve, v, eps, X, x, ids, steps)


def ver_pokdlog(curve: Curve, proof: PoKDLog, X, ids, steps=None):
    """Check g^rho * X^ch == eps (`SEAL/bidder.cpp:119-136`). -> bool (...,)."""
    ch = fs_challenge(curve, [proof.eps, X], ids, TAG_POKDLOG, steps)
    lhs = ec.base_mul_add(curve, proof.rho, X, ch)
    return ec.eq(curve, lhs, proof.eps)


# --------------------------------------------------------------------------
# PoWFCom: 2-branch OR proof over the commitment triple
# --------------------------------------------------------------------------

class PoWFCom(NamedTuple):
    """OR-proof that (phi, A, B) commits to a bit (`SEAL/types.h:23-34`)."""

    eps11: jnp.ndarray
    eps12: jnp.ndarray
    eps21: jnp.ndarray
    eps22: jnp.ndarray
    rho1: jnp.ndarray
    rho2: jnp.ndarray
    ch2: jnp.ndarray


def _powfcom_eqs(curve, phi, A, B, s1, t1, s2, t2):
    """The four PoWFCom equations from branch scalars, ONE ladder pass:

    eps11 = g^s1 A^t1 ; eps12 = B^s1 phi^t1
    eps21 = g^s2 A^t2 ; eps22 = B^s2 (phi/g)^t2
    (verifier's checks 1-4, `SEAL/bidder.cpp:255-296`).

    Returns stacked (4, ...): [e11, e12, e21, e22].
    """
    phi_g = _g_minus(curve, phi)
    return _eval_eqs(curve, [
        (None, s1, A, t1),
        (B, s1, phi, t1),
        (None, s2, A, t2),
        (B, s2, phi_g, t2),
    ])


def gen_powfcom(curve: Curve, key, phi, A, B, alpha, bit, ids,
                steps=None) -> PoWFCom:
    """Generate PoWFCom (`SEAL/bidder.cpp:149-226`), branchless over bit.

    The real branch (1 if bit==0 else 2) gets nonce scalars (r1, t=0); the
    simulated branch gets random (rho_sim, ch_sim).  EC work is identical
    for both bits.
    """
    fn = curve.fn
    batch = alpha.shape[:-1]
    r = F.random(fn, key, (3,) + batch)
    r1, rho_sim, ch_sim = r[0], r[1], r[2]
    bit0 = bit == 0

    zero = _zero(r1)
    s1 = _sel(bit0, r1, rho_sim)
    t1 = _sel(bit0, zero, ch_sim)
    s2 = _sel(bit0, rho_sim, r1)
    t2 = _sel(bit0, ch_sim, zero)

    e = _powfcom_eqs(curve, phi, A, B, s1, t1, s2, t2)
    e11, e12, e21, e22 = e[0], e[1], e[2], e[3]
    ch = fs_challenge(
        curve, [e11, e12, e21, e22, phi, A, B], ids, TAG_POWFCOM, steps
    )

    ch_real = F.sub(fn, ch, ch_sim)
    rho_real = F.sub(fn, r1, F.mul(fn, alpha, ch_real))
    return PoWFCom(
        eps11=e11, eps12=e12, eps21=e21, eps22=e22,
        rho1=_sel(bit0, rho_real, rho_sim),
        rho2=_sel(bit0, rho_sim, rho_real),
        ch2=_sel(bit0, ch_sim, ch_real),
    )


def ver_powfcom(curve: Curve, proof: PoWFCom, phi, A, B, ids, steps=None):
    """Verify the four equations (`SEAL/bidder.cpp:241-299`). -> bool (...,)."""
    fn = curve.fn
    ch = fs_challenge(
        curve,
        [proof.eps11, proof.eps12, proof.eps21, proof.eps22, phi, A, B],
        ids, TAG_POWFCOM, steps,
    )
    ch1 = F.sub(fn, ch, proof.ch2)
    got = _powfcom_eqs(
        curve, phi, A, B, proof.rho1, ch1, proof.rho2, proof.ch2
    )
    return _eq_all(
        curve, got,
        [proof.eps11, proof.eps12, proof.eps21, proof.eps22],
    )


def ver_commit_phase(curve: Curve, pok_a, pok_b, powf, phi, A, B, ids,
                     steps=None):
    """Fused commit-phase verifier: both PoKDLogs + the PoWFCom checked
    with ONE base-equation call, ONE dual call, and ONE batched equality
    (same checks as `SEAL/bidder.cpp:1178-1189`, graph-lean).
    -> bool (...,).
    """
    fn = curve.fn
    eps_ab = jnp.stack([pok_a.eps, pok_b.eps])
    x_ab = jnp.stack([A, B])
    ids2 = jnp.broadcast_to(ids, (2,) + ids.shape)
    steps2 = None if steps is None else jnp.broadcast_to(
        jnp.asarray(steps), (2,) + jnp.asarray(steps).shape
    )
    ch_ab = fs_challenge(curve, [eps_ab, x_ab], ids2, TAG_POKDLOG, steps2)
    ch = fs_challenge(
        curve,
        [powf.eps11, powf.eps12, powf.eps21, powf.eps22, phi, A, B],
        ids, TAG_POWFCOM, steps,
    )
    ch1 = F.sub(fn, ch, powf.ch2)
    phi_g = _g_minus(curve, phi)
    got = _eval_eqs(curve, [
        (None, pok_a.rho, A, ch_ab[0]),
        (None, pok_b.rho, B, ch_ab[1]),
        (None, powf.rho1, A, ch1),
        (B, powf.rho1, phi, ch1),
        (None, powf.rho2, A, powf.ch2),
        (B, powf.rho2, phi_g, powf.ch2),
    ])
    return _eq_all(
        curve, got,
        [pok_a.eps, pok_b.eps, powf.eps11, powf.eps12, powf.eps21,
         powf.eps22],
    )


# --------------------------------------------------------------------------
# PoWFStage1: 2-branch OR proof x 4 equations (pre-junction round 2)
# --------------------------------------------------------------------------

class PoWFStage1(NamedTuple):
    """Round-2 well-formedness proof, stage 1 (`SEAL/types.h:41-57`)."""

    eps11: jnp.ndarray
    eps12: jnp.ndarray
    eps13: jnp.ndarray
    eps14: jnp.ndarray
    eps21: jnp.ndarray
    eps22: jnp.ndarray
    eps23: jnp.ndarray
    eps24: jnp.ndarray
    rho11: jnp.ndarray
    rho12: jnp.ndarray
    rho21: jnp.ndarray
    rho22: jnp.ndarray
    ch2: jnp.ndarray


def _stage1_eqs(curve, b, X, Y, R, c, A, B, s11, s12, t1, s21, s22, t2):
    """The eight Stage1 equations in ONE ladder pass (verifier's checks
    1-8, `SEAL/bidder.cpp:487-568`):

    eps11 = g^s11 X^t1   eps12 = g^s12 A^t1
    eps13 = Y^s11 b^t1   eps14 = B^s12 c^t1
    eps21 = g^s21 X^t2   eps22 = g^s22 A^t2
    eps23 = R^s21 b^t2   eps24 = B^s22 (c/g)^t2

    Returns stacked (8, ...) in order e11 e12 e13 e14 e21 e22 e23 e24.
    """
    c_g = _g_minus(curve, c)
    return _eval_eqs(curve, [
        (None, s11, X, t1),
        (None, s12, A, t1),
        (Y, s11, b, t1),
        (B, s12, c, t1),
        (None, s21, X, t2),
        (None, s22, A, t2),
        (R, s21, b, t2),
        (B, s22, c_g, t2),
    ])


def gen_powfstage1(
    curve: Curve, key, X, Y, R, c, A, B, x, alpha, bit, ids, steps=None,
    b=None,
):
    """Generate Stage1 (`SEAL/bidder.cpp:318-451`), branchless over bit.

    b: the round-2 ciphertext Y^x (bit 0) | R^x (bit 1).  When None it is
    computed here first (the reference computes it separately,
    `SEAL/bidder.cpp:1301-1309`); the fused scan driver passes the
    precomputed value so the whole proof is ONE ladder pass.
    Returns (proof, b).
    """
    fn = curve.fn
    batch = x.shape[:-1]
    r = F.random(fn, key, (5,) + batch)
    r11, r12, rho_s1, rho_s2, ch_sim = (r[i] for i in range(5))
    bit0 = bit == 0
    zero = _zero(r11)

    s11 = _sel(bit0, r11, rho_s1)
    s12 = _sel(bit0, r12, rho_s2)
    t1 = _sel(bit0, zero, ch_sim)
    s21 = _sel(bit0, rho_s1, r11)
    s22 = _sel(bit0, rho_s2, r12)
    t2 = _sel(bit0, ch_sim, zero)

    if b is None:
        sel_base = ec.select(bit0, Y, R)
        b = ec.scalar_mul(curve, sel_base, x)
    eqs8 = _stage1_eqs(
        curve, b, X, Y, R, c, A, B, s11, s12, t1, s21, s22, t2
    )
    # order: e11 e12 e13 e14 e21 e22 e23 e24
    eqs = tuple(eqs8[i] for i in range(8))
    ch = fs_challenge(
        curve, list(eqs) + [b, X, Y, R, c, A, B], ids, TAG_STAGE1, steps
    )

    ch_real = F.sub(fn, ch, ch_sim)
    rho_x = F.sub(fn, r11, F.mul(fn, x, ch_real))
    rho_a = F.sub(fn, r12, F.mul(fn, alpha, ch_real))
    proof = PoWFStage1(
        *eqs,
        rho11=_sel(bit0, rho_x, rho_s1),
        rho12=_sel(bit0, rho_a, rho_s2),
        rho21=_sel(bit0, rho_s1, rho_x),
        rho22=_sel(bit0, rho_s2, rho_a),
        ch2=_sel(bit0, ch_sim, ch_real),
    )
    return proof, b


def ver_powfstage1(curve: Curve, proof: PoWFStage1, b, X, Y, R, c, A, B, ids,
                   steps=None):
    """Verify the eight equations (`SEAL/bidder.cpp:470-571`)."""
    fn = curve.fn
    eps = [proof.eps11, proof.eps12, proof.eps13, proof.eps14,
           proof.eps21, proof.eps22, proof.eps23, proof.eps24]
    ch = fs_challenge(
        curve, eps + [b, X, Y, R, c, A, B], ids, TAG_STAGE1, steps
    )
    ch1 = F.sub(fn, ch, proof.ch2)
    got = _stage1_eqs(
        curve, b, X, Y, R, c, A, B,
        proof.rho11, proof.rho12, ch1, proof.rho21, proof.rho22, proof.ch2,
    )
    return _eq_all(
        curve, got,
        [proof.eps11, proof.eps12, proof.eps13, proof.eps14,
         proof.eps21, proof.eps22, proof.eps23, proof.eps24],
    )


# --------------------------------------------------------------------------
# PoWFStage2: 3-branch OR proof x 16 equations (post-junction round 2)
# --------------------------------------------------------------------------

class PoWFStage2(NamedTuple):
    """Round-2 consistency proof, stage 2 (`SEAL/types.h:64-93`).

    Branch 1: bi=1 (=> bj=1); branch 2: bi=0, bj=1; branch 3: bi=bj=0.
    """

    eps11: jnp.ndarray
    eps12: jnp.ndarray
    eps13: jnp.ndarray
    eps11p: jnp.ndarray
    eps12p: jnp.ndarray
    eps13p: jnp.ndarray
    eps21: jnp.ndarray
    eps22: jnp.ndarray
    eps23: jnp.ndarray
    eps21p: jnp.ndarray
    eps22p: jnp.ndarray
    eps23p: jnp.ndarray
    eps31: jnp.ndarray
    eps32: jnp.ndarray
    eps31p: jnp.ndarray
    eps32p: jnp.ndarray
    rho11: jnp.ndarray
    rho12: jnp.ndarray
    rho13: jnp.ndarray
    rho21: jnp.ndarray
    rho22: jnp.ndarray
    rho23: jnp.ndarray
    rho31: jnp.ndarray
    rho32: jnp.ndarray
    ch2: jnp.ndarray
    ch3: jnp.ndarray


def _stage2_eqs(curve, pts, scal):
    """The sixteen Stage2 equations in ONE ladder pass (verifier's checks
    1-16, `SEAL/bidder.cpp:937-1098`).  pts: dict of public points
    (including the ciphertext 'Bi'); scal: dict with per-branch scalars
    s{m}{l} and challenges t{m}.

    Branch m equations (l = slot):
      e{m}1 = g^s{m}1 Xi^t{m}   e{m}2 = g^s{m}2 Xj^t{m}   e{m}3 = g^s{m}3 A^t{m}
      e11' = Ri^s11 Bi^t1   e21' = Yi^s21 Bi^t2   e31' = Yi^s31 Bi^t3
      e12' = Rj^s12 Bj^t1   e22' = Rj^s22 Bj^t2   e32' = Yj^s32 Bj^t3
      e13' = B^s13 (Ci/g)^t1  e23' = B^s23 Ci^t2  (branch 3 has no slot 3)

    Returns stacked (16, ...) in PoWFStage2 field order.
    """
    Xi, Xj, A = pts["Xi"], pts["Xj"], pts["A"]
    Bi, Bj, B = pts["Bi"], pts["Bj"], pts["B"]
    Ri, Rj, Ci = pts["Ri"], pts["Rj"], pts["Ci"]
    Yi, Yj = pts["Yi"], pts["Yj"]
    ci_g = _g_minus(curve, Ci)
    s = scal
    return _eval_eqs(curve, [
        (None, s["s11"], Xi, s["t1"]),
        (None, s["s12"], Xj, s["t1"]),
        (None, s["s13"], A, s["t1"]),
        (Ri, s["s11"], Bi, s["t1"]),
        (Rj, s["s12"], Bj, s["t1"]),
        (B, s["s13"], ci_g, s["t1"]),
        (None, s["s21"], Xi, s["t2"]),
        (None, s["s22"], Xj, s["t2"]),
        (None, s["s23"], A, s["t2"]),
        (Yi, s["s21"], Bi, s["t2"]),
        (Rj, s["s22"], Bj, s["t2"]),
        (B, s["s23"], Ci, s["t2"]),
        (None, s["s31"], Xi, s["t3"]),
        (None, s["s32"], Xj, s["t3"]),
        (Yi, s["s31"], Bi, s["t3"]),
        (Yj, s["s32"], Bj, s["t3"]),
    ])


_STAGE2_FS_PTS = ("Xi", "Xj", "A", "Bi", "Bj", "B", "Ri", "Rj", "Ci", "Yi", "Yj")


def gen_powfstage2(
    curve: Curve, key, pts, xi, xj, alphai, bi, bj, ids, steps=None, b=None
):
    """Generate Stage2 (`SEAL/bidder.cpp:598-890`), branchless over (bi, bj).

    Real branch: 1 if bi==1 (protocol invariant bi=1 => bj=1), 2 if bi==0
    and bj==1, 3 if bi==bj==0.  All simulated responses are uniformly
    random (fixing the reference's zero-rho quirk at `:749-754`).

    pts must NOT contain "Bi": the ciphertext Bi = Yi^xi (bi 0) | Ri^xi
    (bi 1) is taken from `b` when given (fused scan driver: whole proof =
    one ladder pass) or computed here first.  Returns (proof, Bi).
    """
    fn = curve.fn
    batch = xi.shape[:-1]
    r = F.random(fn, key, (14,) + batch)
    r1, r2, r3 = r[0], r[1], r[2]
    sim = {
        (1, 1): r[3], (1, 2): r[4], (1, 3): r[5],
        (2, 1): r[6], (2, 2): r[7], (2, 3): r[8],
        (3, 1): r[9], (3, 2): r[10],
    }
    ch_sim = {1: r[11], 2: r[12], 3: r[13]}

    real1 = bi == 1
    real2 = (bi == 0) & (bj == 1)
    real3 = (bi == 0) & (bj == 0)
    is_real = {1: real1, 2: real2, 3: real3}
    rr = {1: r1, 2: r2, 3: r3}

    zero = _zero(r1)
    scal = {}
    for m in (1, 2, 3):
        slots = (1, 2, 3) if m != 3 else (1, 2)
        for l in slots:
            scal[f"s{m}{l}"] = _sel(is_real[m], rr[l], sim[(m, l)])
        scal[f"t{m}"] = _sel(is_real[m], zero, ch_sim[m])
    # branch 3 has no slot 3; the eq evaluator never reads s33.

    if b is None:
        sel_base = ec.select(bi == 0, pts["Yi"], pts["Ri"])
        b = ec.scalar_mul(curve, sel_base, xi)
    pts = dict(pts, Bi=b)
    eqs16 = _stage2_eqs(curve, pts, scal)
    eqs = tuple(eqs16[i] for i in range(16))
    ch = fs_challenge(
        curve, list(eqs) + [pts[k] for k in _STAGE2_FS_PTS], ids,
        TAG_STAGE2, steps,
    )

    # ch_real = ch - sum of the two simulated branch challenges
    sim_sum = jnp.zeros_like(ch)
    for m in (1, 2, 3):
        sim_sum = F.add(fn, sim_sum, _sel(is_real[m], _zero(ch), ch_sim[m]))
    ch_real = F.sub(fn, ch, sim_sum)

    secrets = {1: xi, 2: xj, 3: alphai}
    rho_real = {
        l: F.sub(fn, rr[l], F.mul(fn, secrets[l], ch_real)) for l in (1, 2, 3)
    }

    out_rho = {}
    for m in (1, 2, 3):
        slots = (1, 2, 3) if m != 3 else (1, 2)
        for l in slots:
            out_rho[f"rho{m}{l}"] = _sel(is_real[m], rho_real[l], sim[(m, l)])
    out_ch = {
        m: _sel(is_real[m], ch_real, ch_sim[m]) for m in (2, 3)
    }

    proof = PoWFStage2(
        *eqs,
        rho11=out_rho["rho11"], rho12=out_rho["rho12"], rho13=out_rho["rho13"],
        rho21=out_rho["rho21"], rho22=out_rho["rho22"], rho23=out_rho["rho23"],
        rho31=out_rho["rho31"], rho32=out_rho["rho32"],
        ch2=out_ch[2], ch3=out_ch[3],
    )
    return proof, b


def ver_powfstage2(curve: Curve, proof: PoWFStage2, pts, ids, steps=None):
    """Verify the sixteen equations (`SEAL/bidder.cpp:913-1101`)."""
    fn = curve.fn
    eps = list(proof[:16])
    ch = fs_challenge(
        curve, eps + [pts[k] for k in _STAGE2_FS_PTS], ids, TAG_STAGE2, steps
    )
    ch1 = F.sub(fn, F.sub(fn, ch, proof.ch2), proof.ch3)
    scal = {
        "s11": proof.rho11, "s12": proof.rho12, "s13": proof.rho13,
        "s21": proof.rho21, "s22": proof.rho22, "s23": proof.rho23,
        "s31": proof.rho31, "s32": proof.rho32,
        "t1": ch1, "t2": proof.ch2, "t3": proof.ch3,
    }
    got = _stage2_eqs(curve, pts, scal)
    return _eq_all(curve, got, eps)
