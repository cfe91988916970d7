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
All equations of a proof batch (bidders x bits x equations) are evaluated
in a few large `ec.base_mul_add` / `ec.dual_mul` calls, and OR-proof branch
selection is branchless scalar selects *before* the EC work -- the real and
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

def _eval_base_eqs(curve: Curve, bases, s_list, t_list):
    """Evaluate equations  g^s_k * bases_k^t_k  for k equations at once.

    bases/s/t: lists of (..., 3, L) / (..., L); stacked along a new leading
    axis so the whole group rides one doubling chain batch.
    Returns the stacked (k, ..., 3, L) result.
    """
    B = jnp.stack(bases)
    S = jnp.stack(s_list)
    T = jnp.stack(t_list)
    return ec.base_mul_add(curve, S, B, T)


def _eval_dual_eqs(curve: Curve, bases1, s_list, bases2, t_list):
    """Evaluate equations  bases1_k^s_k * bases2_k^t_k  batched (stacked)."""
    P = jnp.stack(bases1)
    S = jnp.stack(s_list)
    Q = jnp.stack(bases2)
    T = jnp.stack(t_list)
    return ec.dual_mul(curve, P, S, Q, T)


def _eq_all(curve: Curve, got_base, got_dual, eps_base, eps_dual):
    """Compare all equations against published eps in ONE batched ec.eq.

    got_*: stacked (k, ..., 3, L); eps_*: lists of (..., 3, L).
    Returns (...,) bool (AND over every equation).
    """
    got = jnp.concatenate([got_base, got_dual], axis=0)
    want = jnp.stack(eps_base + eps_dual)
    return ec.eq(curve, got, want).all(axis=0)


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
    """The four PoWFCom equations from branch scalars.

    eps11 = g^s1 A^t1 ; eps12 = B^s1 phi^t1
    eps21 = g^s2 A^t2 ; eps22 = B^s2 (phi/g)^t2
    (verifier's checks 1-4, `SEAL/bidder.cpp:255-296`).

    Returns (base_eqs (2, ...), dual_eqs (2, ...)) stacked:
    base_eqs = [e11, e21], dual_eqs = [e12, e22].
    """
    phi_g = _g_minus(curve, phi)
    gb = _eval_base_eqs(curve, [A, A], [s1, s2], [t1, t2])
    gd = _eval_dual_eqs(curve, [B, B], [s1, s2], [phi, phi_g], [t1, t2])
    return gb, gd


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

    gb, gd = _powfcom_eqs(curve, phi, A, B, s1, t1, s2, t2)
    e11, e21, e12, e22 = gb[0], gb[1], gd[0], gd[1]
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
    gb, gd = _powfcom_eqs(
        curve, phi, A, B, proof.rho1, ch1, proof.rho2, proof.ch2
    )
    return _eq_all(
        curve, gb, gd,
        [proof.eps11, proof.eps21], [proof.eps12, proof.eps22],
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
    gb = _eval_base_eqs(
        curve,
        [A, B, A, A],
        [pok_a.rho, pok_b.rho, powf.rho1, powf.rho2],
        [ch_ab[0], ch_ab[1], ch1, powf.ch2],
    )
    gd = _eval_dual_eqs(
        curve, [B, B], [powf.rho1, powf.rho2], [phi, phi_g], [ch1, powf.ch2]
    )
    return _eq_all(
        curve, gb, gd,
        [pok_a.eps, pok_b.eps, powf.eps11, powf.eps21],
        [powf.eps12, powf.eps22],
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
    """The eight Stage1 equations (verifier's checks 1-8,
    `SEAL/bidder.cpp:487-568`):

    eps11 = g^s11 X^t1   eps12 = g^s12 A^t1
    eps13 = Y^s11 b^t1   eps14 = B^s12 c^t1
    eps21 = g^s21 X^t2   eps22 = g^s22 A^t2
    eps23 = R^s21 b^t2   eps24 = B^s22 (c/g)^t2

    Returns (base_eqs (4, ...) = [e11,e12,e21,e22],
             dual_eqs (4, ...) = [e13,e14,e23,e24]) stacked.
    """
    c_g = _g_minus(curve, c)
    gb = _eval_base_eqs(
        curve, [X, A, X, A], [s11, s12, s21, s22], [t1, t1, t2, t2]
    )
    gd = _eval_dual_eqs(
        curve,
        [Y, B, R, B], [s11, s12, s21, s22],
        [b, c, b, c_g], [t1, t1, t2, t2],
    )
    return gb, gd


def gen_powfstage1(
    curve: Curve, key, X, Y, R, c, A, B, x, alpha, bit, ids, steps=None
):
    """Generate Stage1 (`SEAL/bidder.cpp:318-451`), branchless over bit.

    Computes the round-2 ciphertext b = Y^x (bit 0) | R^x (bit 1) itself,
    as an extra lane of the batched base-equation call (the reference
    computes it separately at `SEAL/bidder.cpp:1301-1309`).
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

    # ciphertext lane: b = sel^x (g^0 * sel^x)
    sel_base = ec.select(bit0, Y, R)
    gb5 = _eval_base_eqs(
        curve,
        [X, A, X, A, sel_base],
        [s11, s12, s21, s22, _zero(x)],
        [t1, t1, t2, t2, x],
    )
    b = gb5[4]
    c_g = _g_minus(curve, c)
    gd = _eval_dual_eqs(
        curve,
        [Y, B, R, B], [s11, s12, s21, s22],
        [b, c, b, c_g], [t1, t1, t2, t2],
    )
    gb = gb5[:4]
    # order: e11 e12 e13 e14 e21 e22 e23 e24
    eqs = (gb[0], gb[1], gd[0], gd[1], gb[2], gb[3], gd[2], gd[3])
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
    gb, gd = _stage1_eqs(
        curve, b, X, Y, R, c, A, B,
        proof.rho11, proof.rho12, ch1, proof.rho21, proof.rho22, proof.ch2,
    )
    return _eq_all(
        curve, gb, gd,
        [proof.eps11, proof.eps12, proof.eps21, proof.eps22],
        [proof.eps13, proof.eps14, proof.eps23, proof.eps24],
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
    """The sixteen Stage2 equations (verifier's checks 1-16,
    `SEAL/bidder.cpp:937-1098`).  pts: dict of public points; scal: dict
    with per-branch scalars s{m}{l} and challenges t{m}.

    Branch m equations (l = slot):
      e{m}1 = g^s{m}1 Xi^t{m}   e{m}2 = g^s{m}2 Xj^t{m}   e{m}3 = g^s{m}3 A^t{m}
      e11' = Ri^s11 Bi^t1   e21' = Yi^s21 Bi^t2   e31' = Yi^s31 Bi^t3
      e12' = Rj^s12 Bj^t1   e22' = Rj^s22 Bj^t2   e32' = Yj^s32 Bj^t3
      e13' = B^s13 (Ci/g)^t1  e23' = B^s23 Ci^t2  (branch 3 has no slot 3)
    """
    gb = _stage2_base_eqs(curve, pts, scal)
    gd = _stage2_dual_eqs(curve, pts, scal)
    return gb, gd


def _stage2_base_eqs(curve, pts, scal, extra_bases=(), extra_s=(), extra_t=()):
    """The eight fixed-base Stage2 equations (+ optional extra lanes)."""
    Xi, Xj, A = pts["Xi"], pts["Xj"], pts["A"]
    return _eval_base_eqs(
        curve,
        [Xi, Xj, A, Xi, Xj, A, Xi, Xj] + list(extra_bases),
        [scal["s11"], scal["s12"], scal["s13"],
         scal["s21"], scal["s22"], scal["s23"],
         scal["s31"], scal["s32"]] + list(extra_s),
        [scal["t1"], scal["t1"], scal["t1"],
         scal["t2"], scal["t2"], scal["t2"],
         scal["t3"], scal["t3"]] + list(extra_t),
    )


def _stage2_dual_eqs(curve, pts, scal):
    """The eight dual-base Stage2 equations (need pts['Bi'])."""
    Bi, Bj, B = pts["Bi"], pts["Bj"], pts["B"]
    Ri, Rj, Ci, Yi, Yj = pts["Ri"], pts["Rj"], pts["Ci"], pts["Yi"], pts["Yj"]
    ci_g = _g_minus(curve, Ci)
    return _eval_dual_eqs(
        curve,
        [Ri, Rj, B, Yi, Rj, B, Yi, Yj],
        [scal["s11"], scal["s12"], scal["s13"],
         scal["s21"], scal["s22"], scal["s23"],
         scal["s31"], scal["s32"]],
        [Bi, Bj, ci_g, Bi, Bj, Ci, Bi, Bj],
        [scal["t1"], scal["t1"], scal["t1"],
         scal["t2"], scal["t2"], scal["t2"],
         scal["t3"], scal["t3"]],
    )


def _stage2_unpack(gb, gd):
    """(base (8,...), dual (8,...)) -> the 16 eps in PoWFStage2 field order."""
    return (gb[0], gb[1], gb[2], gd[0], gd[1], gd[2],
            gb[3], gb[4], gb[5], gd[3], gd[4], gd[5],
            gb[6], gb[7], gd[6], gd[7])


_STAGE2_FS_PTS = ("Xi", "Xj", "A", "Bi", "Bj", "B", "Ri", "Rj", "Ci", "Yi", "Yj")


def gen_powfstage2(
    curve: Curve, key, pts, xi, xj, alphai, bi, bj, ids, steps=None
):
    """Generate Stage2 (`SEAL/bidder.cpp:598-890`), branchless over (bi, bj).

    Real branch: 1 if bi==1 (protocol invariant bi=1 => bj=1), 2 if bi==0
    and bj==1, 3 if bi==bj==0.  All simulated responses are uniformly
    random (fixing the reference's zero-rho quirk at `:749-754`).

    pts must NOT contain "Bi": the ciphertext Bi = Yi^xi (bi 0) | Ri^xi
    (bi 1) is computed here as an extra lane of the batched base-equation
    call.  Returns (proof, Bi).
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

    sel_base = ec.select(bi == 0, pts["Yi"], pts["Ri"])
    gb9 = _stage2_base_eqs(
        curve, pts, scal,
        extra_bases=[sel_base], extra_s=[_zero(xi)], extra_t=[xi],
    )
    b = gb9[8]
    pts = dict(pts, Bi=b)
    gb = gb9[:8]
    gd = _stage2_dual_eqs(curve, pts, scal)
    eqs = _stage2_unpack(gb, gd)
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
    gb, gd = _stage2_eqs(curve, pts, scal)
    eps_base = [eps[0], eps[1], eps[2], eps[6], eps[7], eps[8],
                eps[12], eps[13]]
    eps_dual = [eps[3], eps[4], eps[5], eps[9], eps[10], eps[11],
                eps[14], eps[15]]
    return _eq_all(curve, gb, gd, eps_base, eps_dual)
