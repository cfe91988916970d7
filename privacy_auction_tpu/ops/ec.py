"""Batched elliptic-curve point operations for TPU.

Design (TPU-first):
  * Points are projective (X:Y:Z) limb arrays of shape ``(..., 3, 16)``
    uint32; Z == 0 encodes the point at infinity (canonically (0:1:0)).
  * All group law evaluations use the *complete* addition formulas of
    Renes-Costello-Batina (EUROCRYPT 2016) specialized to a = 0
    (Algorithms 7 and 9): a single branchless code path that is correct
    for P+Q, P+P, P+(-P), and the identity -- exactly what a SIMD/SPMD
    machine wants.  No data-dependent control flow anywhere.
  * Variable-base scalar mult: fixed 4-bit windows (constant-time shape).
  * Fixed-base scalar mult: 4-bit comb over a host-precomputed table of the
    generator (64 windows x 16 entries), 64 complete adds, zero doublings.

Reference parity: provides the capabilities the reference gets from OpenSSL
EC_POINT_* (`/root/reference/SEAL/bidder.cpp:1131-1138` EC_POINT_mul,
`:1286-1299` EC_POINT_add/invert, `SEAL/hash.cpp:27-33` point2oct).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import COMB_SIZE, COMB_WINDOW, COMB_WINDOWS, Curve
from . import field as F

LIMBS = F.LIMBS

# Pallas kernel dispatch: "auto" uses the fused VMEM ladders on TPU and the
# pure-XLA path elsewhere; "1"/"0" force it on/off (tests pin both paths).
_PALLAS_MODE = os.environ.get("PA_TPU_PALLAS", "auto")


def _use_pallas() -> bool:
    if _PALLAS_MODE == "0":
        return False
    if _PALLAS_MODE == "1":
        return True
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _pallas_ok(curve: Curve) -> bool:
    """The fused VMEM ladders cover a=0 curves with fold-friendly base
    fields (secp256k1); other curves (P-256: a != 0, Barrett modulus) run
    the pure-XLA path."""
    return _use_pallas() and curve.a_is_zero and F._fast_k0(curve.fp) is not None


# --------------------------------------------------------------------------
# construction / predicates
# --------------------------------------------------------------------------

def infinity(batch_shape=()) -> jnp.ndarray:
    """The point at infinity (0:1:0), broadcast to a batch."""
    one = np.zeros((3, LIMBS), np.uint32)
    one[1, 0] = 1
    return jnp.broadcast_to(jnp.asarray(one), batch_shape + (3, LIMBS))


def from_affine(x, y):
    """Affine limb coordinates -> projective point (Z=1)."""
    z = jnp.zeros_like(x).at[..., 0].set(1)
    return jnp.stack([x, y, z], axis=-2)


def is_infinity(P):
    return F.is_zero(P[..., 2, :])


def select(cond, P, Q):
    """Branchless point select: cond (...,) -> (..., 3, 16)."""
    return jnp.where(cond[..., None, None], P, Q)


def neg(curve: Curve, P):
    """-(X:Y:Z) = (X:-Y:Z)."""
    y = P[..., 1, :]
    ny = F.select(F.is_zero(y), y, F.sub(curve.fp, jnp.zeros_like(y), y))
    return jnp.stack([P[..., 0, :], ny, P[..., 2, :]], axis=-2)


def eq(curve: Curve, P, Q):
    """Projective equality (EC_POINT_cmp equivalent): cross-multiplied."""
    fp = curve.fp
    x1, y1, z1 = P[..., 0, :], P[..., 1, :], P[..., 2, :]
    x2, y2, z2 = Q[..., 0, :], Q[..., 1, :], Q[..., 2, :]
    ex = F.eq(F.mul(fp, x1, z2), F.mul(fp, x2, z1))
    ey = F.eq(F.mul(fp, y1, z2), F.mul(fp, y2, z1))
    return ex & ey


# --------------------------------------------------------------------------
# group law (complete formulas)
# --------------------------------------------------------------------------

def _add_generic(curve: Curve, P, Q):
    """Complete projective addition for arbitrary a (RCB16 Algorithm 1).

    12 field muls + 3 a-muls + 2 b3-muls, grouped into four batched mul
    dispatches.  a and 3b are full field constants (P-256's are
    full-width, so the a=0 small-constant shortcut cannot apply).
    """
    fp = curve.fp
    a = F.const(curve.a_limbs)
    b3 = F.const(curve.b3_limbs)
    X1, Y1, Z1 = P[..., 0, :], P[..., 1, :], P[..., 2, :]
    X2, Y2, Z2 = Q[..., 0, :], Q[..., 1, :], Q[..., 2, :]

    pre = F.add(
        fp,
        jnp.stack([X1, X2, Y1, Y2, X1, X2]),
        jnp.stack([Y1, Y2, Z1, Z2, Z1, Z2]),
    )
    g1 = F.mul(
        fp,
        jnp.stack([X1, Y1, Z1, pre[0], pre[2], pre[4]]),
        jnp.stack([X2, Y2, Z2, pre[1], pre[3], pre[5]]),
    )
    t0, t1, t2, u1, u2, u3 = (g1[i] for i in range(6))
    s = F.add(fp, jnp.stack([t0, t1, t0]), jnp.stack([t1, t2, t2]))
    d = F.sub(fp, jnp.stack([u1, u2, u3]), s)
    t3 = d[0]   # X1Y2 + X2Y1
    t5 = d[1]   # Y1Z2 + Y2Z1
    t4 = d[2]   # X1Z2 + X2Z1

    # constant muls: a*t4, b3*t2, a*t2, b3*t4
    an = jnp.broadcast_to(a, t4.shape)
    bn = jnp.broadcast_to(b3, t4.shape)
    g2 = F.mul(
        fp, jnp.stack([an, bn, an, bn]), jnp.stack([t4, t2, t2, t4])
    )
    at4, bt2, at2, bt4 = (g2[i] for i in range(4))

    Z3p = F.add(fp, at4, bt2)            # a*t4 + b3*t2
    X3p = F.sub(fp, t1, Z3p)
    Z3q = F.add(fp, t1, Z3p)
    t1n = F.add(fp, F.mul_small(fp, t0, 3), at2)   # 3*t0 + a*t2
    t2m = F.sub(fp, t0, at2)             # t0 - a*t2

    g3 = F.mul(fp, jnp.stack([an, X3p]), jnp.stack([t2m, Z3q]))
    t4n = F.add(fp, bt4, g3[0])          # b3*t4 + a*(t0 - a*t2)
    y3p = g3[1]                          # X3p * Z3q

    g4 = F.mul(
        fp,
        jnp.stack([t1n, t5, t3, t3, t5]),
        jnp.stack([t4n, t4n, X3p, t1n, Z3q]),
    )
    Y3 = F.add(fp, y3p, g4[0])
    X3 = F.sub(fp, g4[2], g4[1])
    Z3 = F.add(fp, g4[4], g4[3])
    return jnp.stack([X3, Y3, Z3], axis=-2)


def _dbl_generic(curve: Curve, P):
    """Complete projective doubling for arbitrary a (RCB16 Algorithm 3)."""
    fp = curve.fp
    a = F.const(curve.a_limbs)
    b3 = F.const(curve.b3_limbs)
    X, Y, Z = P[..., 0, :], P[..., 1, :], P[..., 2, :]

    g1 = F.mul(
        fp, jnp.stack([X, Y, Z, X, X, Y]), jnp.stack([X, Y, Z, Y, Z, Z])
    )
    t0, t1, t2, xy, xz, yz = (g1[i] for i in range(6))
    t3 = F.add(fp, xy, xy)               # 2XY
    z3t = F.add(fp, xz, xz)              # 2XZ

    an = jnp.broadcast_to(a, t2.shape)
    bn = jnp.broadcast_to(b3, t2.shape)
    g2 = F.mul(
        fp, jnp.stack([an, bn, an, bn]), jnp.stack([z3t, t2, t2, z3t])
    )
    az3, bt2, at2, bz3 = (g2[i] for i in range(4))

    Y3p = F.add(fp, az3, bt2)            # a*2XZ + b3*Z^2
    X3p = F.sub(fp, t1, Y3p)
    Y3q = F.add(fp, t1, Y3p)
    t3m = F.sub(fp, t0, at2)             # X^2 - a*Z^2
    t0n = F.add(fp, F.mul_small(fp, t0, 3), at2)   # 3X^2 + a*Z^2
    t2c = F.add(fp, yz, yz)              # 2YZ

    g3 = F.mul(fp, jnp.stack([an, X3p]), jnp.stack([t3m, Y3q]))
    t3n = F.add(fp, g3[0], bz3)          # a*(X^2 - aZ^2) + b3*2XZ
    y3p = g3[1]                          # X3p * Y3q

    g4 = F.mul(
        fp,
        jnp.stack([t0n, t2c, t3, t2c]),
        jnp.stack([t3n, t3n, X3p, t1]),
    )
    Y3 = F.add(fp, y3p, g4[0])
    X3 = F.sub(fp, g4[2], g4[1])
    Z3 = F.mul_small(fp, g4[3], 4)       # 8 Y^3 Z
    return jnp.stack([X3, Y3, Z3], axis=-2)


def add(curve: Curve, P, Q):
    """Complete projective addition (RCB16 Algorithm 7, a=0; Algorithm 1
    for arbitrary a).

    12 field muls + 3 small-constant muls; branchless and total.  The muls
    are grouped into two batched calls of six (stacked along a new leading
    axis) so the limb matmuls are large and the XLA graph stays small --
    per-op compile time and MXU utilization both improve ~6x over naive
    sequencing.
    """
    if not curve.a_is_zero:
        return _add_generic(curve, P, Q)
    fp = curve.fp
    b3 = curve.b3
    X1, Y1, Z1 = P[..., 0, :], P[..., 1, :], P[..., 2, :]
    X2, Y2, Z2 = Q[..., 0, :], Q[..., 1, :], Q[..., 2, :]

    # pre-sums for the Karatsuba-style cross terms (one batched add)
    pre = F.add(
        fp,
        jnp.stack([X1, X2, Y1, Y2, X1, X2]),
        jnp.stack([Y1, Y2, Z1, Z2, Z1, Z2]),
    )
    a12, a34, a56 = pre[0:2], pre[2:4], pre[4:6]

    # mul group 1: t0=X1X2, t1=Y1Y2, t2=Z1Z2, u1..u3 = cross products
    g1 = F.mul(
        fp,
        jnp.stack([X1, Y1, Z1, a12[0], a34[0], a56[0]]),
        jnp.stack([X2, Y2, Z2, a12[1], a34[1], a56[1]]),
    )
    t0, t1, t2, u1, u2, u3 = (g1[i] for i in range(6))

    # pairwise sums then cross-term extraction (batched add / sub)
    s = F.add(fp, jnp.stack([t0, t1, t0]), jnp.stack([t1, t2, t2]))
    d = F.sub(fp, jnp.stack([u1, u2, u3]), s)
    t3 = d[0]   # X1Y2 + X2Y1
    t4 = d[1]   # Y1Z2 + Y2Z1
    y3 = d[2]   # X1Z2 + X2Z1

    # small-constant muls in one call: 3*t0, b3*t2, b3*y3
    sm = F.mul_small_vec(fp, jnp.stack([t0, t2, y3]), [3, b3, b3])
    t0_3, t2b, y3b = sm[0], sm[1], sm[2]

    z3p = F.add(fp, t1, t2b)
    t1m = F.sub(fp, t1, t2b)

    # mul group 2
    g2 = F.mul(
        fp,
        jnp.stack([t4, t3, y3b, t1m, t0_3, z3p]),
        jnp.stack([y3b, t1m, t0_3, z3p, t3, t4]),
    )
    X3 = F.sub(fp, g2[1], g2[0])
    fin = F.add(fp, jnp.stack([g2[3], g2[5]]), jnp.stack([g2[2], g2[4]]))
    return jnp.stack([X3, fin[0], fin[1]], axis=-2)


def dbl(curve: Curve, P):
    """Complete projective doubling (RCB16 Algorithm 9, a=0; Algorithm 3
    for arbitrary a).

    8 field muls + small-constant muls, grouped into two batched calls of
    four (see add() for rationale).
    """
    if not curve.a_is_zero:
        return _dbl_generic(curve, P)
    fp = curve.fp
    b3 = curve.b3
    b9 = 3 * b3
    assert b9 < (1 << 16)
    X, Y, Z = P[..., 0, :], P[..., 1, :], P[..., 2, :]

    # mul group 1: t0=Y^2, t1=YZ, t2=Z^2, xy=XY
    g1 = F.mul(fp, jnp.stack([Y, Y, Z, X]), jnp.stack([Y, Z, Z, Y]))
    t0, t1, t2, xy = (g1[i] for i in range(4))

    # small-constant muls: 8*t0 (=Z3 pre), b3*t2, 9b*t2
    sm = F.mul_small_vec(fp, jnp.stack([t0, t2, t2]), [8, b3, b9])
    z3a, t2b, t2c = sm[0], sm[1], sm[2]

    y3a = F.add(fp, t0, t2b)
    t0m = F.sub(fp, t0, t2c)        # Y^2 - 9bZ^2

    # mul group 2: X3a = 3bZ^2 * 8Y^2, Z3 = YZ * 8Y^2, Y3b = t0m*y3a, xym = t0m*xy
    g2 = F.mul(
        fp, jnp.stack([t2b, t1, t0m, t0m]), jnp.stack([z3a, z3a, y3a, xy])
    )
    fin = F.add(fp, jnp.stack([g2[0], g2[3]]), jnp.stack([g2[2], g2[3]]))
    Y3 = fin[0]                      # X3a + Y3b
    X3 = fin[1]                      # 2 * t0m * xy
    return jnp.stack([X3, Y3, g2[1]], axis=-2)


# --------------------------------------------------------------------------
# scalar multiplication
# --------------------------------------------------------------------------

def _window_digits(k):
    """All 64 4-bit window digits of scalar limbs k: (64, ...) uint32,
    least-significant window first."""
    shifts = jnp.arange(0, 16, COMB_WINDOW, dtype=jnp.uint32)  # (4,)
    d = (k[..., :, None] >> shifts) & jnp.uint32(0xF)  # (..., 16, 4)
    d = d.reshape(k.shape[:-1] + (COMB_WINDOWS,))
    return jnp.moveaxis(d, -1, 0)


def _dbl4(curve: Curve, acc):
    return jax.lax.fori_loop(0, COMB_WINDOW, lambda _, a: dbl(curve, a), acc)


def scalar_mul(curve: Curve, P, k):
    """Variable-base scalar mult k*P, batched; constant-time shape.

    On curves with an efficient endomorphism (secp256k1) this runs the
    GLV split ladder: k*P = k1*P + k2*phi(P) with 128-bit k1, k2 -- half
    the doubling chain of the plain ladder.  Otherwise fixed 4-bit
    windows: a per-lane 16-entry table (14 complete adds via scan), then
    64 iterations of 4 doublings + table add.  Equivalent of
    EC_POINT_mul(group, r, NULL, P, k) (`/root/reference/SEAL/bidder.cpp:129`).
    """
    if curve.glv is not None:
        return _glv_scalar_mul(curve, P, k)
    if _pallas_ok(curve):
        from . import pallas_ec
        return pallas_ec.scalar_mul(curve, P, k)
    batch = P.shape[:-2]
    table = _build_table(curve, P)  # (16, ..., 3, L)
    digits = _window_digits(k)

    def body(i, acc):
        w = (COMB_WINDOWS - 1) - i
        acc = _dbl4(curve, acc)
        digit = jax.lax.dynamic_index_in_dim(digits, w, 0, keepdims=False)
        entry = _select_entry(table, digit)
        return add(curve, acc, entry)

    return jax.lax.fori_loop(0, COMB_WINDOWS, body, infinity(batch))


def _select_entry(table, digit):
    """Constant-shape table[digit] lookup via XLA gather.

    table: (E, 3, L) shared or (E, batch..., 3, L) per-lane; digit (...,).
    A single gather keeps the graph tiny; on TPU the vector gather's timing
    does not depend on the index values.
    """
    if table.ndim == 3:
        return jnp.take(table, digit, axis=0)
    t = jnp.moveaxis(table, 0, -3)  # batch... + (E, 3, L)
    idx = digit[..., None, None, None].astype(jnp.int32)
    return jnp.take_along_axis(t, idx, axis=-3).squeeze(-3)


def _build_table(curve: Curve, P):
    """Per-lane 16-entry window table [inf, P, 2P, ..., 15P]."""
    batch = P.shape[:-2]

    def tab_step(prev, _):
        nxt = add(curve, prev, P)
        return nxt, nxt

    _, rest = jax.lax.scan(tab_step, P, None, length=COMB_SIZE - 2)
    return jnp.concatenate([infinity((1,) + batch), P[None], rest], axis=0)


# --------------------------------------------------------------------------
# GLV endomorphism acceleration (secp256k1)
# --------------------------------------------------------------------------

def glv_decompose(curve: Curve, k):
    """Branchless device GLV split: k (..., 16) mod n ->
    (|k1| limbs, k1<0, |k2| limbs, k2<0) with k1 + k2*lam = k mod n and
    |ki| < 2**132 (GLV_WINDOWS 4-bit windows).

    c_i = round(k * g_i / 2**272) via one wide limb product + a rounding
    bit + a limb shift; the signed lattice combination runs entirely in
    mod-n arithmetic (|ki| << n/2, so the representative's half-range
    determines sign and magnitude exactly).  Every multi-op phase is a
    single stacked dispatch (the two g-products, the four basis products,
    the two half-range compares).
    """
    glv = curve.glv
    fn = curve.fn
    batch = k.shape[:-1]

    g12 = jnp.asarray(np.stack([glv.g1_limbs, glv.g2_limbs]))  # (2, 10)
    prod = F._mul_raw(
        jnp.broadcast_to(k, (2,) + batch + (F.LIMBS,)),
        jnp.broadcast_to(
            g12.reshape((2,) + (1,) * len(batch) + (10,)),
            (2,) + batch + (10,),
        ),
    )                                                  # (2, ..., 26)
    rnd = prod.at[..., 16].add(jnp.uint32(0x8000))     # + 2**271
    digits, _ = F._propagate(rnd)
    c = F._pad_to(digits[..., 17:], F.LIMBS)           # >> 272: (2, ..., 16)
    c1, c2 = c[0], c[1]

    consts = np.stack(
        [glv.a1n_limbs, glv.a2n_limbs, glv.b1n_limbs, glv.b2n_limbs]
    )
    m = F.mul(
        fn,
        jnp.stack([c1, c2, c1, c2]),
        jnp.broadcast_to(
            jnp.asarray(consts).reshape((4,) + (1,) * len(batch) + (F.LIMBS,)),
            (4,) + batch + (F.LIMBS,),
        ),
    )
    sums = F.add(fn, jnp.stack([m[0], m[2]]), jnp.stack([m[1], m[3]]))
    km = F.sub(
        fn,
        jnp.stack([k, jnp.zeros_like(k)]),
        sums,
    )                                                  # (2, ..., 16)

    half = F.const(curve.host.n // 2, (2,) + batch)
    _, borrow = F._sub_raw(half, km)                   # borrow=1 iff km > half
    negf = borrow == 1
    mag = F.select(negf, F.sub(fn, jnp.zeros_like(km), km), km)
    return mag[0], negf[0], mag[1], negf[1]


def endo_apply(curve: Curve, P):
    """The GLV endomorphism phi(X:Y:Z) = (beta*X : Y : Z) = lam * P."""
    beta = F.const(curve.glv.beta_limbs, P.shape[:-2])
    return jnp.stack(
        [F.mul(curve.fp, P[..., 0, :], beta), P[..., 1, :], P[..., 2, :]],
        axis=-2,
    )


def _multi_ladder(curve: Curve, Ps, ks, windows: int):
    """Shared-doubling Straus ladder over S stacked sources.

    Ps: (S, batch..., 3, L); ks: list of S scalar limb arrays; single
    point-add instance in the interleaved loop body (see dual_mul
    rationale).
    """
    S = Ps.shape[0]
    batch = Ps.shape[1:-2]
    tables = _build_table(curve, Ps)  # (16, S, batch..., 3, L)
    flat = tables.reshape((COMB_SIZE * S,) + tables.shape[2:])
    digs = jnp.stack(
        [jnp.broadcast_to(_window_digits(k)[:windows], (windows,) + batch)
         for k in ks],
        axis=1,
    )  # (windows, S, batch...)

    def body(i, acc):
        w = (windows - 1) - (i // S)
        par = i % S
        acc = jax.lax.cond(par == 0, lambda a: _dbl4(curve, a), lambda a: a, acc)
        dw = jax.lax.dynamic_index_in_dim(digs, w, 0, keepdims=False)
        dig = jax.lax.dynamic_index_in_dim(dw, par, 0, keepdims=False)
        entry = _select_entry(flat, dig * S + par.astype(jnp.uint32))
        return add(curve, acc, entry)

    return jax.lax.fori_loop(0, S * windows, body, infinity(batch))


def _glv_split_point(curve: Curve, P, k):
    """Decompose k and sign-adjust (P, phi(P)): returns (P1, k1, P2, k2,
    neg-flags (s1, s2)) with k*P = k1*P1 + k2*P2, |ki| < 2**132."""
    k1, s1, k2, s2 = glv_decompose(curve, k)
    P1 = select(s1, neg(curve, P), P)
    P2full = endo_apply(curve, P)
    P2 = select(s2, neg(curve, P2full), P2full)
    return P1, k1, P2, k2, s1, s2


def _glv_scalar_mul(curve: Curve, P, k):
    """k*P as k1*P + k2*phi(P): half-length shared-doubling ladder."""
    from ..curves import GLV_WINDOWS

    batch = jnp.broadcast_shapes(P.shape[:-2], k.shape[:-1])
    P = jnp.broadcast_to(P, batch + (3, LIMBS))
    k = jnp.broadcast_to(k, batch + (LIMBS,))
    P1, k1, P2, k2, _, _ = _glv_split_point(curve, P, k)
    if _pallas_ok(curve):
        from . import pallas_ec
        return pallas_ec.dual_mul_windows(curve, P1, k1, P2, k2, GLV_WINDOWS)
    return _multi_ladder(
        curve, jnp.stack([P1, P2]), [k1, k2], GLV_WINDOWS
    )


def _glv_dual_mul(curve: Curve, P, kp, Q, kq):
    """kp*P + kq*Q as a four-half-scalar shared-doubling ladder."""
    from ..curves import GLV_WINDOWS

    batch = jnp.broadcast_shapes(
        P.shape[:-2], Q.shape[:-2], kp.shape[:-1], kq.shape[:-1]
    )
    P = jnp.broadcast_to(P, batch + (3, LIMBS))
    Q = jnp.broadcast_to(Q, batch + (3, LIMBS))
    kp = jnp.broadcast_to(kp, batch + (LIMBS,))
    kq = jnp.broadcast_to(kq, batch + (LIMBS,))
    P1, kp1, P2, kp2, _, _ = _glv_split_point(curve, P, kp)
    Q1, kq1, Q2, kq2, _, _ = _glv_split_point(curve, Q, kq)
    if _pallas_ok(curve):
        from . import pallas_ec
        return pallas_ec.quad_mul_windows(
            curve, P1, kp1, P2, kp2, Q1, kq1, Q2, kq2, GLV_WINDOWS
        )
    return _multi_ladder(
        curve, jnp.stack([P1, P2, Q1, Q2]), [kp1, kp2, kq1, kq2],
        GLV_WINDOWS,
    )


def _glv_base_mul_add(curve: Curve, s, P, t):
    """g^s * P^t with both scalars endomorphism-split (four half-length
    scalars over one shared doubling chain)."""
    from ..curves import GLV_WINDOWS

    batch = jnp.broadcast_shapes(P.shape[:-2], s.shape[:-1], t.shape[:-1])
    P = jnp.broadcast_to(P, batch + (3, LIMBS))
    s = jnp.broadcast_to(s, batch + (LIMBS,))
    t = jnp.broadcast_to(t, batch + (LIMBS,))
    P1, t1, P2, t2, _, _ = _glv_split_point(curve, P, t)
    s1, ss1, s2, ss2 = glv_decompose(curve, s)
    if _pallas_ok(curve):
        from . import pallas_ec
        sflags = jnp.stack(
            [ss1.astype(jnp.uint32), ss2.astype(jnp.uint32)], axis=-1
        )
        return pallas_ec.base_mul_add_glv(
            curve, P1, t1, P2, t2, s1, s2, sflags, GLV_WINDOWS
        )
    G = from_affine(
        jnp.asarray(curve.generator_affine[0]),
        jnp.asarray(curve.generator_affine[1]),
    )
    G = jnp.broadcast_to(G, batch + (3, LIMBS))
    Gl = endo_apply(curve, G)
    G1 = select(ss1, neg(curve, G), G)
    G2 = select(ss2, neg(curve, Gl), Gl)
    return _multi_ladder(
        curve, jnp.stack([G1, G2, P1, P2]), [s1, s2, t1, t2], GLV_WINDOWS
    )


def dual_mul(curve: Curve, P, kp, Q, kq):
    """Shamir/Straus joint scalar mult s*P + t*Q, batched.

    One shared doubling chain (4 doublings per window) with two table adds
    per window: ~40% fewer point ops than two independent scalar_mul calls.
    This is the workhorse of NIZK verification, where every check is of the
    form eps == base1^rho * base2^ch
    (`/root/reference/SEAL/bidder.cpp:255-296,487-568,937-1098`).

    On GLV curves both scalars are endomorphism-split (four 128-bit
    half-scalars, one half-length doubling chain).  Otherwise both tables
    are built in ONE stacked scan, and the window loop runs 2*64
    interleaved iterations (doublings only on even ones, via lax.cond) so
    the loop body contains a single point-add instance -- halving the XLA
    graph vs. two adds per window.
    """
    if curve.glv is not None:
        return _glv_dual_mul(curve, P, kp, Q, kq)
    if _pallas_ok(curve):
        from . import pallas_ec
        return pallas_ec.dual_mul(curve, P, kp, Q, kq)
    batch = jnp.broadcast_shapes(
        P.shape[:-2], Q.shape[:-2], kp.shape[:-1], kq.shape[:-1]
    )
    pq = jnp.stack(
        [
            jnp.broadcast_to(P, batch + P.shape[-2:]),
            jnp.broadcast_to(Q, batch + Q.shape[-2:]),
        ],
        axis=0,
    )
    tables = _build_table(curve, pq)  # (16, 2, batch..., 3, L)
    flat = tables.reshape((COMB_SIZE * 2,) + tables.shape[2:])
    digs = jnp.stack(
        [
            jnp.broadcast_to(_window_digits(kp), (COMB_WINDOWS,) + batch),
            jnp.broadcast_to(_window_digits(kq), (COMB_WINDOWS,) + batch),
        ],
        axis=1,
    )  # (64, 2, batch...)

    def body(i, acc):
        w = (COMB_WINDOWS - 1) - (i // 2)
        par = i % 2
        acc = jax.lax.cond(par == 0, lambda a: _dbl4(curve, a), lambda a: a, acc)
        dw = jax.lax.dynamic_index_in_dim(digs, w, 0, keepdims=False)
        dig = jax.lax.dynamic_index_in_dim(dw, par, 0, keepdims=False)
        entry = _select_entry(flat, dig * 2 + par.astype(jnp.uint32))
        return add(curve, acc, entry)

    return jax.lax.fori_loop(0, 2 * COMB_WINDOWS, body, infinity(batch))


def base_mul_add(curve: Curve, s, P, t):
    """g^s * P^t, batched: one shared doubling chain for both scalars.

    The generator side uses the constant window-0 table [0..15]*G (shared
    across all lanes, no per-lane build); the MSB-first doubling chain
    supplies the 2**(4w) window factors for both scalars.  Equivalent of
    EC_POINT_mul(group, r, s, P, t, ctx) / the g^rho * X^ch verification
    pattern (`/root/reference/SEAL/bidder.cpp:128-130,255-296`).

    GLV curves split both scalars (see _glv_base_mul_add); otherwise same
    interleaved single-add loop structure as dual_mul.
    """
    if curve.glv is not None:
        return _glv_base_mul_add(curve, s, P, t)
    if _pallas_ok(curve):
        from . import pallas_ec
        return pallas_ec.base_mul_add(curve, s, P, t)
    batch = jnp.broadcast_shapes(P.shape[:-2], s.shape[:-1], t.shape[:-1])
    tq = _build_table(curve, jnp.broadcast_to(P, batch + P.shape[-2:]))
    dq = jnp.broadcast_to(_window_digits(t), (COMB_WINDOWS,) + batch)
    ds = jnp.broadcast_to(_window_digits(s), (COMB_WINDOWS,) + batch)
    digs = jnp.stack([ds, dq], axis=1)  # (64, 2, batch...)
    tg = jnp.asarray(curve.comb_table[0])  # (16, 3, L) constant [d]*G

    def body(i, acc):
        w = (COMB_WINDOWS - 1) - (i // 2)
        par = i % 2
        acc = jax.lax.cond(par == 0, lambda a: _dbl4(curve, a), lambda a: a, acc)
        dw = jax.lax.dynamic_index_in_dim(digs, w, 0, keepdims=False)
        dig = jax.lax.dynamic_index_in_dim(dw, par, 0, keepdims=False)
        eg = _select_entry(tg, dig)
        ep = _select_entry(tq, dig)
        entry = select((par == 1), ep, eg)
        return add(curve, acc, entry)

    return jax.lax.fori_loop(0, 2 * COMB_WINDOWS, body, infinity(batch))


def mul_base(curve: Curve, k):
    """Fixed-base scalar mult k*G via the precomputed comb table.

    64 complete adds, no doublings.  Equivalent of
    EC_POINT_mul(group, r, k, NULL, NULL) (`/root/reference/SEAL/bidder.cpp:98`).
    """
    if _pallas_ok(curve):
        from . import pallas_ec
        return pallas_ec.mul_base(curve, k)
    return mul_comb(curve, jnp.asarray(curve.comb_table), k)


def mul_comb(curve: Curve, table, k):
    """Comb scalar mult against a (64, 16, 3, L) table of any base point."""
    if _pallas_ok(curve):
        from . import pallas_ec
        return pallas_ec.mul_comb(curve, table, k)
    batch = k.shape[:-1]
    digits = _window_digits(k)
    flat = table.reshape((COMB_WINDOWS * COMB_SIZE,) + table.shape[2:])

    def body(w, acc):
        digit = jax.lax.dynamic_index_in_dim(digits, w, 0, keepdims=False)
        idx = w.astype(jnp.uint32) * COMB_SIZE + digit
        return add(curve, acc, _select_entry(flat, idx))

    return jax.lax.fori_loop(0, COMB_WINDOWS, body, infinity(batch))


# --------------------------------------------------------------------------
# affine conversion / serialization
# --------------------------------------------------------------------------

def to_affine(curve: Curve, P):
    """Projective -> affine (x, y) limb pair; infinity maps to (0, 0).

    Uses fully-batched Fermat inversion (see field.inv rationale).
    """
    fp = curve.fp
    zinv = F.inv(fp, P[..., 2, :])
    x = F.mul(fp, P[..., 0, :], zinv)
    y = F.mul(fp, P[..., 1, :], zinv)
    return x, y


def serialize_uncompressed(curve: Curve, P):
    """SEC1 uncompressed encoding (..., 65) uint8: 0x04 || X_be || Y_be.

    Matches EC_POINT_point2oct(POINT_CONVERSION_UNCOMPRESSED) for finite
    points (`/root/reference/SEAL/hash.cpp:27-33`).  Deviation (documented):
    the reference encodes infinity as a single 0x00 byte; we encode it as 65
    zero bytes to keep transcript shapes static.  Transcripts only need to
    be self-consistent between prover and verifier.
    """
    x, y = to_affine(curve, P)
    inf = is_infinity(P)
    prefix = jnp.where(inf, jnp.uint8(0), jnp.uint8(4))[..., None]
    xb = F.to_bytes_be(x)
    yb = F.to_bytes_be(y)
    return jnp.concatenate([prefix, xb, yb], axis=-1)


def serialize_affine(x, y, inf=None):
    """Like serialize_uncompressed but for already-affine coordinates."""
    if inf is None:
        inf = F.is_zero(x) & F.is_zero(y)
    prefix = jnp.where(inf, jnp.uint8(0), jnp.uint8(4))[..., None]
    return jnp.concatenate([prefix, F.to_bytes_be(x), F.to_bytes_be(y)], axis=-1)


def on_curve(curve: Curve, P):
    """Projective on-curve check: Y^2 Z == X^3 + a X Z^2 + b Z^3."""
    fp = curve.fp
    X, Y, Z = P[..., 0, :], P[..., 1, :], P[..., 2, :]
    lhs = F.mul(fp, F.mul(fp, Y, Y), Z)
    x3 = F.mul(fp, F.mul(fp, X, X), X)
    z2 = F.mul(fp, Z, Z)
    z3 = F.mul(fp, z2, Z)
    rhs = F.add(fp, x3, F.mul(fp, z3, F.const(curve.b_limbs, Z.shape[:-1])))
    if not curve.a_is_zero:
        axz2 = F.mul(
            fp,
            F.mul(fp, X, z2),
            F.const(curve.a_limbs, X.shape[:-1]),
        )
        rhs = F.add(fp, rhs, axz2)
    return F.eq(lhs, rhs)


# --------------------------------------------------------------------------
# reductions over point axes
# --------------------------------------------------------------------------

def ec_prefix_scan(curve: Curve, P, axis: int = 0):
    """Inclusive prefix sums of points along `axis`.

    Hillis-Steele ladder as ONE fori_loop (log2(n) iterations of
    shift-and-add): the whole scan compiles to a single point-add instance,
    unlike lax.associative_scan whose odd/even recursion emits a separate
    add graph per level.  Work is n*log(n) adds, but they are batched VPU
    lanes -- depth (which is what the tree would also pay) is identical.
    Equivalent of the reference's sequential EC_POINT_add loops
    (`/root/reference/SEAL/bidder.cpp:1286-1299,1393-1395`).
    """
    P = jnp.moveaxis(P, axis, 0)
    n = P.shape[0]
    if n == 1:
        return jnp.moveaxis(P, 0, axis)
    levels = max(1, (n - 1).bit_length())
    inf = infinity(P.shape[:-2])
    rows = jnp.arange(n)

    def level(l, v):
        s = jnp.left_shift(jnp.int32(1), l)
        shifted = jnp.roll(v, s, axis=0)
        shifted = select(
            (rows >= s).reshape((n,) + (1,) * (v.ndim - 3)), shifted, inf
        )
        return add(curve, v, shifted)

    out = jax.lax.fori_loop(0, levels, level, P)
    return jnp.moveaxis(out, 0, axis)


def ec_sum(curve: Curve, P, axis: int = 0):
    """Point sum along `axis` (single-instance ladder; see ec_prefix_scan)."""
    P = jnp.moveaxis(P, axis, 0)
    return ec_prefix_scan(curve, P, axis=0)[-1]


# --------------------------------------------------------------------------
# host-side helpers for tests / setup
# --------------------------------------------------------------------------

def encode_host_points(points) -> np.ndarray:
    """List of host affine points (or None) -> (len, 3, 16) projective limbs."""
    from ..curves import _encode_host_point

    return np.stack([_encode_host_point(p) for p in points])


def decode_host_point(curve: Curve, P):
    """Single device point -> host affine pair or None (test helper)."""
    arr = np.asarray(P)
    z = F.limbs_to_int(arr[2])
    if z == 0:
        return None
    p = curve.host.p
    zi = pow(z, p - 2, p)
    return (F.limbs_to_int(arr[0]) * zi % p, F.limbs_to_int(arr[1]) * zi % p)
