"""Pallas TPU kernels for the EC hot path: fused scalar-multiplication
ladders that keep the window table and every intermediate point in VMEM.

Why this exists: the pure-XLA path executes each field op as a separate
HLO, so a 256-bit scalar mult (≈320 point ops, ≈15 field muls each)
round-trips HBM thousands of times per batch.  These kernels run the whole
ladder per batch block inside one Pallas program: HBM traffic is one read
of the inputs and one write of the result.

Layout: limb-major.  A field element batch is (16, B) uint32 -- limbs on
the sublane axis, batch on the 128-wide lane axis -- so every limb-wise
op is a full-tile VPU op.  A point batch is (3, 16, B).

All arithmetic is branchless and total (RCB16 complete formulas, a=0),
matching privacy_auction_tpu.ops.ec semantics exactly; differential tests
pin the two paths together.  Reference parity: the OpenSSL EC_POINT_mul
call sites (`/root/reference/SEAL/bidder.cpp:98,128-130,1131-1138`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field as F

MASK = np.uint32(0xFFFF)
U32 = jnp.uint32
LIMBS = 16
LANES = 512          # batch lanes per grid block
WINDOW = 4
WINDOWS = 64
TSIZE = 16


def _row_iota(W, B):
    return jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)


def _slice_add(x, start: int, val):
    """x[start:start+W] += val via zero-padding (no scatter/dynamic_slice,
    which Mosaic cannot lower on values)."""
    W, B = val.shape
    X = x.shape[0]
    parts = []
    if start:
        parts.append(jnp.zeros((start, B), U32))
    parts.append(val)
    if X - start - W:
        parts.append(jnp.zeros((X - start - W, B), U32))
    return x + jnp.concatenate(parts, axis=0)


def _shift_down(x, s: int, fill: int = 0):
    """Shift rows down by s (row i <- row i-s), filling with `fill`."""
    W, B = x.shape
    r = pltpu.roll(x, s, axis=0)
    keep = _row_iota(W, B) >= s
    if fill == 0:
        return jnp.where(keep, r, jnp.zeros_like(r))
    return jnp.where(keep, r, jnp.full_like(r, np.uint32(fill)))


# --------------------------------------------------------------------------
# field helpers in limb-row layout (values are jnp arrays inside the kernel)
# --------------------------------------------------------------------------

def _propagate(cols):
    """Carry-propagate columns (W, B), each < 2**31 -> (digits, carry (1,B)).

    Two local passes then a Kogge-Stone ladder over the sublane axis.
    """
    W, B = cols.shape
    d0 = cols & MASK
    c0 = cols >> 16
    x = d0 + _shift_down(c0, 1)
    d1 = x & MASK
    c1 = x >> 16
    y = d1 + _shift_down(c1, 1)
    G = y >> 16
    P = (y == MASK).astype(U32)
    s = 1
    while s < W:
        G = G | (P & _shift_down(G, s))
        P = P & _shift_down(P, s, fill=1)
        s *= 2
    cin = _shift_down(G, 1)
    digits = (y + cin) & MASK
    carry = c0[W - 1 : W] + c1[W - 1 : W] + G[W - 1 : W]
    return digits, carry


def _sub_borrow(a, b):
    """a - b over (W, B) 16-bit digit rows -> (digits, borrow (1,B))."""
    W, B = a.shape
    G = (a < b).astype(U32)
    P = (a == b).astype(U32)
    s = 1
    while s < W:
        G = G | (P & _shift_down(G, s))
        P = P & _shift_down(P, s, fill=1)
        s *= 2
    bin_ = _shift_down(G, 1)
    return (a - b - bin_) & MASK, G[W - 1 : W]


@functools.lru_cache(maxsize=None)
def _mod_const_array(modulus: int) -> np.ndarray:
    """Packed modulus constants, passed to every kernel as an input
    (Pallas kernels cannot close over materialized array constants):
    row 0: m as 17 limbs; row 1: 2m as 17 limbs; row 2: K = 2**256 - m.
    Shape (3, 17, 1) for direct broadcast against (W, B) limb rows.
    """
    K = (1 << 256) - modulus
    out = np.stack([
        F.int_to_limbs(modulus, 17),
        F.int_to_limbs(2 * modulus, 17),
        F.int_to_limbs(K, 17),
    ])
    return out.reshape(3, 17, 1)


def _cond_sub2(mc, v17):
    """(17, B) digits < 3m -> canonical (16, B)."""
    d1, bo1 = _sub_borrow(v17, mc[0])
    d2, bo2 = _sub_borrow(v17, mc[1])
    out = jnp.where(bo1 == 0, d1, v17)
    out = jnp.where(bo2 == 0, d2, out)
    return out[:LIMBS]


def _mul_cols(a, b):
    """Schoolbook product columns: a, b (16, B) digits -> (32, B) cols < 2**21.

    16 full-tile VPU multiplies (row_i(a) broadcast against b), lo/hi byte
    planes accumulated at static offsets -- no MXU, no scatter matrix.
    """
    B = a.shape[1]
    W = 2 * LIMBS
    zero16 = jnp.zeros((LIMBS, B), U32)      # pad lo rows 16..31
    zero15 = jnp.zeros((LIMBS - 1, B), U32)  # pad hi rows 17..31

    def body(i, carry):
        a_rot, acc = carry
        prod = a_rot[0:1, :] * b            # (16, B) exact u32
        lo = jnp.concatenate([prod & MASK, zero16], axis=0)       # rows 0..15
        hi = jnp.concatenate(
            [jnp.zeros((1, B), U32), prod >> 16, zero15], axis=0  # rows 1..16
        )
        acc = acc + lo + hi
        # advance the rotating frames: next source row to the top, and the
        # accumulator's true row i (now final) rotates out of the write zone
        # pltpu.roll requires non-negative shifts: -1 mod height
        return (
            pltpu.roll(a_rot, LIMBS - 1, axis=0),
            pltpu.roll(acc, W - 1, axis=0),
        )

    # Rotating-frame accumulation: at iteration i the accumulator is rolled
    # so that true row i sits at frame row 0 -- every partial-product add
    # lands at STATIC offsets 0..16, and all rolls are static shift-1.
    # Wrapped rows sit at frame rows >= 17 and are never written again.
    _, acc = jax.lax.fori_loop(
        0, LIMBS, body, (a, jnp.zeros((W, B), U32))
    )
    return pltpu.roll(acc, LIMBS, axis=0)


def _mul(spec, mc, a, b):
    """(a * b) mod m in limb-row layout; fast fold for m = 2**256 - 2**32 - k0."""
    k0 = F._fast_k0(spec)
    assert k0 is not None, "pallas kernels support fast-fold moduli only"
    k0 = np.uint32(k0)
    cols = _mul_cols(a, b)
    B = cols.shape[1]
    # fold 1 on raw columns: f = L + k0*H + (H << 32 bits = 2 limbs)
    L, H = cols[:16], cols[16:]
    f = jnp.concatenate([L, jnp.zeros((2, B), U32)], axis=0)
    f = _slice_add(f, 0, H * k0)
    f = _slice_add(f, 2, H)
    # local pass: f < 2**31 -> < 2**17, width 19
    d0 = f & MASK
    c0 = f >> 16
    g = d0 + _shift_down(c0, 1)
    g = jnp.concatenate([g, c0[17:18]], axis=0)  # (19, B) cols < 2**17
    # fold 2
    L2, H2 = g[:16], g[16:]
    f2 = _slice_add(L2, 0, H2 * k0)
    f2 = _slice_add(f2, 2, H2)
    d, c = _propagate(f2)
    v17 = jnp.concatenate([d, c], axis=0)
    return _cond_sub2(mc, v17)


def _addsub(mc, a, b, sub: bool):
    """(a ± b) mod m, limb-rows, one carry ladder."""
    B = a.shape[1]
    if not sub:
        k_ext = mc[2][:LIMBS]
        s = a + b
        d1, c1 = _propagate(s)
        d2, c2 = _propagate(s + k_ext)
        return jnp.where(c2 == 1, d2, d1)
    m = mc[0][:LIMBS]
    e0 = (_row_iota(LIMBS, B) == 0).astype(U32)
    u = a + (MASK - b) + e0
    d1, c1 = _propagate(u)
    d2, c2 = _propagate(u + m)
    return jnp.where(c1 == 1, d1, d2)


def _add_f(mc, a, b):
    return _addsub(mc, a, b, sub=False)


def _sub_f(mc, a, b):
    return _addsub(mc, a, b, sub=True)


def _mul_small(spec, mc, a, c: int):
    """(a * c) mod m for c < 2**10 (columns < 2**26, one fold suffices)."""
    k0 = np.uint32(F._fast_k0(spec))
    B = a.shape[1]
    p = a * np.uint32(c)                    # < 2**26
    lo = p & MASK
    hi = p >> 16
    cols = jnp.concatenate([lo, jnp.zeros((1, B), U32)], axis=0)
    cols = _slice_add(cols, 1, hi)          # (17, B) < 2**17
    L, H = cols[:16], cols[16:]
    f = _slice_add(L, 0, H * k0)
    f = _slice_add(f, 2, H)
    d, cy = _propagate(f)
    v17 = jnp.concatenate([d, cy], axis=0)
    return _cond_sub2(mc, v17)


# --------------------------------------------------------------------------
# point ops in limb-row layout: P is (3, 16, B)
# --------------------------------------------------------------------------

def _pt_add(curve, mc, P, Q):
    """Complete projective addition (RCB16 Alg 7, a=0), limb-row layout."""
    fp = curve.fp
    b3 = curve.b3
    X1, Y1, Z1 = P[0], P[1], P[2]
    X2, Y2, Z2 = Q[0], Q[1], Q[2]
    t0 = _mul(fp, mc, X1, X2)
    t1 = _mul(fp, mc, Y1, Y2)
    t2 = _mul(fp, mc, Z1, Z2)
    u1 = _mul(fp, mc, _add_f(mc, X1, Y1), _add_f(mc, X2, Y2))
    u2 = _mul(fp, mc, _add_f(mc, Y1, Z1), _add_f(mc, Y2, Z2))
    u3 = _mul(fp, mc, _add_f(mc, X1, Z1), _add_f(mc, X2, Z2))
    t3 = _sub_f(mc, u1, _add_f(mc, t0, t1))   # X1Y2 + X2Y1
    t4 = _sub_f(mc, u2, _add_f(mc, t1, t2))   # Y1Z2 + Y2Z1
    y3 = _sub_f(mc, u3, _add_f(mc, t0, t2))   # X1Z2 + X2Z1
    t0_3 = _mul_small(fp, mc, t0, 3)
    t2b = _mul_small(fp, mc, t2, b3)
    y3b = _mul_small(fp, mc, y3, b3)
    z3p = _add_f(mc, t1, t2b)
    t1m = _sub_f(mc, t1, t2b)
    X3 = _sub_f(mc, _mul(fp, mc, t3, t1m), _mul(fp, mc, t4, y3b))
    Y3 = _add_f(mc, _mul(fp, mc, t1m, z3p), _mul(fp, mc, y3b, t0_3))
    Z3 = _add_f(mc, _mul(fp, mc, z3p, t4), _mul(fp, mc, t0_3, t3))
    return jnp.stack([X3, Y3, Z3])


def _pt_dbl(curve, mc, P):
    """Complete projective doubling (RCB16 Alg 9, a=0), limb-row layout."""
    fp = curve.fp
    b3 = curve.b3
    X, Y, Z = P[0], P[1], P[2]
    t0 = _mul(fp, mc, Y, Y)
    t1 = _mul(fp, mc, Y, Z)
    t2 = _mul(fp, mc, Z, Z)
    xy = _mul(fp, mc, X, Y)
    z3a = _mul_small(fp, mc, t0, 8)
    t2b = _mul_small(fp, mc, t2, b3)
    t2c = _mul_small(fp, mc, t2, 3 * b3)
    y3a = _add_f(mc, t0, t2b)
    t0m = _sub_f(mc, t0, t2c)
    X3 = _mul_small(fp, mc, _mul(fp, mc, t0m, xy), 2)
    Y3 = _add_f(mc, _mul(fp, mc, t2b, z3a), _mul(fp, mc, t0m, y3a))
    Z3 = _mul(fp, mc, t1, z3a)
    return jnp.stack([X3, Y3, Z3])


def _pt_inf(B):
    coord = jax.lax.broadcasted_iota(jnp.int32, (3, LIMBS, B), 0)
    limb = jax.lax.broadcasted_iota(jnp.int32, (3, LIMBS, B), 1)
    return ((coord == 1) & (limb == 0)).astype(U32)


def _entry_select(table, dig):
    """table (16, 3, 16, B) or (16, 3, 16, 1)-broadcastable; dig (1, B).

    Binary select tree over the 4 digit bits: 15 full-tile selects.
    """
    t = table
    for bit in range(WINDOW):
        half = t.shape[0] // 2
        even = t.reshape((half, 2) + t.shape[1:])
        cond = (((dig >> bit) & 1) == 1).reshape(
            (1,) * (t.ndim - 1) + (dig.shape[-1],)
        )
        t = jnp.where(cond, even[:, 1], even[:, 0])
    return t[0]


def _dig_row(digs_ref, w):
    """Read window-digit row w from a (64, B) digits ref -> (1, B)."""
    return digs_ref[pl.ds(w, 1), :]


def _fill_table(curve, mc, table_ref, P, B):
    """Write [inf, P, 2P, ..., 15P] into a (16, 3, 16, B) scratch ref.

    fori_loop body = ONE point add: Mosaic compiles the add once instead of
    14 unrolled copies (kernel build time, not correctness).
    """
    table_ref[0:1] = _pt_inf(B)[None]
    table_ref[1:2] = P[None]

    def tb(i, prev):
        nxt = _pt_add(curve, mc, prev, P)
        table_ref[pl.ds(i, 1)] = nxt[None]
        return nxt

    jax.lax.fori_loop(2, TSIZE, tb, P)


def _dbl4(curve, mc, acc):
    return jax.lax.fori_loop(
        0, WINDOW, lambda _, a: _pt_dbl(curve, mc, a), acc
    )


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------

def _scalar_mul_kernel(curve, P_ref, dk_ref, mc_ref, out_ref):
    B = P_ref.shape[-1]
    mc = mc_ref[:]

    def inner(table_ref):
        _fill_table(curve, mc, table_ref, P_ref[:], B)
        table = table_ref[:]

        def body(i, acc):
            w = WINDOWS - 1 - i
            acc = _dbl4(curve, mc, acc)
            return _pt_add(
                curve, mc, acc, _entry_select(table, _dig_row(dk_ref, w))
            )

        out_ref[:] = jax.lax.fori_loop(0, WINDOWS, body, _pt_inf(B))

    pl.run_scoped(inner, pltpu.VMEM((TSIZE, 3, LIMBS, B), U32))


def _dual_mul_kernel(curve, P_ref, dp_ref, Q_ref, dq_ref, mc_ref, out_ref):
    """Straus dual ladder; window count = dp_ref.shape[0] (static), so the
    same kernel serves the full 64-window dual mult and the 33-window GLV
    half-ladders."""
    B = P_ref.shape[-1]
    nw = dp_ref.shape[0]
    mc = mc_ref[:]

    def inner(tp_ref, tq_ref):
        _fill_table(curve, mc, tp_ref, P_ref[:], B)
        _fill_table(curve, mc, tq_ref, Q_ref[:], B)
        tp = tp_ref[:]
        tq = tq_ref[:]

        def body(i, acc):
            w = nw - 1 - i
            acc = _dbl4(curve, mc, acc)
            acc = _pt_add(
                curve, mc, acc, _entry_select(tp, _dig_row(dp_ref, w))
            )
            return _pt_add(
                curve, mc, acc, _entry_select(tq, _dig_row(dq_ref, w))
            )

        out_ref[:] = jax.lax.fori_loop(0, nw, body, _pt_inf(B))

    pl.run_scoped(
        inner,
        pltpu.VMEM((TSIZE, 3, LIMBS, B), U32),
        pltpu.VMEM((TSIZE, 3, LIMBS, B), U32),
    )


def _pt_add_kernel(curve, P_ref, Q_ref, mc_ref, out_ref):
    """Single batched complete point add (used to combine kernel outputs)."""
    out_ref[:] = _pt_add(curve, mc_ref[:], P_ref[:], Q_ref[:])


def _quad_mul_kernel(curve, P1_ref, d1_ref, P2_ref, d2_ref, P3_ref, d3_ref,
                     P4_ref, d4_ref, mc_ref, out_ref):
    """Four-scalar Straus ladder: sum k_i * P_i over one shared doubling
    chain.  This is the GLV form of dual_mul (kp*P + kq*Q split into four
    half-length scalars), window count = d1_ref.shape[0] (static)."""
    B = P1_ref.shape[-1]
    nw = d1_ref.shape[0]
    mc = mc_ref[:]

    def inner(t1_ref, t2_ref, t3_ref, t4_ref):
        _fill_table(curve, mc, t1_ref, P1_ref[:], B)
        _fill_table(curve, mc, t2_ref, P2_ref[:], B)
        _fill_table(curve, mc, t3_ref, P3_ref[:], B)
        _fill_table(curve, mc, t4_ref, P4_ref[:], B)
        tabs = (t1_ref[:], t2_ref[:], t3_ref[:], t4_ref[:])
        digs = (d1_ref, d2_ref, d3_ref, d4_ref)

        def body(i, acc):
            w = nw - 1 - i
            acc = _dbl4(curve, mc, acc)
            for t, d in zip(tabs, digs):
                acc = _pt_add(curve, mc, acc, _entry_select(t, _dig_row(d, w)))
            return acc

        out_ref[:] = jax.lax.fori_loop(0, nw, body, _pt_inf(B))

    pl.run_scoped(
        inner,
        *(pltpu.VMEM((TSIZE, 3, LIMBS, B), U32) for _ in range(4)),
    )


def _base_mul_add_glv_kernel(curve, P1_ref, dt1_ref, P2_ref, dt2_ref,
                             ds1_ref, ds2_ref, sflags_ref, g0f_ref, g0lf_ref,
                             mc_ref, out_ref):
    """GLV form of the g^s * P^t verification workhorse.

    s and t are both endomorphism-split; the P side gets two per-lane
    tables (wrapper passes sign-adjusted +-P and +-phi(P)); the generator
    side uses the two constant window-0 tables (G and phi(G)) via exact
    one-hot f32 matmuls, with per-lane Y-negation for negative s_i
    (any (0:y:0), y != 0 is a valid infinity representative for the
    complete formulas, so negating a fetched entry lane-wise is total).
    """
    B = P1_ref.shape[-1]
    nw = dt1_ref.shape[0]
    mc = mc_ref[:]
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (TSIZE, B), 0)
    sflags = sflags_ref[:]                            # (2, B) uint32

    def g_entry(g0, ds_ref, w, sidx):
        dig = ds_ref[pl.ds(w, 1), :]                  # (1, B)
        onehot = (lane_iota == dig.astype(jnp.int32)).astype(jnp.float32)
        ent_f = jax.lax.dot_general(
            g0, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                             # (48, B)
        e = ent_f.astype(jnp.int32).astype(U32).reshape(3, LIMBS, B)
        negy = _sub_f(mc, jnp.zeros_like(e[1]), e[1])
        y = jnp.where(sflags[sidx : sidx + 1, :] != 0, negy, e[1])
        return jnp.stack([e[0], y, e[2]])

    def inner(t1_ref, t2_ref):
        _fill_table(curve, mc, t1_ref, P1_ref[:], B)
        _fill_table(curve, mc, t2_ref, P2_ref[:], B)
        t1 = t1_ref[:]
        t2 = t2_ref[:]
        g0 = g0f_ref[:]
        g0l = g0lf_ref[:]

        def body(i, acc):
            w = nw - 1 - i
            acc = _dbl4(curve, mc, acc)
            acc = _pt_add(curve, mc, acc, g_entry(g0, ds1_ref, w, 0))
            acc = _pt_add(curve, mc, acc, g_entry(g0l, ds2_ref, w, 1))
            acc = _pt_add(
                curve, mc, acc, _entry_select(t1, _dig_row(dt1_ref, w))
            )
            return _pt_add(
                curve, mc, acc, _entry_select(t2, _dig_row(dt2_ref, w))
            )

        out_ref[:] = jax.lax.fori_loop(0, nw, body, _pt_inf(B))

    pl.run_scoped(
        inner,
        pltpu.VMEM((TSIZE, 3, LIMBS, B), U32),
        pltpu.VMEM((TSIZE, 3, LIMBS, B), U32),
    )


def _base_mul_add_kernel(curve, P_ref, dt_ref, ds_ref, g0f_ref, mc_ref,
                         out_ref):
    """Fused g^s * P^t: one doubling chain serves both scalars.

    Per window (MSB->LSB): 4 doublings, one add of the per-lane P-table
    entry (select tree), one add of the shared window-0 generator table
    entry (exact one-hot f32 MXU matmul, as in _mul_base_kernel).  One
    VMEM pass instead of the previous three pallas_calls with HBM
    round-trips between them (VERDICT r2 item 5).
    """
    B = P_ref.shape[-1]
    mc = mc_ref[:]
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (TSIZE, B), 0)

    def inner(table_ref):
        _fill_table(curve, mc, table_ref, P_ref[:], B)
        table = table_ref[:]
        g0 = g0f_ref[:]                                   # (48, 16) f32

        def body(i, acc):
            w = WINDOWS - 1 - i
            acc = _dbl4(curve, mc, acc)
            dig_s = ds_ref[pl.ds(w, 1), :]                # (1, B)
            onehot = (lane_iota == dig_s.astype(jnp.int32)).astype(
                jnp.float32
            )
            ent_f = jax.lax.dot_general(
                g0, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                             # (48, B)
            eg = ent_f.astype(jnp.int32).astype(U32).reshape(3, LIMBS, B)
            acc = _pt_add(curve, mc, acc, eg)
            return _pt_add(
                curve, mc, acc, _entry_select(table, _dig_row(dt_ref, w))
            )

        out_ref[:] = jax.lax.fori_loop(0, WINDOWS, body, _pt_inf(B))

    pl.run_scoped(inner, pltpu.VMEM((TSIZE, 3, LIMBS, B), U32))


def _mul_base_kernel(curve, dk_ref, combf_ref, mc_ref, out_ref):
    """k*G via the comb table: entry lookup as a one-hot MXU matmul.

    combf is the comb table as f32 (64, 48, 16): window, limb-coordinate
    (3*16), entry digit.  16-bit limbs are exact in f32, the one-hot is
    exact, and each sum selects a single product -- so the matmul is exact.
    Per window: entry(48, B) = table_w(48, 16) @ onehot(16, B), then one
    complete add.  The digit rows and table are read per-iteration with
    dynamic ref indexing -- both are small (<= 200 KB), so the implied
    copies are cheap (unlike large VMEM values, where rolling-frame access
    is needed).
    """
    B = dk_ref.shape[-1]
    mc = mc_ref[:]
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (TSIZE, B), 0)

    def body(w, acc):
        dig = dk_ref[pl.ds(w, 1), :]                      # (1, B)
        tw = combf_ref[pl.ds(w, 1)][0]                    # (48, 16) f32
        onehot = (lane_iota == dig.astype(jnp.int32)).astype(jnp.float32)
        # Precision.HIGHEST: without it the MXU may demote the f32 matmul
        # to one-pass bf16 (xla_allow_excess_precision), which truncates
        # the 16-bit limb values.
        ent_f = jax.lax.dot_general(
            tw, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                 # (48, B)
        # Mosaic has no f32->u32 cast; go through i32 (values < 2**16)
        entry = ent_f.astype(jnp.int32).astype(U32).reshape(3, LIMBS, B)
        return _pt_add(curve, mc, acc, entry)

    out_ref[:] = jax.lax.fori_loop(0, WINDOWS, body, _pt_inf(B))


# --------------------------------------------------------------------------
# host wrappers: batch-major <-> limb-major, padding, grid over lanes
# --------------------------------------------------------------------------

def _to_rows_pt(P, B):
    """(N, 3, 16) -> (3, 16, B) padded."""
    n = P.shape[0]
    Pt = jnp.moveaxis(P, 0, -1)  # (3, 16, n)
    if n < B:
        Pt = jnp.pad(Pt, ((0, 0), (0, 0), (0, B - n)))
    return Pt


def _to_digit_rows(k, B):
    """Scalars (n, 16) -> window-digit rows (64, B) uint32, LSB-first."""
    n = k.shape[0]
    shifts = jnp.arange(0, 16, 4, dtype=jnp.uint32)          # (4,)
    d = (k[:, :, None] >> shifts) & jnp.uint32(0xF)          # (n, 16, 4)
    d = d.reshape(n, WINDOWS)
    d = jnp.moveaxis(d, 0, -1)                               # (64, n)
    if n < B:
        d = jnp.pad(d, ((0, 0), (0, B - n)))
    return d


def _from_rows_pt(Pt, n):
    return jnp.moveaxis(Pt, -1, 0)[:n]


def _pad_lanes(n):
    if n <= 128:
        return max(8, 128)
    return ((n + LANES - 1) // LANES) * LANES


def _flatten(x, extra_dims):
    """Flatten leading batch dims of x, keeping the trailing extra_dims."""
    batch = x.shape[: x.ndim - extra_dims]
    return x.reshape((-1,) + x.shape[x.ndim - extra_dims:]), batch


_INTERPRET = False  # flipped by tests on CPU


def _mc(curve):
    return jnp.asarray(_mod_const_array(curve.fp.modulus))


@functools.lru_cache(maxsize=None)
def _cached_grid_fn(kernel, curve, grid, B, total, arg_shapes, interpret):
    """Memoized jitted wrapper around one pallas_call configuration.

    Tracing a kernel to a jaxpr costs SECONDS (the fused ladders are ~10^4
    primitives); without memoization every call site of every outer jit
    re-traces it.  Wrapping the pallas_call in its own stable jit function
    makes nested tracing hit jax's pjit trace cache, so each (kernel, block
    config) traces once per process.
    """
    specs = []
    for shape in arg_shapes:
        nd = len(shape)
        if shape[-1] == total:  # lane-blocked input
            blk = shape[:-1] + (B,)

            def imap(i, nd=nd):
                return (0,) * (nd - 1) + (i,)

            specs.append(pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM))
        else:  # broadcast constant input

            def cmap(i, nd=nd):
                return (0,) * nd

            specs.append(pl.BlockSpec(shape, cmap, memory_space=pltpu.VMEM))

    def fn(*args):
        return pl.pallas_call(
            functools.partial(kernel, curve),
            grid=(grid,),
            in_specs=specs,
            out_specs=pl.BlockSpec(
                (3, LIMBS, B),
                lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((3, LIMBS, total), U32),
            interpret=interpret,
        )(*args)

    return jax.jit(fn)


def _grid_call(kernel, curve, n_lanes, inputs, in_extra, const_inputs=()):
    """Run `kernel` over lane blocks.  inputs: list of (array, trailing-dims
    already limb-major with lane axis last); const_inputs broadcast to every
    block."""
    B = min(_pad_lanes(n_lanes), LANES)
    total = ((n_lanes + B - 1) // B) * B
    grid = total // B
    args = []
    for x in inputs:
        lane_pad = total - x.shape[-1]
        if lane_pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, lane_pad)])
        args.append(x)
    for cx in const_inputs:
        # a constant whose trailing dim happens to equal `total` would be
        # misclassified as lane-blocked in the cached spec builder; must
        # survive `python -O`, so not an assert
        if cx.ndim and cx.shape[-1] == total:
            raise ValueError(
                "broadcast const input collides with the lane-block width"
            )
        args.append(cx)
    fn = _cached_grid_fn(
        kernel, curve, grid, B, total,
        tuple(a.shape for a in args), _INTERPRET,
    )
    return fn(*args)


def scalar_mul(curve, P, k):
    """Batched k*P; accepts (..., 3, 16) / (..., 16), any leading batch."""
    Pf, batch = _flatten(P, 2)
    kf, _ = _flatten(jnp.broadcast_to(k, batch + (LIMBS,)), 1)
    n = Pf.shape[0]
    out = _grid_call(
        _scalar_mul_kernel, curve, n,
        [_to_rows_pt(Pf, n), _to_digit_rows(kf, n)], (2, 1),
        const_inputs=(_mc(curve),),
    )
    return _from_rows_pt(out, n).reshape(batch + (3, LIMBS))


def dual_mul(curve, P, kp, Q, kq):
    return dual_mul_windows(curve, P, kp, Q, kq, WINDOWS)


def dual_mul_windows(curve, P, kp, Q, kq, windows: int):
    """kp*P + kq*Q over the low `windows` 4-bit windows of each scalar
    (callers guarantee the higher windows are zero; the GLV split passes
    33 windows for its 132-bit magnitudes)."""
    batch = jnp.broadcast_shapes(
        P.shape[:-2], Q.shape[:-2], kp.shape[:-1], kq.shape[:-1]
    )
    Pf, _ = _flatten(jnp.broadcast_to(P, batch + (3, LIMBS)), 2)
    Qf, _ = _flatten(jnp.broadcast_to(Q, batch + (3, LIMBS)), 2)
    kpf, _ = _flatten(jnp.broadcast_to(kp, batch + (LIMBS,)), 1)
    kqf, _ = _flatten(jnp.broadcast_to(kq, batch + (LIMBS,)), 1)
    n = Pf.shape[0]
    out = _grid_call(
        _dual_mul_kernel, curve, n,
        [_to_rows_pt(Pf, n), _to_digit_rows(kpf, n)[:windows],
         _to_rows_pt(Qf, n), _to_digit_rows(kqf, n)[:windows]], (2, 1, 2, 1),
        const_inputs=(_mc(curve),),
    )
    return _from_rows_pt(out, n).reshape(batch + (3, LIMBS))


def quad_mul_windows(curve, P1, k1, P2, k2, P3, k3, P4, k4, windows: int):
    """sum k_i * P_i, one shared doubling chain (GLV dual_mul form)."""
    batch = jnp.broadcast_shapes(
        *(p.shape[:-2] for p in (P1, P2, P3, P4)),
        *(k.shape[:-1] for k in (k1, k2, k3, k4)),
    )
    args = []
    dims = []
    for P, k in ((P1, k1), (P2, k2), (P3, k3), (P4, k4)):
        Pf, _ = _flatten(jnp.broadcast_to(P, batch + (3, LIMBS)), 2)
        kf, _ = _flatten(jnp.broadcast_to(k, batch + (LIMBS,)), 1)
        n = Pf.shape[0]
        args += [_to_rows_pt(Pf, n), _to_digit_rows(kf, n)[:windows]]
        dims += [2, 1]
    out = _grid_call(
        _quad_mul_kernel, curve, n, args, tuple(dims),
        const_inputs=(_mc(curve),),
    )
    return _from_rows_pt(out, n).reshape(batch + (3, LIMBS))


@functools.lru_cache(maxsize=None)
def _g0l_table_np(curve) -> np.ndarray:
    """Window-0 comb table of phi(G) = lam*G as (48, 16) f32: the
    beta-transformed x rows of the G table (cached as numpy -- see
    _g0_table_np)."""
    glv = curve.glv
    t = np.array(curve.comb_table[0], dtype=np.uint64)     # (16, 3, 16)
    host = curve.host
    for d in range(TSIZE):
        x = int(sum(int(t[d, 0, i]) << (16 * i) for i in range(LIMBS)))
        xb = x * glv.beta % host.p
        for i in range(LIMBS):
            t[d, 0, i] = (xb >> (16 * i)) & 0xFFFF
    tf = t.astype(np.float32).reshape(TSIZE, 3 * LIMBS)
    return np.ascontiguousarray(np.moveaxis(tf, 0, 1))


def base_mul_add_glv(curve, P1, t1, P2, t2, s1, s2, sflags, windows: int):
    """g^s * P^t with both scalars GLV-split: P1/P2 = sign-adjusted
    +-P/+-phi(P) with magnitudes t1/t2; s1/s2 = |s| halves with signs in
    sflags (..., 2) uint32."""
    batch = jnp.broadcast_shapes(
        P1.shape[:-2], P2.shape[:-2], t1.shape[:-1], t2.shape[:-1],
        s1.shape[:-1], s2.shape[:-1], sflags.shape[:-1],
    )
    P1f, _ = _flatten(jnp.broadcast_to(P1, batch + (3, LIMBS)), 2)
    P2f, _ = _flatten(jnp.broadcast_to(P2, batch + (3, LIMBS)), 2)
    t1f, _ = _flatten(jnp.broadcast_to(t1, batch + (LIMBS,)), 1)
    t2f, _ = _flatten(jnp.broadcast_to(t2, batch + (LIMBS,)), 1)
    s1f, _ = _flatten(jnp.broadcast_to(s1, batch + (LIMBS,)), 1)
    s2f, _ = _flatten(jnp.broadcast_to(s2, batch + (LIMBS,)), 1)
    sff, _ = _flatten(jnp.broadcast_to(sflags, batch + (2,)), 1)
    n = P1f.shape[0]
    sfr = jnp.moveaxis(sff, 0, -1)  # (2, n); _grid_call pads the lane axis
    out = _grid_call(
        _base_mul_add_glv_kernel, curve, n,
        [_to_rows_pt(P1f, n), _to_digit_rows(t1f, n)[:windows],
         _to_rows_pt(P2f, n), _to_digit_rows(t2f, n)[:windows],
         _to_digit_rows(s1f, n)[:windows], _to_digit_rows(s2f, n)[:windows],
         sfr],
        (2, 1, 2, 1, 1, 1, 1),
        const_inputs=(_g0_table_f32(curve), _g0l_table_f32(curve),
                      _mc(curve)),
    )
    return _from_rows_pt(out, n).reshape(batch + (3, LIMBS))


def _g0l_table_f32(curve):
    return jnp.asarray(_g0l_table_np(curve))


@functools.lru_cache(maxsize=None)
def _g0_table_np(curve) -> np.ndarray:
    """Window-0 comb table [0..15]*G as (48, 16) f32 (limb-coordinate x
    entry digit), exact in f32 (16-bit limbs).  Cached as NUMPY: caching a
    jnp array would capture a tracer when first materialized inside a jit
    trace and leak it into every later trace (BENCH_r03 failure)."""
    t = np.asarray(curve.comb_table[0], dtype=np.float32)  # (16, 3, 16)
    return np.ascontiguousarray(np.moveaxis(t.reshape(TSIZE, 3 * LIMBS), 0, 1))


def _g0_table_f32(curve):
    return jnp.asarray(_g0_table_np(curve))


def base_mul_add(curve, s, P, t):
    """g^s * P^t in ONE fused kernel: the doubling chain serves both the
    per-lane P window table and the shared generator window-0 table."""
    batch = jnp.broadcast_shapes(P.shape[:-2], s.shape[:-1], t.shape[:-1])
    Pf, _ = _flatten(jnp.broadcast_to(P, batch + (3, LIMBS)), 2)
    sf, _ = _flatten(jnp.broadcast_to(s, batch + (LIMBS,)), 1)
    tf, _ = _flatten(jnp.broadcast_to(t, batch + (LIMBS,)), 1)
    n = Pf.shape[0]
    out = _grid_call(
        _base_mul_add_kernel, curve, n,
        [_to_rows_pt(Pf, n), _to_digit_rows(tf, n), _to_digit_rows(sf, n)],
        (2, 1, 1),
        const_inputs=(_g0_table_f32(curve), _mc(curve)),
    )
    return _from_rows_pt(out, n).reshape(batch + (3, LIMBS))


def mul_comb(curve, table, k):
    """Comb scalar mult against any (64, 16, 3, 16) table (fused kernel)."""
    kf, batch = _flatten(k, 1)
    n = kf.shape[0]
    dk = _to_digit_rows(kf, n)                        # (64, n)
    combf = jnp.moveaxis(
        jnp.asarray(table)
        .astype(jnp.float32)
        .reshape(WINDOWS, TSIZE, 3 * LIMBS),
        1, 2,
    )                                                 # (64, 48, 16)
    out = _grid_call(
        _mul_base_kernel, curve, n,
        [dk], (1,),
        const_inputs=(combf, _mc(curve)),
    )
    return _from_rows_pt(out, n).reshape(batch + (3, LIMBS))


def mul_base(curve, k):
    return mul_comb(curve, curve.comb_table, k)
