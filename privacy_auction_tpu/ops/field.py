"""Batched 256-bit modular arithmetic for TPU (JAX/XLA).

Design (TPU-first, not a port of OpenSSL BN_*):
  * A field element is 16 little-endian limbs of 16 bits, stored in uint32
    lanes: shape ``(..., 16)``.  16-bit radix means every limb product
    ``a_i * b_j < 2**32`` is exact in native uint32 -- no 64-bit emulation
    needed, which is what the TPU VPU wants.
  * Everything is branchless and batched: carries/borrows are computed with
    masks and selects, never data-dependent control flow, so the whole field
    layer vmaps/shards over arbitrary leading batch axes.
  * Reduction is generic "fold" reduction for moduli close to 2**256
    (m = 2**256 - K with K < 2**136): repeatedly replace H*2**256 + L by
    L + H*K, then one conditional subtract.  Covers both secp256k1 fields:
    the base field p (K = 2**32 + 977) and the scalar field n.

Reference parity: provides the capabilities the reference gets from OpenSSL
BN_* (`/root/reference/SEAL/bidder.cpp:97-103` BN_rand_range/BN_mod_mul/
BN_mod_sub, `CCS22/bidder.cpp:64-67`), re-designed as data-parallel kernels.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field as dc_field

import jax
import jax.numpy as jnp
import numpy as np

RADIX_BITS = 16
LIMBS = 16  # 16 limbs x 16 bits = 256 bits
MASK = np.uint32(0xFFFF)
U32 = jnp.uint32


# --------------------------------------------------------------------------
# host <-> limb conversion (numpy, host side)
# --------------------------------------------------------------------------

def int_to_limbs(x: int, width: int = LIMBS) -> np.ndarray:
    """Python int -> little-endian 16-bit limb array (host)."""
    assert 0 <= x < (1 << (RADIX_BITS * width)), "value does not fit"
    return np.array(
        [(x >> (RADIX_BITS * i)) & 0xFFFF for i in range(width)], dtype=np.uint32
    )


def limbs_to_int(a) -> int:
    """Limb array (..., W) -> Python int (host; last axis is limbs)."""
    a = np.asarray(a)
    assert a.ndim >= 1
    out = 0
    for i in reversed(range(a.shape[-1])):
        out = (out << RADIX_BITS) | int(a[..., i])
    return out


def ints_to_limbs(xs, width: int = LIMBS) -> np.ndarray:
    """List of ints -> (len, width) limb matrix (host)."""
    return np.stack([int_to_limbs(x, width) for x in xs])


# --------------------------------------------------------------------------
# Field spec
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class FieldSpec:
    """A prime field GF(m), 2**255 < m < 2**256.

    Reduction strategy: fold reduction (repeated L + H*K with
    K = 2**256 - m) when K < 2**136 (covers both secp256k1 fields);
    otherwise branchless Barrett (mu_limbs set; covers the NIST P-256
    fields, whose K ~ 2**224 would not shrink under folding).
    """

    name: str
    modulus: int
    m_limbs: np.ndarray = dc_field(repr=False)          # (16,)
    m17_limbs: np.ndarray = dc_field(repr=False)        # (17,) m zero-extended
    k_limbs: np.ndarray = dc_field(repr=False)          # (nk,) K = 2**256 - m
    exp_inv_bits: np.ndarray = dc_field(repr=False)     # (256,) bits of m-2, MSB first
    mu_limbs: np.ndarray | None = dc_field(repr=False, default=None)  # (17,) floor(2**512/m)

    def __hash__(self):
        return hash((self.name, self.modulus))

    def __eq__(self, other):
        return isinstance(other, FieldSpec) and self.modulus == other.modulus


@functools.lru_cache(maxsize=None)
def make_spec(name: str, modulus: int) -> FieldSpec:
    K = (1 << 256) - modulus
    assert 0 < K < (1 << 255), "modulus must satisfy 2**255 < m < 2**256"
    nk = max(1, (K.bit_length() + RADIX_BITS - 1) // RADIX_BITS)
    exp = modulus - 2
    bits = np.array([(exp >> (255 - i)) & 1 for i in range(256)], dtype=np.uint32)
    mu = None
    if K >= (1 << 136):  # fold reduction would not converge; use Barrett
        mu = int_to_limbs((1 << 512) // modulus, 17)
    return FieldSpec(
        name=name,
        modulus=modulus,
        m_limbs=int_to_limbs(modulus, LIMBS),
        m17_limbs=int_to_limbs(modulus, 17),
        k_limbs=int_to_limbs(K, nk),
        exp_inv_bits=bits,
        mu_limbs=mu,
    )


# --------------------------------------------------------------------------
# limb-vector primitives (width-generic, branchless)
# --------------------------------------------------------------------------

def _carry_scan(g, p):
    """Kogge-Stone carry resolution: carry-in per position from
    generate/propagate bits (uint32 in {0,1}), log-depth.

    carry_in[0] = 0; carry_in[i+1] = g[i] | (p[i] & carry_in[i]).
    Hand-rolled pad-shift ladder: ceil(log2(W)) levels of 4 vector ops --
    a much leaner graph than lax.associative_scan's odd/even recursion.
    """
    W = g.shape[-1]
    G, P = g, p
    s = 1
    while s < W:
        # shift right along the limb axis by s, filling with the identity
        # (0 for G under |, 1 for P under &)
        Gs = jnp.pad(G[..., :-s], [(0, 0)] * (G.ndim - 1) + [(s, 0)])
        Ps = jnp.pad(
            P[..., :-s],
            [(0, 0)] * (P.ndim - 1) + [(s, 0)],
            constant_values=1,
        )
        G = G | (P & Gs)
        P = P & Ps
        s *= 2
    zero = jnp.zeros(g.shape[:-1] + (1,), U32)
    return jnp.concatenate([zero, G[..., :-1]], axis=-1), G[..., -1]


def _shift_up(c):
    """Shift limb-carries up one position; returns (shifted, overflow_top)."""
    zero = jnp.zeros(c.shape[:-1] + (1,), U32)
    return jnp.concatenate([zero, c[..., :-1]], axis=-1), c[..., -1]


def _propagate(cols):
    """Carry-propagate columns (each < 2**31) into 16-bit digits.

    Returns (digits (..., W), carry_out (...,)).  Log-depth and fully
    vectorized: two local carry passes knock every column below 2**16 plus
    a 0/1 ripple, which a Kogge-Stone associative scan resolves in
    ceil(log2(W)) steps -- a ~10x smaller XLA graph (and faster on the VPU)
    than a W-step sequential ripple.
    """
    d0 = cols & MASK
    e, top0 = _shift_up(cols >> RADIX_BITS)        # carries < 2**15
    x = d0 + e                                     # < 2**16 + 2**15
    d1 = x & MASK
    f, top1 = _shift_up(x >> RADIX_BITS)           # carries in {0, 1}
    y = d1 + f                                     # <= 2**16
    g = y >> RADIX_BITS                            # generate, {0, 1}
    p = (y == MASK).astype(U32)                    # propagate
    cin, top2 = _carry_scan(g & jnp.uint32(1), p)
    digits = (y + cin) & MASK
    return digits, top0 + top1 + top2


def _add_raw(a, b):
    """Add two normalized limb vectors of equal width -> (digits, carry_out)."""
    return _propagate(a + b)


def _local_pass(cols):
    """One cheap local carry pass: columns < 2**31 -> columns < 2**17,
    width + 1 (top carry appended as a new limb).  No Kogge-Stone scan --
    use where a subsequent fold only needs loosely-bounded columns.
    """
    d0 = cols & MASK
    e, top = _shift_up(cols >> RADIX_BITS)
    out = d0 + e  # < 2**16 + 2**15
    return jnp.concatenate([out, top[..., None]], axis=-1)


def _sub_raw(a, b):
    """Subtract b from a (equal width, both normalized 16-bit digits).

    Returns (digits, borrow_out in {0,1}).
    """
    g = (a < b).astype(U32)                        # generate borrow
    p = (a == b).astype(U32)                       # propagate borrow
    bin_, bout = _carry_scan(g, p)
    return (a - b - bin_) & MASK, bout


@functools.lru_cache(maxsize=None)
def _scatter_matrix(La: int, Lb: int) -> np.ndarray:
    """Constant (4*La*Lb, La+Lb) scatter matrix for byte-split partial
    products.  Byte k of product a_i*b_j sits at bit offset 8k, i.e. column
    i+j+k//2 with weight 2**(8*(k%2)).  All entries (0, 1, 256) and all byte
    values (< 256) are exactly representable in bfloat16, so the matmul is
    exact on the MXU at DEFAULT precision -- no 3-pass f32 emulation needed.
    """
    W = La + Lb
    S = np.zeros((4, La, Lb, W), dtype=np.float32)
    for k in range(4):
        for i in range(La):
            for j in range(Lb):
                S[k, i, j, i + j + k // 2] = float(1 << (8 * (k % 2)))
    return S.reshape(4 * La * Lb, W)


def _mul_cols(a, b):
    """Schoolbook product of normalized limb vectors -> (La+Lb) raw columns.

    TPU-first formulation: the 32-bit partial products are computed exactly
    on the VPU (uint32), split into byte planes, and column-accumulated by a
    single matmul against a constant scatter matrix -- the anti-diagonal
    sums ride the MXU instead of a chain of dynamic-update-slices.  Column
    sums stay < 2**21 (< 2**24), so f32 accumulation is exact.  Returns the
    un-propagated columns (each < 2**21) so callers can fold-reduce before
    paying for carry propagation.
    """
    La = a.shape[-1]
    Lb = b.shape[-1]
    batch = a.shape[:-1]
    prod = a[..., :, None] * b[..., None, :]  # (..., La, Lb) exact in uint32
    planes = [
        ((prod >> (8 * k)) & jnp.uint32(0xFF)).astype(jnp.float32).reshape(
            batch + (La * Lb,)
        )
        for k in range(4)
    ]
    parts = jnp.concatenate(planes, axis=-1)  # (..., 4*La*Lb)
    S = jnp.asarray(_scatter_matrix(La, Lb))
    cols_f = jax.lax.dot_general(
        parts, S, (((parts.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return cols_f.astype(U32)


def _mul_raw(a, b):
    """Schoolbook product of normalized limb vectors -> (La+Lb) digits."""
    digits, carry = _propagate(_mul_cols(a, b))
    # carry out of the top limb is impossible: product < 2**(16*(La+Lb))
    del carry
    return digits


def _pad_to(a, W):
    pad = W - a.shape[-1]
    if pad <= 0:
        return a
    return jnp.concatenate(
        [a, jnp.zeros(a.shape[:-1] + (pad,), U32)], axis=-1
    )


def _cond_sub(v17, m17):
    """One conditional subtract of m (17-limb) from v (17-limb), branchless."""
    d, borrow = _sub_raw(v17, m17)
    keep = (borrow == 1)
    return jnp.where(keep[..., None], v17, d)


def _cond_sub2(spec: FieldSpec, v17):
    """Reduce a 17-limb value < 3m below m with ONE batched borrow scan:
    both candidate subtrahends (m, 2m) ride a stacked leading lane."""
    m17 = np.asarray(spec.m17_limbs, np.uint64)
    m2 = (m17 + m17)  # 2m as 17 limbs (m < 2**272 / 2, no overflow)
    carry = 0
    m2_norm = np.zeros(17, np.uint32)
    for i in range(17):
        t = int(m2[i]) + carry
        m2_norm[i] = t & 0xFFFF
        carry = t >> 16
    assert carry == 0
    sub = jnp.stack(
        [jnp.asarray(spec.m17_limbs), jnp.asarray(m2_norm)]
    )  # (2, 17)
    lanes = jnp.broadcast_to(
        v17[..., None, :], v17.shape[:-1] + (2, 17)
    )
    d, borrow = _sub_raw(lanes, jnp.broadcast_to(sub, lanes.shape))
    d1, d2 = d[..., 0, :], d[..., 1, :]
    ge_m = borrow[..., 0] == 0
    ge_2m = borrow[..., 1] == 0
    out = jnp.where(ge_m[..., None], d1, v17)
    out = jnp.where(ge_2m[..., None], d2, out)
    return out


# --------------------------------------------------------------------------
# modular ops
# --------------------------------------------------------------------------

def zeros_like_elem(shape=()):
    return jnp.zeros(shape + (LIMBS,), U32)


def const(spec_or_int, batch_shape=()):
    """Broadcast a host integer (or limb array) to a batched field element."""
    if isinstance(spec_or_int, int):
        arr = int_to_limbs(spec_or_int)
    else:
        arr = np.asarray(spec_or_int, dtype=np.uint32)
    return jnp.broadcast_to(jnp.asarray(arr), batch_shape + (LIMBS,))


def add(spec: FieldSpec, a, b):
    """(a + b) mod m, elementwise over leading batch axes.

    Single-scan formulation: both candidates (a+b and a+b+K, where
    K = 2**256 - m so adding K and dropping bit 256 subtracts m) ride one
    batched carry propagation; the second lane's carry-out IS the a+b >= m
    test.  Columns < 3 * 2**16, well within _propagate's contract.
    """
    k_ext = np.zeros(LIMBS, np.uint32)
    k_ext[: len(spec.k_limbs)] = spec.k_limbs
    s = a + b
    lanes = jnp.stack([s, s + jnp.asarray(k_ext)], axis=-2)  # (..., 2, 16)
    d, c = _propagate(lanes)
    wrap = c[..., 1] == 1
    return jnp.where(wrap[..., None], d[..., 1, :], d[..., 0, :])


def sub(spec: FieldSpec, a, b):
    """(a - b) mod m.

    Single-scan formulation: a - b = a + ~b + 1 - 2**256; lane 1 gives
    a - b (valid when its carry-out is 1, i.e. a >= b), lane 2 adds m for
    the wrap-around case.  One batched carry propagation total.
    """
    e0 = np.zeros(LIMBS, np.uint32)
    e0[0] = 1
    u = a + (MASK - b) + jnp.asarray(e0)   # < 2**17 per column
    m = jnp.asarray(spec.m_limbs)
    lanes = jnp.stack([u, u + m], axis=-2)  # < 3 * 2**16 per column
    d, c = _propagate(lanes)
    no_borrow = c[..., 0] == 1
    return jnp.where(no_borrow[..., None], d[..., 0, :], d[..., 1, :])


def neg(spec: FieldSpec, a):
    return sub(spec, jnp.zeros_like(a), a)


def _reduce_barrett(spec: FieldSpec, v):
    """Branchless Barrett reduction (HAC Alg 14.42) of a normalized value
    (..., W <= 32 limbs) mod m; valid for any m > 2**240 (here m > 2**255).

    q_hat = floor(floor(v / 2**240) * mu / 2**272) with
    mu = floor(2**512 / m) satisfies q - 2 <= q_hat <= q = floor(v / m),
    so r = v - q_hat*m < 3m < 2**258: computed mod 2**272 (17 limbs,
    borrow discarded) and brought canonical by the stacked double
    conditional subtract.
    """
    v = _pad_to(v, 32)
    mu = jnp.asarray(spec.mu_limbs)
    q1 = v[..., 15:]                                   # (..., 17)
    q2 = _mul_raw(q1, jnp.broadcast_to(mu, q1.shape[:-1] + mu.shape))
    q3 = q2[..., 17:]                                  # (..., 17)
    m16 = jnp.asarray(spec.m_limbs)
    q3m = _mul_raw(q3, jnp.broadcast_to(m16, q3.shape[:-1] + m16.shape))
    r, _ = _sub_raw(v[..., :17], q3m[..., :17])        # mod 2**272
    return _cond_sub2(spec, r)[..., :LIMBS]


def reduce_wide(spec: FieldSpec, v):
    """Reduce a normalized wide value (..., W>=16 limbs) mod m.

    Accepts any width and value; a width-17 input is first zero-extended to
    18 limbs so at least one fold runs (the terminal width-17 state of the
    fold loop is bounded < 3m, which the two conditional subtracts cover;
    an arbitrary width-17 input is not).
    """
    if spec.mu_limbs is not None:
        return _reduce_barrett(spec, v)
    if _fast_k0(spec) is not None:
        return _reduce_cols_fast(spec, v)
    k = jnp.asarray(spec.k_limbs)
    if v.shape[-1] == 17:
        v = _pad_to(v, 18)
    while v.shape[-1] >= 18:
        L = v[..., :LIMBS]
        H = v[..., LIMBS:]
        hk = _mul_raw(H, jnp.broadcast_to(k, H.shape[:-1] + k.shape))
        W = max(LIMBS, hk.shape[-1])
        s, c = _add_raw(_pad_to(L, W), _pad_to(hk, W))
        v = jnp.concatenate([s, c[..., None]], axis=-1)
    v = _pad_to(v, 17)
    m17 = jnp.broadcast_to(jnp.asarray(spec.m17_limbs), v.shape)
    v = _cond_sub(v, m17)
    v = _cond_sub(v, m17)
    return v[..., :LIMBS]


def _fast_k0(spec: FieldSpec):
    """k0 if m = 2**256 - 2**32 - k0 with k0 small enough for the raw-column
    fold (k0 * 2**21 + 2**22 < 2**31, i.e. k0 <= 1022), else None.

    secp256k1's base field (K = 2**32 + 977) qualifies; its scalar field
    (K ~ 2**129) does not and takes the generic matmul-fold path.
    """
    k = spec.k_limbs
    if len(k) == 3 and int(k[1]) == 0 and int(k[2]) == 1 and int(k[0]) <= 1022:
        return int(k[0])
    return None


def _reduce_cols_fast(spec: FieldSpec, cols):
    """Reduce raw product columns (..., W >= 16, each < 2**22) mod m for
    m = 2**256 - 2**32 - k0: the fold L + H*K becomes two column shift-adds
    (k0*H at offset 0, H at offset 2) -- no matmul, and the first fold runs
    on raw columns before any carry propagation.

    Column bounds per fold: k0*2**21 + 2**21 + 2**22 < 2**31, within
    _propagate's input contract.
    """
    k0 = np.uint32(_fast_k0(spec))

    def fold(v):
        L, H = v[..., :LIMBS], v[..., LIMBS:]
        Hw = H.shape[-1]
        W = max(LIMBS, Hw + 2)
        f = _pad_to(L, W)
        f = f.at[..., :Hw].add(H * k0)
        f = f.at[..., 2 : 2 + Hw].add(H)
        return f

    v = cols
    assert v.shape[-1] <= 32
    if v.shape[-1] >= 20:
        # Wide product: fold raw columns (< 2**21 each; k0*2**21 + 2**22
        # < 2**31), then one cheap local pass -- no full scan needed yet.
        v = _local_pass(fold(v))  # width 19, columns < 2**17
    if v.shape[-1] == 17:
        v = _pad_to(v, 18)
    # Narrow state (width 17..19, columns < 2**17, so value < 2**257 + eps
    # after this fold): one fold + one full propagation.
    d, c = _propagate(fold(v))
    v = jnp.concatenate([d, c[..., None]], axis=-1)  # 17 digits, < 3m
    return _cond_sub2(spec, v)[..., :LIMBS]


def mul(spec: FieldSpec, a, b):
    """(a * b) mod m."""
    if _fast_k0(spec) is not None:
        return _reduce_cols_fast(spec, _mul_cols(a, b))
    return reduce_wide(spec, _mul_raw(a, b))


def sqr(spec: FieldSpec, a):
    return mul(spec, a, a)


def mul_small(spec: FieldSpec, a, c: int):
    """(a * c) mod m for a small host constant c < 2**16."""
    assert 0 <= c < (1 << RADIX_BITS)
    p = a * np.uint32(c)
    lo = p & MASK
    hi = p >> RADIX_BITS
    cols = _pad_to(lo, LIMBS + 1)
    cols = cols.at[..., 1 : LIMBS + 1].add(hi)
    digits, carry = _propagate(cols)
    del carry  # < 2**(256+16): width 17 covers it
    return reduce_wide(spec, digits)


def mul_small_vec(spec: FieldSpec, a, consts):
    """Per-lane small-constant mul: a (K, ..., 16) times consts (K,) ints.

    Lets callers fuse several different small-constant muls (e.g. the b3 and
    3 multiplications inside the complete EC formulas) into one kernel.
    """
    c = np.asarray(consts, dtype=np.uint32).reshape(
        (len(consts),) + (1,) * (a.ndim - 1)
    )
    assert int(c.max()) < (1 << RADIX_BITS)
    p = a * jnp.asarray(c)
    lo = p & MASK
    hi = p >> RADIX_BITS
    cols = _pad_to(lo, LIMBS + 1)
    cols = cols.at[..., 1 : LIMBS + 1].add(hi)
    digits, _ = _propagate(cols)
    return reduce_wide(spec, digits)


def pow_const(spec: FieldSpec, a, exp_bits: np.ndarray):
    """a ** e mod m for a fixed 256-bit exponent given as an MSB-first bit
    array (host constant).

    Two TPU-centric choices (this chain is the latency core of every
    Fiat-Shamir transcript -- it affinizes the whole point list):
      * the batch is FLATTENED to one axis for the mul chain: XLA lays out
        multi-axis limb batches poorly (measured on v5e: the same 540
        elements cost 36.5 ms as (27, 20, 16) vs 7 ms as (540, 16));
      * fixed 4-bit windows over the host-constant exponent: 64 iterations
        of 4 squarings + one table mul (~320 serial muls + cheap selects)
        instead of branchless square-and-multiply's 512 serial muls.
    """
    shape = a.shape
    a = a.reshape(-1, shape[-1])
    ebits = np.asarray(exp_bits)
    assert ebits.ndim == 1 and ebits.shape[0] % 4 == 0
    ndig = ebits.shape[0] // 4
    digs = np.asarray(
        [int(ebits[4 * i] * 8 + ebits[4 * i + 1] * 4
             + ebits[4 * i + 2] * 2 + ebits[4 * i + 3])
         for i in range(ndig)],
        dtype=np.uint32,
    )
    # window table a^0 .. a^15 (a^0 = 1: multiplying by it in a zero
    # window is a wasted-but-uniform mul; keeps the loop body branchless)
    tab = [const(1, a.shape[:-1]), a]
    for i in range(2, 16):
        tab.append(mul(spec, tab[i - 1], a))
    tab = jnp.stack(tab)                       # (16, N, L)
    digs_arr = jnp.asarray(digs)

    def body(i, acc):
        for _ in range(4):
            acc = mul(spec, acc, acc)
        d = digs_arr[i]
        # binary select tree over the 4 digit bits: 15 cheap wheres
        t = tab
        for bit in range(4):
            half = t.shape[0] // 2
            pairs = t.reshape((half, 2) + t.shape[1:])
            t = jnp.where(((d >> bit) & 1) == 1, pairs[:, 1], pairs[:, 0])
        return mul(spec, acc, t[0])

    out = jax.lax.fori_loop(0, ndig, body, const(1, a.shape[:-1]))
    return out.reshape(shape)


def inv(spec: FieldSpec, a):
    """a**-1 mod m via Fermat (a**(m-2)); inv(0) = 0.

    Fully batched (depth 256, perfectly parallel over the batch) -- on TPU
    this beats the Montgomery batch-inversion trick, whose sequential chain
    over the batch axis serializes the VPU.
    """
    return pow_const(spec, a, spec.exp_inv_bits)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def select(cond, a, b):
    """Elementwise select: cond (...,) bool -> limbs."""
    return jnp.where(cond[..., None], a, b)


def from_random_bits(spec: FieldSpec, bits32):
    """uint32 random words (..., 8 or 16) -> field element.

    8 words (fold-friendly moduli): values in [m, 2**256) wrap once; for m
    within 2**136 of 2**256 the statistical distance from uniform is
    < 2**-120.  16 words (Barrett moduli, e.g. P-256): the 512-bit value is
    reduced mod m, bias < 2**-256.
    """
    words = bits32.shape[-1]
    lo = bits32 & MASK
    hi = bits32 >> RADIX_BITS
    limbs = jnp.stack([lo, hi], axis=-1).reshape(
        bits32.shape[:-1] + (2 * words,)
    ).astype(U32)
    if words != 8:
        return reduce_wide(spec, limbs)
    v = _pad_to(limbs, 17)
    m17 = jnp.broadcast_to(jnp.asarray(spec.m17_limbs), v.shape)
    v = _cond_sub(v, m17)
    return v[..., :LIMBS]


def random(spec: FieldSpec, key, shape=()):
    """Uniform field elements from a jax.random key."""
    words = 8 if spec.mu_limbs is None else 16
    bits = jax.random.bits(key, shape + (words,), dtype=jnp.uint32)
    return from_random_bits(spec, bits)


# --------------------------------------------------------------------------
# byte serialization (big-endian, SEC1-compatible coordinate encoding)
# --------------------------------------------------------------------------

def to_bytes_be(a):
    """Field element (..., 16) -> big-endian bytes (..., 32) uint8."""
    limbs_be = a[..., ::-1]  # most-significant limb first
    hi = (limbs_be >> 8) & jnp.uint32(0xFF)
    lo = limbs_be & jnp.uint32(0xFF)
    inter = jnp.stack([hi, lo], axis=-1)  # (..., 16, 2)
    return inter.reshape(a.shape[:-1] + (32,)).astype(jnp.uint8)


def from_bytes_be(b):
    """Big-endian bytes (..., 32) uint8 -> limbs (..., 16) uint32."""
    b = b.astype(U32).reshape(b.shape[:-1] + (LIMBS, 2))
    limbs_be = (b[..., 0] << 8) | b[..., 1]
    return limbs_be[..., ::-1]
