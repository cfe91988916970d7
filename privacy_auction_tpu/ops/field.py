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
    """A prime field GF(m) with m = 2**256 - K, K < 2**136."""

    name: str
    modulus: int
    m_limbs: np.ndarray = dc_field(repr=False)          # (16,)
    m17_limbs: np.ndarray = dc_field(repr=False)        # (17,) m zero-extended
    k_limbs: np.ndarray = dc_field(repr=False)          # (nk,) K = 2**256 - m
    exp_inv_bits: np.ndarray = dc_field(repr=False)     # (256,) bits of m-2, MSB first

    def __hash__(self):
        return hash((self.name, self.modulus))

    def __eq__(self, other):
        return isinstance(other, FieldSpec) and self.modulus == other.modulus


@functools.lru_cache(maxsize=None)
def make_spec(name: str, modulus: int) -> FieldSpec:
    K = (1 << 256) - modulus
    assert 0 < K < (1 << 136), "fold reduction requires m within 2**136 of 2**256"
    nk = max(1, (K.bit_length() + RADIX_BITS - 1) // RADIX_BITS)
    exp = modulus - 2
    bits = np.array([(exp >> (255 - i)) & 1 for i in range(256)], dtype=np.uint32)
    return FieldSpec(
        name=name,
        modulus=modulus,
        m_limbs=int_to_limbs(modulus, LIMBS),
        m17_limbs=int_to_limbs(modulus, 17),
        k_limbs=int_to_limbs(K, nk),
        exp_inv_bits=bits,
    )


# --------------------------------------------------------------------------
# limb-vector primitives (width-generic, branchless)
# --------------------------------------------------------------------------

def _propagate(cols):
    """Carry-propagate columns (each < 2**31) into 16-bit digits.

    Returns (digits (..., W), carry_out (...,)).  Unrolled at trace time:
    W sequential steps, each a cheap vectorized op over the batch.
    """
    W = cols.shape[-1]
    carry = jnp.zeros(cols.shape[:-1], U32)
    out = []
    for i in range(W):
        t = cols[..., i] + carry
        out.append(t & MASK)
        carry = t >> RADIX_BITS
    return jnp.stack(out, axis=-1), carry


def _add_raw(a, b):
    """Add two normalized limb vectors of equal width -> (digits, carry_out)."""
    return _propagate(a + b)


def _sub_raw(a, b):
    """Subtract b from a (equal width, both normalized 16-bit digits).

    Returns (digits, borrow_out in {0,1}).
    """
    W = a.shape[-1]
    borrow = jnp.zeros(a.shape[:-1], U32)
    out = []
    for i in range(W):
        t = b[..., i] + borrow
        ai = a[..., i]
        nb = (ai < t).astype(U32)
        out.append((ai - t) & MASK)
        borrow = nb
    return jnp.stack(out, axis=-1), borrow


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


def _mul_raw(a, b):
    """Schoolbook product of normalized limb vectors -> (La+Lb) digits.

    TPU-first formulation: the 32-bit partial products are computed exactly
    on the VPU (uint32), split into byte planes, and column-accumulated by a
    single matmul against a constant scatter matrix -- the anti-diagonal
    sums ride the MXU instead of a chain of dynamic-update-slices.  Column
    sums stay < 2**21 (< 2**24), so f32 accumulation is exact.
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
    digits, carry = _propagate(cols_f.astype(U32))
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
    """(a + b) mod m, elementwise over leading batch axes."""
    s, c = _add_raw(a, b)
    m = jnp.asarray(spec.m_limbs)
    d, borrow = _sub_raw(s, jnp.broadcast_to(m, s.shape))
    use_d = (c == 1) | (borrow == 0)
    return jnp.where(use_d[..., None], d, s)


def sub(spec: FieldSpec, a, b):
    """(a - b) mod m."""
    d, borrow = _sub_raw(a, b)
    m = jnp.asarray(spec.m_limbs)
    d_plus_m, _ = _add_raw(d, jnp.broadcast_to(m, d.shape))
    return jnp.where((borrow == 1)[..., None], d_plus_m, d)


def neg(spec: FieldSpec, a):
    return sub(spec, jnp.zeros_like(a), a)


def reduce_wide(spec: FieldSpec, v):
    """Reduce a normalized wide value (..., W>=16 limbs) mod m.

    Accepts any width and value; a width-17 input is first zero-extended to
    18 limbs so at least one fold runs (the terminal width-17 state of the
    fold loop is bounded < 3m, which the two conditional subtracts cover;
    an arbitrary width-17 input is not).
    """
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


def mul(spec: FieldSpec, a, b):
    """(a * b) mod m."""
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
    """a ** e mod m for a fixed 256-bit exponent given as MSB-first bit array."""
    bits = jnp.asarray(exp_bits)

    one = const(1, a.shape[:-1])

    def body(i, acc):
        acc = mul(spec, acc, acc)
        acc_m = mul(spec, acc, a)
        return jnp.where(bits[i].astype(bool), acc_m, acc)

    return jax.lax.fori_loop(0, bits.shape[0], body, one)


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
    """uint32 random words (..., 8) -> field element (bias < 2**-120).

    Values in [m, 2**256) wrap once; for m within 2**136 of 2**256 the
    statistical distance from uniform is negligible.
    """
    lo = bits32 & MASK
    hi = bits32 >> RADIX_BITS
    limbs = jnp.stack([lo, hi], axis=-1).reshape(bits32.shape[:-1] + (LIMBS,))
    v = _pad_to(limbs.astype(U32), 17)
    m17 = jnp.broadcast_to(jnp.asarray(spec.m17_limbs), v.shape)
    v = _cond_sub(v, m17)
    return v[..., :LIMBS]


def random(spec: FieldSpec, key, shape=()):
    """Uniform field elements from a jax.random key."""
    bits = jax.random.bits(key, shape + (8,), dtype=jnp.uint32)
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
