"""Device-facing curve registry.

Bundles the two field specs (base field, scalar field), curve constants, and
host-precomputed fixed-base comb tables for the generator.

Reference parity: the reference hardcodes OpenSSL curve id 714 = secp256k1
(`/root/reference/SEAL/params.h:4`, `CCS22/params.h:4`); here the curve is a
first-class parameter with secp256k1 as the default.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field as dc_field

import numpy as np

from .ops import field as F
from .utils.host_curve import HOST_CURVES, HostCurve

COMB_WINDOW = 4                      # bits per comb window
COMB_WINDOWS = 256 // COMB_WINDOW    # 64 windows
COMB_SIZE = 1 << COMB_WINDOW         # 16 table entries per window


@dataclass(frozen=True)
class Curve:
    """A short-Weierstrass curve prepared for the TPU kernels."""

    name: str
    host: HostCurve = dc_field(repr=False)
    fp: F.FieldSpec = dc_field(repr=False)   # base field GF(p)
    fn: F.FieldSpec = dc_field(repr=False)   # scalar field GF(n)
    b3: int = 0                              # 3*b (a=0 fast path constant)

    def __hash__(self):
        return hash(self.name)

    def __eq__(self, other):
        return isinstance(other, Curve) and self.name == other.name

    @property
    def a_is_zero(self) -> bool:
        """a == 0 selects the specialized RCB16 Alg 7/9 formulas and the
        Pallas fast path; otherwise the generic Alg 1/3 path runs."""
        return self.host.a == 0

    @functools.cached_property
    def a_limbs(self) -> np.ndarray:
        """(16,) curve coefficient a as a field element (generic path)."""
        return F.int_to_limbs(self.host.a % self.host.p)

    @functools.cached_property
    def b_limbs(self) -> np.ndarray:
        return F.int_to_limbs(self.host.b % self.host.p)

    @functools.cached_property
    def b3_limbs(self) -> np.ndarray:
        """(16,) 3*b mod p as a full field element (generic path; P-256's
        b is full-width so the a=0 small-constant shortcut cannot apply)."""
        return F.int_to_limbs(3 * self.host.b % self.host.p)

    @functools.cached_property
    def generator_affine(self) -> np.ndarray:
        """(2, 16) limbs: generator (x, y)."""
        return np.stack(
            [F.int_to_limbs(self.host.gx), F.int_to_limbs(self.host.gy)]
        )

    @functools.cached_property
    def comb_table(self) -> np.ndarray:
        """Fixed-base comb table for the generator.

        Shape (COMB_WINDOWS, COMB_SIZE, 3, 16): entry [w][d] is the
        projective representation of d * 2**(4w) * G (digit 0 = infinity).
        Computed once on the host with exact integer arithmetic.
        """
        return make_comb_table(self.host, self.host.g)

    @functools.cached_property
    def glv(self) -> "GlvParams | None":
        """GLV endomorphism parameters, or None if the curve has no
        efficient endomorphism (a=0 with p = 1 mod 3 required)."""
        return derive_glv_params(self.host)


GLV_SHIFT = 272           # rounding-division shift (k*g >> 272)
GLV_WINDOWS = 33          # 4-bit windows covering |k_i| < 2**132


@dataclass(frozen=True)
class GlvParams:
    """Host-derived GLV decomposition constants (all verified at
    derivation time; nothing is hardcoded).

    The secp256k1 endomorphism phi(x, y) = (beta*x, y) equals scalar
    multiplication by lam (lam^3 = 1 mod n); k*P is computed as
    k1*P + k2*phi(P) with |k1|, |k2| < 2**130, halving the doubling
    chain of the scalar-mult ladders.  OpenSSL does not implement this
    for secp256k1 (the reference pays full-width ladders; libsecp256k1's
    speedup technique, re-derived here from first principles).
    """

    lam: int               # scalar of the endomorphism, order 3 mod n
    beta: int              # x-coordinate multiplier, order 3 mod p
    n: int                 # group order (for host-side decomposition)
    # lattice basis (a1, b1), (a2, b2): ai + bi*lam = 0 mod n
    a1: int
    b1: int
    a2: int
    b2: int
    # rounding-division multipliers: gi = round(2**GLV_SHIFT * x / n)
    g1: int                # x = b2
    g2: int                # x = -b1
    beta_limbs: np.ndarray = dc_field(repr=False)
    # basis elements reduced mod n, as limb constants for the device
    a1n_limbs: np.ndarray = dc_field(repr=False)
    a2n_limbs: np.ndarray = dc_field(repr=False)
    b1n_limbs: np.ndarray = dc_field(repr=False)
    b2n_limbs: np.ndarray = dc_field(repr=False)
    g1_limbs: np.ndarray = dc_field(repr=False)   # (10,)
    g2_limbs: np.ndarray = dc_field(repr=False)

    def decompose_host(self, k: int):
        """Reference decomposition in exact ints (oracle for tests):
        returns (k1, k2) signed with k1 + k2*lam = k mod n."""
        c1 = _round_div(self.b2 * k, self.n)
        c2 = _round_div(-self.b1 * k, self.n)
        k1 = k - c1 * self.a1 - c2 * self.a2
        k2 = -c1 * self.b1 - c2 * self.b2
        return k1, k2


def _round_div(a: int, b: int) -> int:
    """round(a / b) for b > 0, exact."""
    return (2 * a + b) // (2 * b)


def derive_glv_params(host: HostCurve) -> GlvParams | None:
    """Derive the GLV constants for an a=0 curve from first principles.

    1. lam = element of order 3 in GF(n)*, beta = order-3 in GF(p)*,
       paired so that lam*G == (beta*gx, gy) (try both candidates).
    2. Short lattice basis for {(x, y): x + y*lam = 0 mod n} via the
       extended Euclidean algorithm truncated at sqrt(n) (GLV01 / Guide
       to ECC Alg 3.74).
    3. gi = round(2**272 * |bi| / n) for the device's rounding division.
    Every property is asserted before returning.
    """
    p, n = host.p, host.n
    if host.a != 0 or p % 3 != 1 or n % 3 != 1:
        return None
    # order-3 elements: x**((m-1)/3) for a non-cube x
    def order3(m):
        for x in range(2, 100):
            c = pow(x, (m - 1) // 3, m)
            if c != 1:
                return c
        raise RuntimeError("no order-3 element found")

    lam = order3(n)
    beta = order3(p)
    # pair lam with the matching beta (beta or beta^2)
    target = host.mul(lam, host.g)
    if target != (beta * host.gx % p, host.gy):
        beta = beta * beta % p
        assert target == (beta * host.gx % p, host.gy), "beta/lam mismatch"

    # extended Euclid on (n, lam): s*n + t*lam = r
    rs = [n, lam]
    ts = [0, 1]
    while rs[-1] ** 2 >= n:
        q = rs[-2] // rs[-1]
        rs.append(rs[-2] - q * rs[-1])
        ts.append(ts[-2] - q * ts[-1])
    # rs[-1] is the first remainder < sqrt(n); candidates per GECC 3.74
    a1, b1 = rs[-1], -ts[-1]
    # second vector: the shorter of (r_{l}, -t_{l}) and (r_{l+2}, -t_{l+2})
    cand_prev = (rs[-2], -ts[-2])
    q = rs[-2] // rs[-1]
    r_next = rs[-2] - q * rs[-1]
    t_next = ts[-2] - q * ts[-1]
    cand_next = (r_next, -t_next)
    a2, b2 = min(
        cand_prev, cand_next, key=lambda v: v[0] * v[0] + v[1] * v[1]
    )
    for (ai, bi) in ((a1, b1), (a2, b2)):
        assert (ai + bi * lam) % n == 0, "lattice basis invariant"
        assert abs(ai) < (1 << 129) and abs(bi) < (1 << 129)

    g1 = _round_div((1 << GLV_SHIFT) * b2, n)
    g2 = _round_div((1 << GLV_SHIFT) * -b1, n)
    assert 0 <= g1 < (1 << 160) and 0 <= g2 < (1 << 160)

    params = GlvParams(
        lam=lam, beta=beta, n=n, a1=a1, b1=b1, a2=a2, b2=b2, g1=g1, g2=g2,
        beta_limbs=F.int_to_limbs(beta),
        a1n_limbs=F.int_to_limbs(a1 % n),
        a2n_limbs=F.int_to_limbs(a2 % n),
        b1n_limbs=F.int_to_limbs(b1 % n),
        b2n_limbs=F.int_to_limbs(b2 % n),
        g1_limbs=F.int_to_limbs(g1, 10),
        g2_limbs=F.int_to_limbs(g2, 10),
    )
    # end-to-end sanity on a few scalars
    for k in (0, 1, n - 1, 0xDEADBEEF, (1 << 255) - 19):
        k1, k2 = params.decompose_host(k)
        assert (k1 + k2 * lam - k) % n == 0, "decomposition identity"
        assert abs(k1) < (1 << 132) and abs(k2) < (1 << 132)
    return params


def make_comb_table(host: HostCurve, base_affine) -> np.ndarray:
    """Host-side comb table for an arbitrary base point (affine int pair)."""
    out = np.zeros((COMB_WINDOWS, COMB_SIZE, 3, F.LIMBS), dtype=np.uint32)
    base = base_affine
    for w in range(COMB_WINDOWS):
        out[w, 0] = _encode_host_point(None)
        acc = None
        for d in range(1, COMB_SIZE):
            acc = host.add(acc, base)
            out[w, d] = _encode_host_point(acc)
        # base <- 2**COMB_WINDOW * base
        for _ in range(COMB_WINDOW):
            base = host.add(base, base)
    return out


def _encode_host_point(P) -> np.ndarray:
    """Affine host point (or None = infinity) -> (3, 16) projective limbs."""
    if P is None:
        return np.stack(
            [F.int_to_limbs(0), F.int_to_limbs(1), F.int_to_limbs(0)]
        )
    x, y = P
    return np.stack([F.int_to_limbs(x), F.int_to_limbs(y), F.int_to_limbs(1)])


@functools.lru_cache(maxsize=None)
def get_curve(name: str = "secp256k1") -> Curve:
    host = HOST_CURVES[name]
    return Curve(
        name=name,
        host=host,
        fp=F.make_spec(f"{name}_p", host.p),
        fn=F.make_spec(f"{name}_n", host.n),
        b3=3 * host.b if host.a == 0 else 0,
    )


SECP256K1 = get_curve("secp256k1")
