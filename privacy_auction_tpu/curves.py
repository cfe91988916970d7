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
