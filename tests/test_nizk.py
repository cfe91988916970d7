"""NIZK layer tests: gen<->verify roundtrips, tampering, FS transcripts.

The reference has no unit tests for its proof systems (SURVEY.md section 4);
these exercise each system's honest path, the OR-proof branch structure
(every bit combination), and adversarial rejection.
"""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_auction_tpu import nizk
from privacy_auction_tpu.curves import SECP256K1 as CURVE
from privacy_auction_tpu.ops import ec as EC
from privacy_auction_tpu.ops import field as F

HOST = CURVE.host
FN = CURVE.fn


def _rand_scalars(rng, shape):
    flat = [rng.randrange(1, HOST.n) for _ in range(int(np.prod(shape)))]
    return (
        jnp.asarray(F.ints_to_limbs(flat)).reshape(shape + (F.LIMBS,)),
        np.array(flat).reshape(shape),
    )


def _host_fs_challenge(points, ident):
    """Host oracle for fs_challenge: points are host affine pairs or None."""
    h = hashlib.sha256()
    g = HOST.g
    h.update(b"\x04" + g[0].to_bytes(32, "big") + g[1].to_bytes(32, "big"))
    for p in points:
        if p is None:
            h.update(b"\x00" * 65)
        else:
            h.update(
                b"\x04" + p[0].to_bytes(32, "big") + p[1].to_bytes(32, "big")
            )
    h.update(int(ident).to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "big") % HOST.n


def test_fs_challenge_matches_host(rng):
    scalars = [rng.randrange(1, HOST.n) for _ in range(3)]
    pts_host = [HOST.mul(s, HOST.g) for s in scalars]
    P = [jnp.asarray(EC.encode_host_points([p])) for p in pts_host]
    ids = jnp.asarray(np.array([5], dtype=np.uint32))
    got = jax.jit(
        lambda a, b, c, i: nizk.fs_challenge(CURVE, [a, b, c], i)
    )(P[0], P[1], P[2], ids)
    want = _host_fs_challenge(pts_host, 5)
    assert F.limbs_to_int(np.asarray(got)[0]) == want


def test_fs_step_binding(rng):
    """Domain separation: a proof bound to step 0 must not verify at
    step 1 (replay across auction steps)."""
    key = jax.random.key(5)
    x, _ = _rand_scalars(rng, (2,))
    X = EC.mul_base(CURVE, x)
    ids = jnp.arange(2, dtype=jnp.uint32)
    proof = nizk.gen_pokdlog(CURVE, key, X, x, ids, steps=0)
    ok = nizk.ver_pokdlog(CURVE, proof, X, ids, steps=0)
    bad = nizk.ver_pokdlog(CURVE, proof, X, ids, steps=1)
    assert bool(np.asarray(ok).all())
    assert not bool(np.asarray(bad).any())


def test_pokdlog_roundtrip(rng):
    key = jax.random.key(42)
    x, _ = _rand_scalars(rng, (4,))
    X = EC.mul_base(CURVE, x)
    ids = jnp.arange(4, dtype=jnp.uint32)
    proof = jax.jit(lambda k, X_, x_, i: nizk.gen_pokdlog(CURVE, k, X_, x_, i))(
        key, X, x, ids
    )
    ok = jax.jit(lambda p, X_, i: nizk.ver_pokdlog(CURVE, p, X_, i))(
        proof, X, ids
    )
    assert bool(np.asarray(ok).all())
    # wrong id -> reject
    bad = nizk.ver_pokdlog(CURVE, proof, X, ids + 1)
    assert not bool(np.asarray(bad).any())
    # tampered rho -> reject
    proof2 = proof._replace(rho=F.add(FN, proof.rho, F.const(1, (4,))))
    bad2 = nizk.ver_pokdlog(CURVE, proof2, X, ids)
    assert not bool(np.asarray(bad2).any())


def _commitment(rng, bits):
    """Host-generated commitment triple for given bits: returns device arrays
    (phi, A, B, alpha limbs)."""
    n = len(bits)
    alpha, alpha_i = _rand_scalars(rng, (n,))
    beta, beta_i = _rand_scalars(rng, (n,))
    phi_h, A_h, B_h = [], [], []
    for i, b in enumerate(bits):
        ab = (int(alpha_i[i]) * int(beta_i[i]) + b) % HOST.n
        phi_h.append(HOST.mul(ab, HOST.g))
        A_h.append(HOST.mul(int(alpha_i[i]), HOST.g))
        B_h.append(HOST.mul(int(beta_i[i]), HOST.g))
    return (
        jnp.asarray(EC.encode_host_points(phi_h)),
        jnp.asarray(EC.encode_host_points(A_h)),
        jnp.asarray(EC.encode_host_points(B_h)),
        alpha,
        beta,
    )


def test_powfcom_roundtrip(rng):
    bits = [0, 1, 0, 1]
    phi, A, B, alpha, _ = _commitment(rng, bits)
    bit = jnp.asarray(np.array(bits, dtype=np.uint32))
    ids = jnp.arange(4, dtype=jnp.uint32)
    key = jax.random.key(7)
    proof = jax.jit(
        lambda k, p, a, b, al, bi, i: nizk.gen_powfcom(CURVE, k, p, a, b, al, bi, i)
    )(key, phi, A, B, alpha, bit, ids)
    ok = jax.jit(
        lambda pr, p, a, b, i: nizk.ver_powfcom(CURVE, pr, p, a, b, i)
    )(proof, phi, A, B, ids)
    assert bool(np.asarray(ok).all())
    # commitment to bit=2 (phi = g^(ab+2)) must not be provable as 0 or 1:
    # tamper phi by adding g -> verification fails
    phi_bad = EC.add(CURVE, phi, EC.from_affine(
        F.const(int(HOST.gx), (4,)), F.const(int(HOST.gy), (4,))))
    bad = nizk.ver_powfcom(CURVE, proof, phi_bad, A, B, ids)
    assert not bool(np.asarray(bad).any())
    # tampered ch2 -> reject
    proof2 = proof._replace(ch2=F.add(FN, proof.ch2, F.const(1, (4,))))
    bad2 = nizk.ver_powfcom(CURVE, proof2, phi, A, B, ids)
    assert not bool(np.asarray(bad2).any())


def test_powfstage1_roundtrip(rng):
    # Full AV-net context for 4 bidders in one step, every bit combo
    n = 4
    bits = [0, 1, 1, 0]
    x, x_i = _rand_scalars(rng, (n,))
    r, r_i = _rand_scalars(rng, (n,))
    X = EC.mul_base(CURVE, x)
    R = EC.mul_base(CURVE, r)
    # Y_i = sum_{j<i} X_j - sum_{j>i} X_j (host computed)
    X_h = [HOST.mul(int(v), HOST.g) for v in x_i]
    Y_h = []
    for i in range(n):
        acc = None
        for j in range(i):
            acc = HOST.add(acc, X_h[j])
        for j in range(i + 1, n):
            acc = HOST.add(acc, HOST.neg(X_h[j]))
        Y_h.append(acc)
    Y = jnp.asarray(EC.encode_host_points(Y_h))
    # b = Y^x if bit==0 else R^x
    b_h = [
        HOST.mul(int(x_i[i]), Y_h[i] if bits[i] == 0 else
                 HOST.mul(int(r_i[i]), HOST.g))
        for i in range(n)
    ]
    b = jnp.asarray(EC.encode_host_points(b_h))
    phi, A, B, alpha, _ = _commitment(rng, bits)
    bit = jnp.asarray(np.array(bits, dtype=np.uint32))
    ids = jnp.arange(n, dtype=jnp.uint32)
    key = jax.random.key(11)
    proof, b_dev = jax.jit(
        lambda k, *a: nizk.gen_powfstage1(CURVE, k, *a)
    )(key, X, Y, R, phi, A, B, x, alpha, bit, ids)
    # the proof's internally-computed ciphertext matches the host oracle
    assert bool(np.asarray(EC.eq(CURVE, b_dev, b)).all())
    ok = jax.jit(
        lambda pr, *a: nizk.ver_powfstage1(CURVE, pr, *a)
    )(proof, b, X, Y, R, phi, A, B, ids)
    assert bool(np.asarray(ok).all())
    # flipping the encoded bit point (swap b for R^x when bit was 0) -> reject
    b_flip_h = [
        HOST.mul(int(x_i[i]), HOST.mul(int(r_i[i]), HOST.g) if bits[i] == 0
                 else Y_h[i])
        for i in range(n)
    ]
    b_flip = jnp.asarray(EC.encode_host_points(b_flip_h))
    bad = nizk.ver_powfstage1(CURVE, proof, b_flip, X, Y, R, phi, A, B, ids)
    assert not bool(np.asarray(bad).any())


def test_powfstage2_roundtrip(rng):
    # all three legal (bi, bj) combos + context from two AV-net steps
    n = 3
    combos = [(1, 1), (0, 1), (0, 0)]
    bi = jnp.asarray(np.array([c[0] for c in combos], dtype=np.uint32))
    bj = jnp.asarray(np.array([c[1] for c in combos], dtype=np.uint32))

    def avnet_step(rng, bits):
        x, x_i = _rand_scalars(rng, (n,))
        r, r_i = _rand_scalars(rng, (n,))
        X_h = [HOST.mul(int(v), HOST.g) for v in x_i]
        Y_h = []
        for i in range(n):
            acc = None
            for j in range(i):
                acc = HOST.add(acc, X_h[j])
            for j in range(i + 1, n):
                acc = HOST.add(acc, HOST.neg(X_h[j]))
            Y_h.append(acc)
        b_h = [
            HOST.mul(int(x_i[i]), Y_h[i] if bits[i] == 0 else
                     HOST.mul(int(r_i[i]), HOST.g))
            for i in range(n)
        ]
        enc = lambda hs: jnp.asarray(EC.encode_host_points(hs))
        R_h = [HOST.mul(int(v), HOST.g) for v in r_i]
        return x, enc(X_h), enc(R_h), enc(Y_h), enc(b_h)

    bits_i = [c[0] for c in combos]
    bits_j = [c[1] for c in combos]
    xi, Xi, Ri, Yi, Bi = avnet_step(rng, bits_i)
    xj, Xj, Rj, Yj, Bj = avnet_step(rng, bits_j)
    Ci, A, B, alphai, _ = _commitment(rng, bits_i)
    gen_pts = dict(Xi=Xi, Ri=Ri, Bj=Bj, Xj=Xj, Rj=Rj,
                   Ci=Ci, A=A, B=B, Yi=Yi, Yj=Yj)
    ids = jnp.arange(n, dtype=jnp.uint32)
    key = jax.random.key(13)
    proof, bi_dev = jax.jit(
        lambda k, p, a1, a2, a3, b1, b2, i:
            nizk.gen_powfstage2(CURVE, k, p, a1, a2, a3, b1, b2, i)
    )(key, gen_pts, xi, xj, alphai, bi, bj, ids)
    assert bool(np.asarray(EC.eq(CURVE, bi_dev, Bi)).all())
    pts = dict(gen_pts, Bi=Bi)
    ok = jax.jit(lambda pr, p, i: nizk.ver_powfstage2(CURVE, pr, p, i))(
        proof, pts, ids
    )
    assert bool(np.asarray(ok).all())
    # tamper one published challenge -> reject
    proof2 = proof._replace(ch3=F.add(FN, proof.ch3, F.const(1, (n,))))
    bad = nizk.ver_powfstage2(CURVE, proof2, pts, ids)
    assert not bool(np.asarray(bad).any())
