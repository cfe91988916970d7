"""Adversarial end-to-end tests: tampered board messages must abort.

The reference aborts the whole auction (exit 1) when any NIZK check fails
(`/root/reference/SEAL/main.cpp:56-58,83-86,103-106`).  Here a malicious
lane is injected through `run_auction`'s tamper hook (what lands on the
bulletin board differs from what the honest prover computed) and the
auction must return verified=False / max_bid=-1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_auction_tpu.curves import SECP256K1 as CURVE
from privacy_auction_tpu.ops import ec as EC
from privacy_auction_tpu.protocols import seal

N, C = 3, 3
BIDS = [5, 3, 6]  # MSB of the max is 1 -> step 0 decides, step 1 is Stage2


def _g():
    return jnp.asarray(CURVE.comb_table[0, 1])  # generator, projective limbs


def _bump_point(P, *idx):
    """Replace P[idx] with P[idx] + G (an undetectably-formatted but
    algebraically inconsistent point)."""
    bumped = EC.add(CURVE, P[idx], _g())
    return P.at[idx].set(bumped)


def _run(tamper):
    return seal.run_auction(
        CURVE, jax.random.key(42), BIDS, C, verify=True, tamper=tamper
    )


def test_honest_control():
    res = _run(None)
    assert res.verified and res.max_bid == max(BIDS)


def test_tampered_commitment_phi():
    # commitment no longer encodes a bit in {0,1} w.r.t. its PoWFCom
    def tamper(phase, step, pub):
        if phase == "commit":
            return pub._replace(phi=_bump_point(pub.phi, 0, 0))
        return pub

    res = _run(tamper)
    assert not res.verified and res.max_bid == -1


def test_tampered_round1_key():
    # published X_0 inconsistent with its Schnorr proof
    def tamper(phase, step, pub):
        if phase == "round1" and step == 0:
            return pub._replace(X=_bump_point(pub.X, 1))
        return pub

    res = _run(tamper)
    assert not res.verified and res.max_bid == -1


def test_tampered_round2_ciphertext_stage1():
    # board ciphertext b_0 differs from the one bound by the Stage1 NIZK
    def tamper(phase, step, pub):
        if phase == "round2" and step == 0:
            return pub._replace(b=_bump_point(pub.b, 0))
        return pub

    res = _run(tamper)
    assert not res.verified and res.max_bid == -1


def test_tampered_round2_ciphertext_stage2():
    # step 0 decides (junction), step 1 proof is Stage2: tampering the
    # post-junction ciphertext must fail the Stage2 consistency check
    def tamper(phase, step, pub):
        if phase == "round2" and step == 1:
            assert pub.proof2 is not None, "step 1 must be post-junction"
            return pub._replace(b=_bump_point(pub.b, 2))
        return pub

    res = _run(tamper)
    assert not res.verified and res.max_bid == -1


def test_tampered_stage2_challenge():
    # corrupting a published Stage2 challenge scalar breaks ch1+ch2+ch3 == ch
    def tamper(phase, step, pub):
        if phase == "round2" and step == 1:
            p2 = pub.proof2
            ch2 = p2.ch2.at[..., 0].set(p2.ch2[..., 0] ^ 1)
            return pub._replace(proof2=p2._replace(ch2=ch2))
        return pub

    res = _run(tamper)
    assert not res.verified and res.max_bid == -1
