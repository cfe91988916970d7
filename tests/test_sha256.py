"""Differential tests: batched JAX SHA-256 vs Python hashlib."""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_auction_tpu.ops import field as F
from privacy_auction_tpu.ops.sha256 import digest_to_scalar, sha256


def _ref_digest_words(data: bytes) -> np.ndarray:
    d = hashlib.sha256(data).digest()
    return np.frombuffer(d, dtype=">u4").astype(np.uint32)


@pytest.mark.parametrize("length", [0, 1, 3, 55, 56, 64, 65, 127, 203, 1828])
def test_sha256_lengths(length, nprng):
    msg = nprng.integers(0, 256, size=(length,), dtype=np.uint8)
    got = np.asarray(sha256(jnp.asarray(msg)))
    want = _ref_digest_words(msg.tobytes())
    np.testing.assert_array_equal(got, want)


def test_sha256_batched(nprng):
    msgs = nprng.integers(0, 256, size=(4, 5, 73), dtype=np.uint8)
    got = np.asarray(jax.jit(sha256)(jnp.asarray(msgs)))
    for i in range(4):
        for j in range(5):
            want = _ref_digest_words(msgs[i, j].tobytes())
            np.testing.assert_array_equal(got[i, j], want)


def test_digest_to_scalar(nprng):
    from privacy_auction_tpu.curves import SECP256K1

    spec = SECP256K1.fn
    msgs = nprng.integers(0, 256, size=(6, 65), dtype=np.uint8)
    digest = sha256(jnp.asarray(msgs))
    scal = np.asarray(digest_to_scalar(spec, digest))
    for i in range(6):
        h = int.from_bytes(hashlib.sha256(msgs[i].tobytes()).digest(), "big")
        assert F.limbs_to_int(scal[i]) == h % spec.modulus
