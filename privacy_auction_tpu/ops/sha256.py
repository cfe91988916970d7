"""Batched SHA-256 for TPU (pure JAX, uint32 lanes).

Used for Fiat-Shamir challenges and the CCS22 setup hash.  The reference
gets this from OpenSSL EVP (`/root/reference/SEAL/hash.cpp:8-228`,
`CCS22/hash.cpp:9-57`); here it is a data-parallel kernel: one hash state
per batch lane, message blocks walked with `lax.scan`, the 64 rounds
unrolled at trace time (cheap uint32 VPU ops).

Message lengths are static (proof transcripts have fixed point counts), so
padding is resolved at trace time and every lane hashes the same number of
blocks -- no data-dependent control flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32

_K = np.array([
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
], dtype=np.uint32)

_H0 = np.array([
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
], dtype=np.uint32)


def _rotr(x, k: int):
    return (x >> np.uint32(k)) | (x << np.uint32(32 - k))


def _compress(state, w):
    """One SHA-256 block: state (..., 8), w (..., 16) -> new state.

    The 64 rounds ride a lax.fori_loop (graph-lean: one round body compiled
    once); the message schedule keeps a 16-word rolling window indexed with
    dynamic slices.  For t < 16 the schedule update is computed but
    discarded via a select -- constant shapes, no control flow.
    """
    K = jnp.asarray(_K)

    def idx(win, j):
        return jax.lax.dynamic_index_in_dim(win, j % 16, axis=-1,
                                            keepdims=False)

    def round_fn(t, carry):
        st, win = carry
        a, b, c, d, e, f, g, h = (st[..., i] for i in range(8))
        w15 = idx(win, t + 1)    # (t - 15) mod 16
        w2 = idx(win, t + 14)    # (t - 2) mod 16
        w7 = idx(win, t + 9)     # (t - 7) mod 16
        w0 = idx(win, t)         # t mod 16
        s0 = _rotr(w15, 7) ^ _rotr(w15, 18) ^ (w15 >> np.uint32(3))
        s1 = _rotr(w2, 17) ^ _rotr(w2, 19) ^ (w2 >> np.uint32(10))
        sched = w0 + s0 + w7 + s1
        wt = jnp.where(t < 16, w0, sched)
        win = jax.lax.dynamic_update_index_in_dim(win, wt, t % 16, axis=-1)
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        temp1 = h + S1 + ch + K[t] + wt
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        temp2 = S0 + maj
        st = jnp.stack(
            [temp1 + temp2, a, b, c, d + temp1, e, f, g], axis=-1
        )
        return st, win

    out, _ = jax.lax.fori_loop(0, 64, round_fn, (state, w))
    return out + state


@functools.lru_cache(maxsize=None)
def _padding_bytes(msg_len: int) -> np.ndarray:
    """Static SHA-256 padding for a message of msg_len bytes."""
    pad_len = (56 - (msg_len + 1)) % 64
    pad = np.zeros(1 + pad_len + 8, dtype=np.uint8)
    pad[0] = 0x80
    bitlen = msg_len * 8
    for i in range(8):
        pad[1 + pad_len + i] = (bitlen >> (8 * (7 - i))) & 0xFF
    return pad


def sha256(msg) -> jnp.ndarray:
    """SHA-256 of byte messages: (..., L) uint8 -> (..., 8) uint32 digest words.

    L is static; all lanes share it.  Digest words are the standard
    big-endian H0..H7 (word 0 is the most significant 32 bits).
    """
    L = msg.shape[-1]
    batch = msg.shape[:-1]
    pad = jnp.broadcast_to(
        jnp.asarray(_padding_bytes(L)), batch + (_padding_bytes(L).shape[0],)
    )
    full = jnp.concatenate([msg, pad], axis=-1)
    nbytes = full.shape[-1]
    assert nbytes % 64 == 0
    nblocks = nbytes // 64

    # bytes -> big-endian uint32 words, grouped by block: (..., nblocks, 16)
    by = full.astype(U32).reshape(batch + (nblocks, 16, 4))
    words = (
        (by[..., 0] << 24) | (by[..., 1] << 16) | (by[..., 2] << 8) | by[..., 3]
    )

    state0 = jnp.broadcast_to(jnp.asarray(_H0), batch + (8,))
    if nblocks == 1:
        return _compress(state0, words[..., 0, :])

    # scan over the block axis (sequential by construction)
    words_first = jnp.moveaxis(words, -2, 0)  # (nblocks, ..., 16)

    def step(st, w):
        return _compress(st, w), None

    final, _ = jax.lax.scan(step, state0, words_first)
    return final


def digest_to_scalar(spec, digest):
    """Digest words (..., 8) -> field element mod spec (BN_bin2bn + BN_mod).

    Matches the reference's challenge derivation: interpret the 32 digest
    bytes as a big-endian integer, reduce mod the group order
    (`/root/reference/SEAL/hash.cpp:50-51`).
    """
    from . import field as F

    # big-endian words -> little-endian 16-bit limbs
    le_words = digest[..., ::-1]  # least significant word first
    lo = le_words & jnp.uint32(0xFFFF)
    hi = le_words >> np.uint32(16)
    limbs = jnp.stack([lo, hi], axis=-1).reshape(digest.shape[:-1] + (16,))
    v = F._pad_to(limbs, 17)
    m17 = jnp.broadcast_to(jnp.asarray(spec.m17_limbs), v.shape)
    v = F._cond_sub(v, m17)
    return v[..., :16]
